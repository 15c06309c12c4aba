"""Probe alternative formulations of the warp gather on the real chip.

The finest-scale loss warp is ONE XLA gather of 3.4M 12-channel rows that
costs ~29 ms (8.6 ns/row; the same gather in natural {1,0} layout runs at
6.3 ns/row).  This probe times standalone variants to pick a formulation:

  taa            current: take_along_axis (B, HW, C) with (B, HW, 1) idx
  taa_f32        same in float32 (different layout/tiling decisions)
  flat           single flat take over (B*HW, C) with batch-offset indices
  taa_pad16      channels zero-padded 12 -> 16 (full sublane tile)
  taa_pad128     channels zero-padded 12 -> 128 (full lane tile)
  onehot_mm      one-hot matmul over H* via MXU (per 128-px tile) -- sanity
  pallas_loop    Pallas kernel: image resident in VMEM, idx streamed through
                 SMEM, scalar loop of dynamic slices

Run: PYTHONPATH=. python benchmarks/gather_probe.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def _sync_sum(x):
    return jnp.sum(x.astype(jnp.float32))


def timeit(fn, *args, iters=30, warmup=8):
    # NOTE: on the tunneled TPU, block_until_ready returns early; fetching a
    # scalar is the only reliable sync.  The sum runs as a separate dispatch
    # so the probe op itself still materializes its full output; its cost
    # (one bandwidth pass) is measured once and subtracted.
    for _ in range(warmup):
        out = fn(*args)
        _ = float(_sync_sum(out))
    sync_costs = []
    for _ in range(6):
        out = fn(*args)
        _ = float(_sync_sum(out))  # drain queue
        t0 = time.perf_counter()
        _ = float(_sync_sum(out))
        sync_costs.append(time.perf_counter() - t0)
    sync_ms = float(np.median(sync_costs) * 1e3)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(_sync_sum(out))
        times.append(time.perf_counter() - t0)
    return max(float(np.median(times) * 1e3) - sync_ms, 0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hw", type=int, nargs=2, default=(256, 832))
    p.add_argument("--ch", type=int, default=12)
    p.add_argument("--widths", action="store_true",
                   help="row-width sweep of the flat u32 take only")
    p.add_argument("--layout", action="store_true",
                   help="channel-major operand/output layout probe")
    p.add_argument("--diffwarp", action="store_true",
                   help="decoder-warp geometry: fwd gather + scatter VJP in "
                        "row-major vs channel-major layout (wide bf16 rows)")
    args = p.parse_args()

    b = args.batch
    h, w = args.hw
    c = args.ch
    hw = h * w
    src_n = (h + 1) * (w + 1)
    rng = np.random.RandomState(0)

    img = jnp.asarray(rng.rand(b, src_n, c).astype(np.float32), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, src_n, (b, hw, 1)).astype(np.int32))

    n_rows = b * hw

    @jax.jit
    def taa(img, idx):
        return jnp.take_along_axis(img, idx, axis=1)

    @jax.jit
    def taa_f32(img, idx):
        return jnp.take_along_axis(img.astype(jnp.float32), idx, axis=1)

    @jax.jit
    def flat(img, idx):
        fi = img.reshape(b * src_n, c)
        off = (jnp.arange(b, dtype=jnp.int32) * src_n)[:, None, None]
        return jnp.take(fi, (idx + off).reshape(-1), axis=0)

    @jax.jit
    def taa_pad16(img, idx):
        pad = jnp.pad(img, ((0, 0), (0, 0), (0, 16 - c)))
        return jnp.take_along_axis(pad, idx, axis=1)

    @jax.jit
    def taa_pad128(img, idx):
        pad = jnp.pad(img, ((0, 0), (0, 0), (0, 128 - c)))
        return jnp.take_along_axis(pad, idx, axis=1)

    @jax.jit
    def flat_u32(img, idx):
        # the combination the no-grad loss path could use: u32-paired rows
        # fetched by ONE flat jnp.take with batch-offset indices
        u = jax.lax.bitcast_convert_type(img.reshape(b, src_n, 6, 2), jnp.uint32)
        fi = u.reshape(b * src_n, 6)
        off = (jnp.arange(b, dtype=jnp.int32) * src_n)[:, None, None]
        out = jnp.take(fi, (idx + off).reshape(-1), axis=0)
        return jax.lax.bitcast_convert_type(
            out.reshape(b, hw, 6), jnp.bfloat16
        ).reshape(b, hw, c)

    @jax.jit
    def flat_u32_pad8(img, idx):
        u = jax.lax.bitcast_convert_type(img.reshape(b, src_n, 6, 2), jnp.uint32)
        u = jnp.pad(u, ((0, 0), (0, 0), (0, 2)))
        fi = u.reshape(b * src_n, 8)
        off = (jnp.arange(b, dtype=jnp.int32) * src_n)[:, None, None]
        out = jnp.take(fi, (idx + off).reshape(-1), axis=0)[:, :6]
        return jax.lax.bitcast_convert_type(
            out.reshape(b, hw, 6), jnp.bfloat16
        ).reshape(b, hw, c)

    @jax.jit
    def flat_u32_2x(img, idx):
        u = jax.lax.bitcast_convert_type(img.reshape(b, src_n, 6, 2), jnp.uint32)
        fi = u.reshape(b * src_n, 6)
        off = (jnp.arange(b, dtype=jnp.int32) * src_n)[:, None, None]
        fidx = (idx + off).reshape(-1)
        half = fidx.shape[0] // 2
        out = jnp.concatenate(
            [jnp.take(fi, fidx[:half], axis=0), jnp.take(fi, fidx[half:], axis=0)], 0
        )
        return jax.lax.bitcast_convert_type(
            out.reshape(b, hw, 6), jnp.bfloat16
        ).reshape(b, hw, c)

    def make_flat_split(k):
        @jax.jit
        def flat_u32_kx(img, idx):
            u = jax.lax.bitcast_convert_type(img.reshape(b, src_n, 6, 2), jnp.uint32)
            fi = u.reshape(b * src_n, 6)
            off = (jnp.arange(b, dtype=jnp.int32) * src_n)[:, None, None]
            fidx = (idx + off).reshape(-1)
            n = fidx.shape[0] // k
            out = jnp.concatenate(
                [jnp.take(fi, fidx[i * n : (i + 1) * n], axis=0) for i in range(k)], 0
            )
            return jax.lax.bitcast_convert_type(
                out.reshape(b, hw, 6), jnp.bfloat16
            ).reshape(b, hw, c)
        return flat_u32_kx

    @jax.jit
    def flat_u32_sorted(img, idx):
        # does index order matter at all for the flat take?
        u = jax.lax.bitcast_convert_type(img.reshape(b, src_n, 6, 2), jnp.uint32)
        fi = u.reshape(b * src_n, 6)
        off = (jnp.arange(b, dtype=jnp.int32) * src_n)[:, None, None]
        fidx = jnp.sort((idx + off).reshape(-1))
        out = jnp.take(fi, fidx, axis=0)
        return jax.lax.bitcast_convert_type(
            out.reshape(b, hw, 6), jnp.bfloat16
        ).reshape(b, hw, c)

    @jax.jit
    def taa_u32x6(img, idx):
        # bitcast channel pairs to u32: halves the lane width per row
        u = jax.lax.bitcast_convert_type(img.reshape(b, src_n, 6, 2), jnp.uint32)
        out = jnp.take_along_axis(u, idx, axis=1)
        return jax.lax.bitcast_convert_type(out, jnp.bfloat16).reshape(b, hw, c)

    def make_chunked(k):
        @jax.jit
        def taa_chunked(img, idx):
            parts = [
                jnp.take_along_axis(img, idx[:, i * (hw // k) : (i + 1) * (hw // k)], axis=1)
                for i in range(k)
            ]
            return jnp.concatenate(parts, axis=1)

        return taa_chunked

    if args.diffwarp:
        # Decoder feature-warp geometry, level 2 dominates: 2B=16 images at
        # (64, 208) with C=32 features -> packed 4C=128 bf16 per row.  The
        # differentiable path needs BOTH directions fast: flat-take forward
        # (current) + batched scatter backward vs channel-major take +
        # channel-major scatter.
        bb, hh, ww, cc = 16, 64, 208, 32
        sn = (hh + 1) * (ww + 1)
        nn = bb * hh * ww
        fidx = jnp.asarray(
            (rng.randint(0, sn, (bb, hh * ww))
             + (np.arange(bb) * sn)[:, None]).reshape(-1).astype(np.int32))
        bidx = jnp.asarray(rng.randint(0, sn, (bb, hh * ww)).astype(np.int32))
        op_rm = jnp.asarray(rng.randn(bb * sn, 4 * cc).astype(np.float32),
                            jnp.bfloat16)
        op_cm = jnp.asarray(
            np.ascontiguousarray(rng.randn(4 * cc, bb * sn).astype(np.float32)),
            jnp.bfloat16)
        g_rm = jnp.asarray(rng.randn(nn, 4 * cc).astype(np.float32), jnp.bfloat16)
        g_cm = jnp.asarray(rng.randn(4 * cc, nn).astype(np.float32), jnp.bfloat16)
        g_b = g_rm.reshape(bb, hh * ww, 4 * cc)

        @jax.jit
        def rm_fwd(op, idx):
            return jnp.take(op, idx, axis=0)

        @jax.jit
        def cm_fwd(op, idx):
            return jnp.take(op, idx, axis=1)

        @jax.jit
        def rm_bwd_batched(g, idx):  # current hand VJP (take_along_axis adjoint)
            return (
                jnp.zeros((bb, sn, 4 * cc), g.dtype)
                .at[jnp.arange(bb)[:, None], idx]
                .add(g)
            )

        @jax.jit
        def cm_bwd(g, idx):  # channel-major scatter over the flat source
            return jnp.zeros((4 * cc, bb * sn), g.dtype).at[:, idx].add(g)

        @jax.jit
        def rm_bwd_flat(g, idx):  # known-4x-slow flat scatter, for reference
            return jnp.zeros((bb * sn, 4 * cc), g.dtype).at[idx].add(g)

        results = {
            "rm_fwd": timeit(rm_fwd, op_rm, fidx),
            "cm_fwd": timeit(cm_fwd, op_cm, fidx),
            "rm_bwd_batched": timeit(rm_bwd_batched, g_b, bidx),
            "cm_bwd": timeit(cm_bwd, g_cm, fidx),
            "rm_bwd_flat": timeit(rm_bwd_flat, g_rm, fidx),
        }
        print(f"rows={nn} ({bb}x{hh}x{ww}, {4*cc}ch bf16) decoder-warp probe")
        for k, v in results.items():
            print(f"  {k:16s} {v:8.2f} ms   {v * 1e6 / nn:6.2f} ns/row")
        return

    if args.layout:
        # Hypothesis: XLA's lowering of the row-major (R, 6) u32 take spends
        # ~6 ms/step in channel-major relayout while-loops (trace category
        # `while` + DUS).  If the operand is ALREADY channel-major (6, R) and
        # the consumer accepts channel-major output (6, N) — the Pallas
        # photometric kernel can — both relayouts vanish at the graph level.
        off = (jnp.arange(b, dtype=jnp.int32) * src_n)[:, None, None]
        fidx = jax.device_put(
            jnp.asarray((np.asarray(idx) + np.asarray(off)).reshape(-1))
        )
        op_rm = jnp.asarray(rng.randint(0, 255, (b * src_n, 6)).astype(np.uint32))
        op_cm = jnp.asarray(np.ascontiguousarray(np.asarray(op_rm).T))

        @jax.jit
        def rm_take(op, fidx):  # current formulation
            return jnp.take(op, fidx, axis=0)

        @jax.jit
        def cm_take(op, fidx):  # channel-major in AND out
            return jnp.take(op, fidx, axis=1)

        @jax.jit
        def cm_take_out_t(op, fidx):  # channel-major in, row-major out
            return jnp.take(op, fidx, axis=1).T

        @jax.jit
        def rm_take_in_t(op, fidx):  # row-major in (transposed in-graph), cm out
            return jnp.take(op.T, fidx, axis=1)

        # per-channel 1-D takes from a channel-major operand (6 gathers of
        # width-1 rows; w1 measured 7.5 ns/row so likely worse, but the
        # operand rows here are contiguous lanes — different tiling)
        @jax.jit
        def cm_per_ch(op, fidx):
            return jnp.stack([jnp.take(op[k], fidx) for k in range(6)])

        results = {
            "rm_take": timeit(rm_take, op_rm, fidx),
            "cm_take": timeit(cm_take, op_cm, fidx),
            "cm_take_out_t": timeit(cm_take_out_t, op_cm, fidx),
            "rm_take_in_t": timeit(rm_take_in_t, op_rm, fidx),
            "cm_per_ch": timeit(cm_per_ch, op_cm, fidx),
        }
        print(f"rows={n_rows} ({b}x{h}x{w}) layout probe (w6 u32)")
        for k, v in results.items():
            print(f"  {k:14s} {v:8.2f} ms   {v * 1e6 / n_rows:6.2f} ns/row")
        return

    if args.widths:
        # Row-width sweep for the flat take: is the gather purely
        # index-issue-bound, or partially bytes-bound?  If ns/row falls with
        # narrower rows, packing the loss pyramids as u8 (12 u8 = 3 u32 per
        # row instead of 6 u32) halves the dominant loss-warp cost.
        off = (jnp.arange(b, dtype=jnp.int32) * src_n)[:, None, None]
        fidx = jax.device_put(jnp.asarray((np.asarray(idx) + np.asarray(off)).reshape(-1)))
        results = {}
        for k in (1, 2, 3, 4, 6, 8, 16):
            op = jnp.asarray(
                rng.randint(0, 255, (b * src_n, k)).astype(np.uint32)
            )

            @jax.jit
            def take_k(op, fidx):
                return jnp.take(op, fidx, axis=0)

            results[f"flat_u32_w{k}"] = timeit(take_k, op, fidx)
        # u8-typed operand, same bytes as w3 (does XLA like 8-bit rows?)
        op8 = jnp.asarray(rng.randint(0, 255, (b * src_n, 12)).astype(np.uint8))

        @jax.jit
        def take_u8(op, fidx):
            return jnp.take(op, fidx, axis=0)

        results["flat_u8_w12"] = timeit(take_u8, op8, fidx)
        print(f"rows={n_rows} ({b}x{h}x{w}) width sweep")
        for k, v in results.items():
            print(f"  {k:14s} {v:8.2f} ms   {v * 1e6 / n_rows:6.2f} ns/row")
        return

    results = {}
    results["taa"] = timeit(taa, img, idx)
    results["taa_f32"] = timeit(taa_f32, img, idx)
    results["flat"] = timeit(flat, img, idx)
    results["taa_pad16"] = timeit(taa_pad16, img, idx)
    results["taa_pad128"] = timeit(taa_pad128, img, idx)
    results["taa_u32x6"] = timeit(taa_u32x6, img, idx)
    results["flat_u32"] = timeit(flat_u32, img, idx)
    results["flat_u32_pad8"] = timeit(flat_u32_pad8, img, idx)
    results["flat_u32_2x"] = timeit(flat_u32_2x, img, idx)
    results["flat_u32_sorted"] = timeit(flat_u32_sorted, img, idx)
    for k in (4, 8, 16):
        results[f"flat_u32_{k}x"] = timeit(make_flat_split(k), img, idx)
    for k in (4, 16):
        results[f"taa_chunk{k}"] = timeit(make_chunked(k), img, idx)

    # Pallas: per-batch grid; image block in VMEM; idx chunks DMA'd to SMEM;
    # fori_loop of per-row dynamic slices.
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        CHUNK = 2048

        def kernel3(idx_ref, img_ref, out_ref):
            def row_body(r, _):
                out_ref[0, pl.ds(r, 1), :] = img_ref[0, pl.ds(idx_ref[0, r, 0], 1), :]
                return 0

            jax.lax.fori_loop(0, CHUNK, row_body, 0)

        @jax.jit
        def pallas_loop3(img, idx):
            # grid (b, chunks): idx streams through SMEM in 2048-row blocks
            # (8 KB); the per-image packed source stays resident in VMEM
            # across the chunk dimension (index_map depends only on b).
            return pl.pallas_call(
                kernel3,
                out_shape=jax.ShapeDtypeStruct((b, hw, c), img.dtype),
                grid=(b, hw // CHUNK),
                in_specs=[
                    pl.BlockSpec((1, CHUNK, 1), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, src_n, c), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, CHUNK, c), lambda i, j: (i, j, 0),
                                       memory_space=pltpu.VMEM),
            )(idx, img)

        try:
            want = np.asarray(taa(img, idx)[0, :64], np.float32)
            got = np.asarray(pallas_loop3(img, idx)[0, :64], np.float32)
            np.testing.assert_allclose(got, want)
            results["pallas_loop"] = timeit(pallas_loop3, img, idx)
        except Exception as e:  # noqa: BLE001
            results["pallas_loop"] = f"FAIL {type(e).__name__}: {str(e)[:160]}"
    except Exception as e:  # noqa: BLE001
        results["pallas"] = f"FAIL {str(e)[:160]}"

    print(f"rows={n_rows} ({b}x{h}x{w}, {c}ch)")
    for k, v in results.items():
        if isinstance(v, float):
            print(f"  {k:12s} {v:8.2f} ms   {v * 1e6 / n_rows:6.2f} ns/row")
        else:
            print(f"  {k:12s} {v}")


if __name__ == "__main__":
    main()
