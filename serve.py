"""Flow inference server — batched production serving on one process.

An extension beyond the reference (which ships only offline eval CLIs,
/root/reference/test.py): a zero-dependency HTTP endpoint that serves
optical-flow inference with dynamic micro-batching, so concurrent clients
share MXU-efficient fixed-shape batches instead of dispatching singles.

Design (TPU-first):
* ONE compiled program: requests are padded into a fixed (MAX_BATCH, H, W)
  batch so XLA compiles exactly once; a half-full batch still runs the same
  program (padding rows are free relative to recompiles).
* Multi-chip: with >1 local device the serving batch is sharded over a 1-D
  ``data`` mesh via ``shard_map`` (per-device program identical to the
  single-chip one, so the Pallas kernels run per-shard); the compiled batch
  pads up to a device multiple.
* Dynamic batching: a collector thread drains the request queue up to
  ``--max_batch`` or ``--max_wait_ms``, whichever first — the standard
  latency/throughput knob.
* The HTTP layer is stdlib ``http.server`` with a thread pool; the device
  loop is a single consumer thread (one chip, one stream — serialization is
  the correct policy, see ARCHITECTURE.md).

API:
    POST /flow    body: raw PNG/JPEG bytes of the two frames stacked
                  vertically (2H x W x 3, like the eval datasets).
                  Response: binary .flo (Middlebury) flow field at network
                  resolution.
    GET  /healthz liveness + model/config info (JSON).
    GET  /stats   served counts, batch-occupancy histogram (JSON).

Usage:
    python serve.py -c config/kitti.yaml --pretrained_model last.ckpt \
        --port 8000 [--max_batch 8] [--max_wait_ms 5]
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unopticalflow_tpu.utils.config import Config, load_yaml_config

# reject request bodies above this before buffering them (a PNG pair at
# any supported resolution is far below this; unbounded reads let one
# client OOM the server)
MAX_BODY_BYTES = 64 * 1024 * 1024


class _Request:
    __slots__ = ("pair", "event", "flow", "error", "deadline")

    def __init__(self, pair, deadline):
        self.pair = pair  # (2H, W, 3) float32
        self.event = threading.Event()
        self.flow = None
        self.error = None
        self.deadline = deadline  # perf_counter time after which nobody waits


class FlowServer:
    """Dynamic-batching inference engine over one compiled XLA program."""

    def __init__(self, cfg, params, model_cfg, max_batch=8, max_wait_ms=5.0,
                 spatial=1):
        import jax

        from unopticalflow_tpu.models import inference_flow

        self.h, self.w = cfg.img_hw
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self.stats = {"served": 0, "batches": 0, "shed": 0, "errors": 0,
                      "occupancy": [0] * (max_batch + 1)}
        self._jax = jax

        n_dev = len(jax.devices())
        if spatial > 1:
            # Height-sharded serving (parallel/spatial.py): for frames too
            # large for one chip's HBM, shard H over the mesh — GSPMD
            # inserts the conv halo exchanges.  Batch stays unsharded
            # (spatial replaces data parallelism here; it targets the
            # single-giant-frame regime, not throughput).
            from jax.sharding import NamedSharding, PartitionSpec as P

            from unopticalflow_tpu.parallel import make_spatial_infer, spatial_mesh

            self._pad_batch = max_batch
            mesh = spatial_mesh(n_spatial=spatial)
            sp_fn = make_spatial_infer(model_cfg, mesh)
            params = jax.device_put(params, NamedSharding(mesh, P()))
            fn = lambda i1, i2: sp_fn(params, i1, i2)
        elif n_dev > 1:
            # Multi-device: shard the fixed serving batch over a 1-D data
            # mesh (shard_map, so the per-device program is identical to
            # single-chip — the Pallas kernels run per-shard, no GSPMD
            # custom-call rules needed).  The compiled batch is padded up to
            # a device multiple.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from unopticalflow_tpu.parallel import data_parallel_mesh

            self._pad_batch = -(-max_batch // n_dev) * n_dev
            mesh = data_parallel_mesh()
            body = jax.shard_map(
                lambda p, i1, i2: inference_flow(p, model_cfg, i1, i2),
                mesh=mesh,
                in_specs=(P(), P("data"), P("data")),
                out_specs=P("data"),
            )
            params = jax.device_put(params, NamedSharding(mesh, P()))
            fn = jax.jit(lambda i1, i2: body(params, i1, i2))
        else:
            self._pad_batch = max_batch
            fn = jax.jit(
                lambda i1, i2: inference_flow(params, model_cfg, i1, i2)
            )
        self._infer = fn
        # compile once at the fixed serving shape (padding strategy)
        z = jax.numpy.zeros(
            (self._pad_batch, self.h, self.w, 3), jax.numpy.float32
        )
        fn(z, z).block_until_ready()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._stop = threading.Event()
        self._thread.start()

    def _shed_expired(self, req) -> bool:
        """Load shedding: skip requests whose waiter has already timed out.

        Under sustained overload the queue only grows; computing flow for a
        request nobody is waiting for wastes device time that could serve
        live traffic.  The waiter raised TimeoutError at its own deadline,
        so completing the entry here would be unobservable anyway.
        """
        if req.deadline > time.perf_counter():
            return False
        req.error = TimeoutError("shed: queue wait exceeded request timeout")
        req.event.set()
        self.stats["shed"] += 1
        return True

    def _loop(self):
        jnp = self._jax.numpy
        while not self._stop.is_set():
            try:
                first = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            if self._shed_expired(first):
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self.queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if not self._shed_expired(nxt):
                    batch.append(nxt)
            n = len(batch)
            try:
                img1 = np.zeros((self._pad_batch, self.h, self.w, 3), np.float32)
                img2 = np.zeros_like(img1)
                for i, r in enumerate(batch):
                    img1[i] = r.pair[: self.h]
                    img2[i] = r.pair[self.h :]
                flows = np.asarray(self._infer(jnp.asarray(img1), jnp.asarray(img2)))
                for i, r in enumerate(batch):
                    r.flow = flows[i]
            except Exception as e:  # surface device errors to every waiter
                for r in batch:
                    r.error = e
            if batch[0].error is None:
                self.stats["served"] += n
                self.stats["occupancy"][n] += 1
            else:
                # a failed batch served nobody; monitoring keyed on served
                # throughput must see the outage
                self.stats["errors"] += n
            self.stats["batches"] += 1
            for r in batch:
                r.event.set()

    def infer(self, pair: np.ndarray, timeout=30.0) -> np.ndarray:
        req = _Request(pair, time.perf_counter() + timeout)
        self.queue.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("inference timed out")
        if req.error is not None:
            raise req.error
        return req.flow

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)


def _decode_pair(body: bytes, img_hw) -> np.ndarray:
    """PNG/JPEG bytes of a vertically stacked pair -> (2H, W, 3) float32."""
    import cv2

    arr = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    if arr is None:
        raise ValueError("request body is not a decodable image")
    if arr.shape[0] % 2:
        raise ValueError("stacked pair must have even height")
    h, w = img_hw
    half = arr.shape[0] // 2
    frames = [
        cv2.resize(arr[:half], (w, h)).astype(np.float32) / 255.0,
        cv2.resize(arr[half:], (w, h)).astype(np.float32) / 255.0,
    ]
    return np.concatenate(frames, 0)


def _encode_flo(flow: np.ndarray) -> bytes:
    """(H, W, 2) float32 -> Middlebury .flo bytes (flowlib is the single
    source of the layout)."""
    from unopticalflow_tpu.evaluation.flowlib import encode_flow

    return encode_flow(flow)


def make_handler(server: FlowServer, cfg):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, json.dumps({
                    "ok": True, "img_hw": list(cfg.img_hw),
                    "max_batch": server.max_batch,
                }).encode())
            elif self.path == "/stats":
                self._send(200, json.dumps(server.stats).encode())
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            if self.path != "/flow":
                self._send(404, b'{"error": "not found"}')
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length > MAX_BODY_BYTES:
                    self._send(413, json.dumps({
                        "error": f"body {length} bytes exceeds "
                                 f"{MAX_BODY_BYTES}"
                    }).encode())
                    return
                pair = _decode_pair(self.rfile.read(length), cfg.img_hw)
            except Exception as e:  # malformed request -> client error
                self._send(400, json.dumps({"error": str(e)}).encode())
                return
            try:
                flow = server.infer(pair)
                self._send(200, _encode_flo(flow), "application/octet-stream")
            except TimeoutError as e:  # overload -> retryable server error
                self._send(503, json.dumps({"error": str(e)}).encode())
            except Exception as e:  # device/internal fault -> server error
                self._send(500, json.dumps({"error": str(e)}).encode())

    return Handler


def build_server(cfg, args):
    import jax

    from unopticalflow_tpu.models import FlowModelConfig, get_model
    from unopticalflow_tpu.utils import checkpoint as ckpt
    from unopticalflow_tpu.utils.platform import resolve_pallas

    model_cfg = FlowModelConfig(
        num_scales=cfg.num_scales,
        compute_dtype=args.precision,
        use_pallas_corr=resolve_pallas(args.pallas_corr),
    )
    params = get_model("flow")(jax.random.PRNGKey(0))
    if args.pretrained_model:
        _, params = ckpt.load_pretrained(args.pretrained_model, params)
    if getattr(args, "spatial", 1) > 1 and model_cfg.use_pallas_corr:
        # the Pallas custom call has no SPMD partitioning rule
        model_cfg = model_cfg._replace(use_pallas_corr=False)
    return FlowServer(
        cfg, params, model_cfg,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        spatial=getattr(args, "spatial", 1),
    )


def main(argv=None):
    p = argparse.ArgumentParser(description="flow inference server")
    p.add_argument("-c", "--config_file", required=True)
    p.add_argument("--pretrained_model", default=None)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--precision", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--pallas_corr", default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--spatial", type=int, default=1,
                   help="shard image height over this many devices "
                        "(frames too large for one chip; H must be "
                        "divisible by spatial*64; disables the Pallas "
                        "corr kernel)")
    args = p.parse_args(argv)
    cfg = Config(load_yaml_config(args.config_file))

    server = build_server(cfg, args)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server, cfg))
    print(f"serving flow on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
