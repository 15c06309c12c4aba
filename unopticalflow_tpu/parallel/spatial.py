"""Spatial (height-sharded) model parallelism for high-resolution inference.

The reference has no model parallelism at all — its only scaling axis is
``torch.nn.DataParallel`` over the batch (/root/reference/train.py:36-37).
On TPU the natural second axis for a fully-convolutional flow model is the
*image height*: shard H across the mesh and let XLA's SPMD partitioner insert
the halo exchanges for every 3x3 convolution automatically (each device
exchanges a 1-row halo per conv over ICI).  This is how a single frame larger
than one chip's HBM — panoramic / film-scan resolutions — runs at all, and
how fixed-size frames scale latency-wise beyond one chip.

Design notes (TPU-first):
  * Convs / pools / resizes partition along H with compiler-inserted halo
    collectives — no hand-written ring code.  This rides ICI, not DCN.
  * The decoder's warp gathers address arbitrary rows, so under an H-sharded
    layout XLA all-gathers the (coarse, small) feature maps being warped;
    flow displacements are unbounded, which rules out a bounded-halo
    formulation in general.  These live at 1/64..1/4 resolution, so the
    all-gather volume is a few percent of a pyramid level's conv traffic.
  * The Pallas cost-volume kernels carry explicit SPMD partitioning rules
    (ops/pallas_spmd.py, ``jax.experimental.custom_partitioning``): each
    H-shard runs the same kernel on its rows after a ±4-row ppermute halo
    exchange with its mesh neighbors, in the forward AND both backward
    kernels — so spatial mode keeps the single-chip fast path.
    ``make_spatial_infer`` flips ``FlowModelConfig.pallas_corr_spmd`` on
    automatically when ``use_pallas_corr`` is set.

A 2-D ``(data, spatial)`` mesh composes both axes: batch over ``data``,
rows over ``spatial`` — see ``make_spatial_infer(batch_axis="data")`` and
the driver dry run (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_mesh(n_spatial: int, n_data: int = 1) -> Mesh:
    """(data, spatial) mesh over the first n_data*n_spatial devices.

    The spatial axis is innermost so row-halo exchanges ride adjacent-chip
    ICI links.
    """
    devs = jax.devices()
    need = n_data * n_spatial
    if need > len(devs):
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_data, n_spatial)
    return Mesh(grid, axis_names=("data", "spatial"))


def make_spatial_infer(cfg, mesh: Mesh, batch_axis: str | None = None):
    """Jit ``inference_flow`` with images (and flow) sharded over H.

    Args:
        cfg: FlowModelConfig.  With ``use_pallas_corr`` the correlations are
            routed through the SPMD-partitionable kernels automatically
            (``pallas_corr_spmd``; ops/pallas_spmd.py).
        mesh: mesh containing a ``spatial`` axis (see ``spatial_mesh``).
        batch_axis: optional mesh axis name to additionally shard the batch
            over (e.g. ``"data"`` for a 2-D dp x sp layout).

    Returns:
        fn(params, img1, img2) -> flow, jitted with sharded in/out layouts.
        H must be divisible by n_spatial * 64 (6 stride-2 encoder levels)
        so every pyramid level splits evenly across the spatial axis.
    """
    if cfg.use_pallas_corr and not cfg.pallas_corr_spmd:
        cfg = cfg._replace(pallas_corr_spmd=True)
    from unopticalflow_tpu.models import inference_flow

    img_spec = NamedSharding(mesh, P(batch_axis, "spatial", None, None))
    repl = NamedSharding(mesh, P())

    n_sp = mesh.shape["spatial"]

    def infer(params, img1, img2):
        h = img1.shape[1]
        if h % (n_sp * 64) != 0:
            raise ValueError(
                f"H={h} must be divisible by n_spatial*64={n_sp * 64}"
            )
        return inference_flow(params, cfg, img1, img2)

    return jax.jit(
        infer,
        in_shardings=(repl, img_spec, img_spec),
        out_shardings=img_spec,
    )


def shard_images(mesh: Mesh, batch_axis: str | None, *imgs):
    """Place (B, H, W, C) host arrays with the spatial-inference layout."""
    sh = NamedSharding(mesh, P(batch_axis, "spatial", None, None))
    out = tuple(jax.device_put(x, sh) for x in imgs)
    return out if len(out) > 1 else out[0]
