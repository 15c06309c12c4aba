"""Loss-landscape probe: evaluate the unsupervised loss stack at flow = alpha *
flow_gt (alpha sweep) plus a constant-flow sweep, bypassing the network.

If the objective is minimized near alpha=1 with a clean descent path from 0,
the loss rewards the true flow and the failure is optimization/propagation;
if it is flat or prefers alpha=0, the objective itself cannot learn on this
texture distribution.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from benchmarks.synthetic_epe import make_batch
from unopticalflow_tpu.models import losses
from unopticalflow_tpu.ops.pyramid import avg_pool_pyramid
from unopticalflow_tpu.ops.warp import bilinear_warp

H, W = 128, 256
B = 8
rng = np.random.RandomState(5)
stacked, gt, nonocc = make_batch(rng, B, H, W, max_bg=8, max_fg=16, tex_power=1.0)
stacked = jnp.asarray(stacked)
gt = jnp.asarray(gt)

imgl = stacked[:, :H]
img = stacked[:, H : 2 * H]
imgr = stacked[:, 2 * H :]

NS = 3


def loss_at(flow_fwd, w_pixel=0.15, w_ssim=0.85, w_smooth=10.0):
    """3-frame pack with flows [bwd; fwd] = [-f; f] at every scale."""
    pyr_c = avg_pool_pyramid(img, NS)
    pyr_lr = avg_pool_pyramid(jnp.concatenate([imgl, imgr], 0), NS)
    flows = []
    for s in range(NS):
        f_s = flow_fwd[:, :: 2**s, :: 2**s] / (2**s)
        flows.append(jnp.concatenate([-f_s, f_s], 0))
    warped = [
        bilinear_warp(i, f, use_mask=True) for i, f in zip(pyr_lr, flows)
    ]
    diffs, weights = losses.diff_and_occlusion_weights_packed(
        warped, pyr_c, NS, use_weights=True
    )
    pyr_cc = [jnp.concatenate([p, p], 0) for p in pyr_c]
    lp = losses.masked_diff_loss(diffs, weights, NS)
    ls = losses.masked_ssim_loss(pyr_cc, warped, weights, NS)
    lsm = losses.flow_smooth_loss(flows, pyr_c, NS)
    out = {
        "pixel": float(jnp.mean(lp[:B] + lp[B:])),
        "ssim": float(jnp.mean(ls[:B] + ls[B:])),
        "smooth": float(jnp.mean(lsm[:B] + lsm[B:])),
    }
    out["total"] = (
        w_pixel * out["pixel"] + w_ssim * out["ssim"] + w_smooth * out["smooth"]
    )
    return out


print("alpha sweep (flow = alpha * gt):")
for a in (0.0, 0.25, 0.5, 0.75, 0.9, 1.0, 1.1, 1.25):
    r = loss_at(a * gt)
    print(
        f"  a={a:4.2f}  total {r['total']:.4f}  pixel {r['pixel']:.4f} "
        f"ssim {r['ssim']:.4f}  smooth {r['smooth']:.5f}"
    )

print("constant-flow sweep (flow = (c, 0)):")
for c in (-2.0, -1.0, 0.0, 1.0, 2.0):
    f = jnp.ones_like(gt) * jnp.asarray([c, 0.0])
    r = loss_at(f)
    print(f"  c={c:4.1f}  total {r['total']:.4f}  pixel {r['pixel']:.4f} ssim {r['ssim']:.4f}")
