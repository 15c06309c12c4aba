"""Driver entry-point tests: compile check + 8-device mesh dry run."""

import jax
import jax.numpy as jnp


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    pack = jax.jit(fn)(*args)
    assert sorted(pack) == [
        "loss_flow_consis", "loss_flow_smooth", "loss_pixel", "loss_ssim"
    ]
    assert all(jnp.isfinite(v).all() for v in pack.values())


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
