"""Two-process ``jax.distributed`` smoke test (multi-host DP over DCN).

The reference has no multi-host capability at all; this framework declares
one (``parallel.initialize_multi_host`` -> ``jax.distributed.initialize``).
No multi-host hardware exists here, so the test forms a REAL 2-process JAX
distributed system on CPU: two subprocesses join a coordinator, see the
global 2-device set, build the 1-D data mesh over it, and pmean a
process-distinct value — asserting the mean crossed process boundaries.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from unopticalflow_tpu.parallel import initialize_multi_host, data_parallel_mesh, shard_batch

pid = int(sys.argv[1])
initialize_multi_host(
    coordinator_address=sys.argv[2],
    num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()  # 1 CPU device per process

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

mesh = data_parallel_mesh()
assert mesh.devices.size == 2

@jax.jit
def mean_over_data(x):
    f = shard_map(
        lambda v: jax.lax.pmean(v, axis_name="data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    )
    return f(x)

# global batch [pid 0 contributes 1.0, pid 1 contributes 3.0] -> mean 2.0
local = np.full((1, 4), 1.0 + 2.0 * pid, np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (2, 4)
)
out = mean_over_data(garr)
val = float(jax.device_get(out).ravel()[0])
assert abs(val - 2.0) < 1e-6, val
print(f"proc {pid} OK pmean={val}")
"""


def test_two_process_distributed_pmean(tmp_path):
    port = 43219
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # each process must see exactly ONE local CPU device so the global set is 2
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), f"localhost:{port}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK pmean=2.0" in out, out[-500:]
