"""Two-process multi-host smoke over the ('dcn', 'data') 2-level mesh
(SURVEY.md §3.3 comm-backend row; VERDICT #8).

Spawns two CPU-backend processes that rendezvous via
``jax.distributed.initialize`` (through the repo's ``initialize_distributed``
env hook), build the DCN-aware mesh with one "host" per dcn row, and run a
globally-sharded psum — proving the multi-host path is a config change,
not a rewrite.

Skipped by default (process rendezvous is slow and needs a free port);
run explicitly with:

    MMB_MULTIHOST=1 python -m pytest tests/test_multihost.py -v
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
sys.path.insert(0, __REPO__)
import numpy as np
import jax
from mmbidaf_tpu.parallel import initialize_distributed, make_mesh, batch_sharding
from mmbidaf_tpu.config import MeshConfig

assert initialize_distributed(), "coordinator env vars not picked up"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4

# 2-level mesh: dcn axis = one row per host, data axis within the host.
mesh = make_mesh(MeshConfig(num_dcn=2, num_data=4))
assert mesh.axis_names == ("dcn", "data")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# Globally-sharded batch: each process provides its local shard.
sh = batch_sharding(mesh)
global_shape = (8, 16)
local = np.arange(8 * 16, dtype=np.float32).reshape(global_shape)
arr = jax.make_array_from_callback(global_shape, sh, lambda idx: local[idx])

@jax.jit
def total(x):
    return x.sum()

got = float(jax.device_get(total(arr)))
want = float(local.sum())
assert got == want, (got, want)
print(f"proc {jax.process_index()}: multihost psum OK ({got})", flush=True)
"""


@pytest.mark.skipif(
    not os.environ.get("MMB_MULTIHOST"),
    reason="two-process rendezvous smoke; run with MMB_MULTIHOST=1",
)
def test_two_process_dcn_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("__REPO__", repr(REPO)))

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "multihost psum OK" in out
