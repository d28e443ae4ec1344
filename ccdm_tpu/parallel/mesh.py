"""Device mesh + sharding helpers.

TPU-native replacement for the reference's entire distributed stack
(SURVEY.md §2.4): nn.DataParallel scatter (`CCDM_unified/main.py:383`),
HF Accelerate DDP/NCCL (`trainer.py:110-156`), MPI bootstrap (ADM-G
`dist_util.py`), and mp.spawn (StudioGAN). In JAX all of it is a 1-axis
`data` mesh: batches are sharded over the axis, params are replicated, and
XLA inserts the grad all-reduce over ICI automatically inside the jitted
train step — no NCCL/MPI analog code at all.

Multi-host (DCN) runs only need `jax.distributed.initialize()` before
`create_mesh()`; everything else is unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host (DCN) bootstrap: `jax.distributed.initialize` from args or
    environment. Replaces the reference's MPI bootstrap (ADM-G
    `dist_util.py:20-63`) and StudioGAN's `mp.spawn` + NCCL init
    (`StudioGAN/main.py:198-201`) — after this, `create_mesh()` spans every
    chip of every host and the SAME jitted step runs unchanged; XLA routes
    intra-slice collectives over ICI and cross-slice over DCN.

    Environment fallbacks: CCDM_COORD_ADDR, CCDM_NUM_PROCS, CCDM_PROC_ID
    (explicit), else JAX's own cluster auto-detection (TPU pods, GKE).
    Returns True if a multi-process runtime was initialized, False when
    single-process (the common case; everything still works on one host).
    """
    import os

    coordinator_address = coordinator_address or os.environ.get("CCDM_COORD_ADDR")
    if num_processes is None and os.environ.get("CCDM_NUM_PROCS"):
        num_processes = int(os.environ["CCDM_NUM_PROCS"])
    if process_id is None and os.environ.get("CCDM_PROC_ID"):
        process_id = int(os.environ["CCDM_PROC_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process; nothing to do
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(x, mesh: Mesh, axis_name: str = "data"):
    """Constrain the leading dim of every leaf to be sharded over the axis."""
    spec = P(axis_name)
    return jax.tree_util.tree_map(
        lambda leaf: jax.lax.with_sharding_constraint(leaf, NamedSharding(mesh, spec)),
        x,
    )


def constrain_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Inside-jit sharding constraint for batch tensors: shard the leading dim
    over the mesh axis so XLA partitions the downstream forward/backward
    across chips and inserts the grad all-reduce over ICI.

    This is what turns the replicated-everything step into real data
    parallelism: the batch is *generated* inside jit from a replicated key
    (vicinity gather), so without an explicit constraint every chip computes
    the identical full batch. Leaves whose leading dim is not divisible by
    the mesh size (or None) pass through unchanged; single-device meshes are
    a no-op for XLA.
    """
    n = mesh.size
    sharding = NamedSharding(mesh, P(axis_name))

    def one(a):
        if a is None or not hasattr(a, "shape") or a.ndim == 0:
            return a
        if n > 1 and a.shape[0] % n == 0:
            return jax.lax.with_sharding_constraint(a, sharding)
        return a

    out = tuple(one(a) for a in arrays)
    return out if len(out) != 1 else out[0]
