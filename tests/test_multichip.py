"""Multi-device sharding tests over the 8-virtual-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ccdm_tpu.parallel import batch_sharded, create_mesh, replicated, shard_batch


def test_mesh_creation(devices8):
    mesh = create_mesh(devices8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)


def test_batch_sharding_distributes(devices8):
    mesh = create_mesh(devices8)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = jax.device_put(x, batch_sharded(mesh))
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (2, 4)


def test_replicated_params(devices8):
    mesh = create_mesh(devices8)
    p = jax.device_put(jnp.ones((3, 3)), replicated(mesh))
    assert all(s.data.shape == (3, 3) for s in p.addressable_shards)


def test_jit_allreduce_over_mesh(devices8):
    """Grad mean over a sharded batch must equal the unsharded value —
    XLA inserts the collective automatically."""
    mesh = create_mesh(devices8)
    w = jax.device_put(jnp.ones((4,)), replicated(mesh))
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    xs = jax.device_put(x, batch_sharded(mesh))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_sharded = jax.jit(jax.grad(loss))(w, xs)
    g_local = jax.grad(loss)(jnp.ones((4,)), x)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_local), rtol=1e-5)


def test_batchnorm_stats_are_global_under_sharding(devices8):
    """SyncBN equivalence (SURVEY.md §2.4): StudioGAN ships a 500-line
    vendored Synchronized-BatchNorm (`sync_batchnorm/batchnorm.py:74-374`,
    master-slave reduce `comm.py:78-137`) because torch-DDP BatchNorm sees
    only the per-process shard. Under JAX SPMD the BN mean/var are written
    as plain `jnp.mean` over the batch axis, so when the batch is sharded
    over the mesh XLA lowers them to a cross-replica all-reduce — the
    statistics are GLOBAL-batch by construction. This test pins that: the
    batch_stats a sharded 8-device forward writes must equal the
    single-device (global-batch) ones, and the compiled module must
    actually contain the collective."""
    from ccdm_tpu.models.sngan import SNGANGenerator

    mesh = create_mesh(devices8)
    netG = SNGANGenerator(nc=1, img_size=64, gene_ch=4, dim_z=8, dim_embed=8)
    z = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    variables = netG.init(jax.random.PRNGKey(2), z[:2], y[:2], train=False)

    def fwd(v, z, y):
        out, mut = netG.apply(v, z, y, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    zs = jax.device_put(z, batch_sharded(mesh))
    ys = jax.device_put(y, batch_sharded(mesh))
    compiled = jax.jit(fwd).lower(variables, zs, ys).compile()
    assert "all-reduce" in compiled.as_text(), (
        "sharded BN forward has no cross-replica reduce")
    _, stats_sharded = compiled(variables, zs, ys)
    _, stats_local = fwd(variables, z, y)

    flat_s = jax.tree_util.tree_leaves_with_path(stats_sharded)
    flat_l = jax.tree_util.tree_leaves(stats_local)
    assert flat_s and len(flat_s) == len(flat_l)
    for (path, s), l in zip(flat_s, flat_l):
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(l), rtol=1e-5, atol=1e-6,
            err_msg=f"batch_stats diverge at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.slow  # compile-heavy (~60s); the driver dryrun covers this gate too
def test_trainer_step_on_mesh(tmp_path, devices8):
    """Full train step jitted over an 8-device mesh."""
    from tests.test_trainer import build_trainer
    from ccdm_tpu.embedding import make_fn_y2h

    mesh = create_mesh(devices8)
    trainer, _ = build_trainer(tmp_path, "hv", steps=2)
    trainer.mesh = mesh
    trainer.train(make_fn_y2h(128), progress=False)
    assert int(trainer.state.step) == 2


@pytest.mark.slow  # the driver-level dryrun_multichip gate covers this path
def test_train_step_actually_partitions(tmp_path, devices8):
    """The jitted train step must SHARD the batch over the data axis — i.e.
    the compiled module contains a cross-replica all-reduce for the grads —
    and the sharded loss must equal the single-device loss (the constraint
    changes placement, not math)."""
    from tests.test_trainer import build_trainer
    from ccdm_tpu.embedding import make_fn_y2h

    fn_y2h = make_fn_y2h(128)
    key = jax.random.PRNGKey(3)

    trainer8, _ = build_trainer(tmp_path / "m8", "hv", steps=1)
    trainer8.mesh = create_mesh(devices8)
    step8 = trainer8._build_train_step(fn_y2h)
    hlo = step8.lower(trainer8.state, key).compile().as_text()
    assert "all-reduce" in hlo, "no grad all-reduce: batch is not sharded over the mesh"
    _, loss8 = step8(trainer8.state, key)

    trainer1, _ = build_trainer(tmp_path / "m1", "hv", steps=1)
    trainer1.mesh = create_mesh(devices8[:1])
    step1 = trainer1._build_train_step(fn_y2h)
    _, loss1 = step1(trainer1.state, key)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=2e-3)
