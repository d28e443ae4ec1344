"""Shape/dtype tests for denoiser networks at all 7 reference dataset configs.

The per-resolution dim_mults table is the spec from the reference's smoke
block (`CCDM_unified/models/unet.py:460-503`) and the launch scripts
(SURVEY.md §6): 64^2 -> 1_2_2_4(8), 128^2 -> 1_2_4_4_8_8, 192^2 -> 1_2_2_4_4_8_8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.models import Unet, ViT

# (name, image_size, channels, model_dim, dim_mults)
# Image sizes are scaled down 4x from the reference configs (64->16 etc.) to
# keep CPU-compile times sane; the dim_mults depth/structure is what the test
# exercises and divisibility by 2^(len(mults)-1) is preserved.
# default lane compiles ONE config; the rest are nightly (each Unet init+
# forward costs 15-30s of CPU compile and the shapes logic is identical)
_slow = pytest.mark.slow
CONFIGS = [
    ("RC49_64", 16, 3, 8, (1, 2, 2, 4, 8)),
    pytest.param("UK64", 16, 3, 8, (1, 2, 4, 4, 8), marks=_slow),
    pytest.param("UK128", 32, 3, 8, (1, 2, 4, 4, 8, 8), marks=_slow),
    pytest.param("UK192", 64, 3, 8, (1, 2, 2, 4, 4, 8, 8), marks=_slow),
    pytest.param("SA64", 16, 3, 8, (1, 2, 2, 4, 8), marks=_slow),
    pytest.param("SA128", 32, 3, 8, (1, 2, 2, 4, 4, 8), marks=_slow),
    ("Cell200_64", 16, 1, 8, (1, 2, 2, 4)),
]


def _init_and_apply(model, img_size, channels, batch=2):
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, img_size, img_size, channels))
    t = jnp.zeros((batch,), dtype=jnp.int32)
    emb = jnp.zeros((batch, 128))
    keep = jnp.ones((batch,), dtype=bool)
    variables = model.init(key, x, t, emb, keep, train=False)
    out, _ = model.apply(variables, x, t, emb, keep, train=True, mutable=["batch_stats"])
    return variables, out


@pytest.mark.parametrize("name,img,nc,dim,mults", CONFIGS)
def test_unet_shapes(name, img, nc, dim, mults):
    model = Unet(dim=dim, dim_mults=mults, in_channels=nc)
    variables, out = _init_and_apply(model, img, nc)
    assert out.shape == (2, img, img, nc)
    assert out.dtype == jnp.float32


def test_unet_null_embedding_init_negative():
    model = Unet(dim=16, dim_mults=(1, 2), in_channels=3)
    variables, _ = _init_and_apply(model, 16, 3)
    null = np.asarray(variables["params"]["null_cond_emb"])
    assert np.all(null <= 0), "null_cond_emb must be initialized as -|N(0,1)|"


def test_unet_keep_mask_changes_output():
    """Dropping the condition must change the output (CFG path live)."""
    model = Unet(dim=16, dim_mults=(1, 2), in_channels=3)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.array([10, 20])
    emb = jax.random.normal(key, (2, 128))
    variables = model.init(key, x, t, emb, None, train=False)
    out_keep = model.apply(variables, x, t, emb, jnp.array([True, True]), train=False)
    out_null = model.apply(variables, x, t, emb, jnp.array([False, False]), train=False)
    assert not np.allclose(np.asarray(out_keep), np.asarray(out_null))


def test_unet_bottleneck_shape():
    mults = (1, 2, 2, 4)
    model = Unet(dim=16, dim_mults=mults, in_channels=3)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 64, 64, 3))
    t = jnp.zeros((2,), dtype=jnp.int32)
    emb = jnp.zeros((2, 128))
    variables = model.init(key, x, t, emb, None, train=False)
    bott = model.apply(variables, x, t, emb, None, train=False, return_bottleneck=True)
    # 3 downsamples for 4 resolutions -> 64/8=8 spatial, dim*4 channels
    assert bott.shape == (2, 8, 8, 16 * 4)


def test_vit_shapes():
    model = ViT(dim=16, dim_mults=(1, 2, 2, 4), in_channels=3, num_blocks=2)
    variables, out = _init_and_apply(model, 32, 3)
    assert out.shape == (2, 32, 32, 3)


def test_unet_batch_stats_update_in_train_mode():
    model = Unet(dim=16, dim_mults=(1, 2), in_channels=3)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (4, 16, 16, 3))
    t = jnp.zeros((4,), dtype=jnp.int32)
    emb = jax.random.normal(key, (4, 128)) * 3.0
    variables = model.init(key, x, t, emb, None, train=False)
    _, mutated = model.apply(variables, x, t, emb, None, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after))
    assert changed, "BatchNorm running stats must update in train mode"
