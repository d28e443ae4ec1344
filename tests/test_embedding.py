"""Tests for analytic + ILI label embeddings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.data import make_synthetic
from ccdm_tpu.embedding import make_fn_y2h, make_fn_y2cov
from ccdm_tpu.models.resnet_embed import ModelY2Cov, ModelY2H, ResNetEmbed


def test_sinusoidal_y2h_range():
    fn = make_fn_y2h(128, "sinusoidal")
    e = fn(jnp.linspace(0, 1, 8))
    assert e.shape == (8, 128)
    assert float(e.min()) >= 0.0 and float(e.max()) <= 1.0


def test_sinusoidal_y2cov_nonneg():
    fn = make_fn_y2cov(64, "sinusoidal")
    e = fn(jnp.linspace(0, 1, 8))
    assert e.shape == (8, 64)
    assert float(e.min()) >= 0.0


def test_gaussian_deterministic():
    """The reference draws a fresh random projection per call
    (label_embedding.py:1023 defect); ours must be deterministic."""
    fn = make_fn_y2h(128, "gaussian")
    a = fn(jnp.ones(4))
    b = fn(jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multidim_mean_combination():
    fn = make_fn_y2h(64, "sinusoidal", label_dim=3)
    e = fn(jnp.ones((4, 3)) * 0.5)
    # equal dims -> mean equals single-dim embedding
    fn1 = make_fn_y2h(64, "sinusoidal", label_dim=1)
    e1 = fn1(jnp.full((4,), 0.5))
    np.testing.assert_allclose(np.asarray(e), np.asarray(e1), atol=1e-6)


def test_highdim_subsampling():
    fn = make_fn_y2h(32, "sinusoidal", label_dim=50)
    e = fn(jnp.ones((2, 50)))
    assert e.shape == (2, 32)


@pytest.mark.parametrize("kind", ["weighted", "attention", "cross", "cross_attention"])
def test_multidim_combiners(kind):
    """Each learned combiner (ref label_embedding.py:875-1005) produces the
    right shape, is deterministic, and (except softmax-uniform 'weighted',
    which starts at mean) differs from the mean combination."""
    y = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (4, 3)), jnp.float32)
    fn = make_fn_y2h(64, "sinusoidal", label_dim=3, dim_combination=kind)
    e = fn(y)
    assert e.shape == (4, 64)
    np.testing.assert_array_equal(np.asarray(fn(y)), np.asarray(e))  # deterministic
    e_mean = make_fn_y2h(64, "sinusoidal", label_dim=3)(y)
    if kind not in ("weighted",):  # uniform-softmax init == mean
        assert float(jnp.abs(e - e_mean).max()) > 1e-4


def test_label_embed_flag_drives_behavior():
    """--label_embed must map onto pipeline behavior (VERDICT weak-6):
    random forces the gaussian y2h; ccdm1/random + use_Hy is rejected."""
    from ccdm_tpu.main import resolve_label_embed
    from ccdm_tpu.opts import parse_opts

    args = parse_opts(["--label_embed", "random"])
    resolve_label_embed(args)
    assert args.y2h_embed_type == "gaussian"

    args = parse_opts(["--label_embed", "ccdm1", "--use_Hy"])
    with pytest.raises(SystemExit):
        resolve_label_embed(args)

    args = parse_opts(["--label_embed", "ccdm2", "--use_Hy"])
    resolve_label_embed(args)  # ok


def test_embedding_distinguishes_labels():
    fn = make_fn_y2h(128)
    e = np.asarray(fn(jnp.array([0.1, 0.9])))
    assert np.linalg.norm(e[0] - e[1]) > 0.1


@pytest.mark.slow  # compile-heavy; parity pinned elsewhere
def test_resnet_embed_shapes():
    net = ResNetEmbed(dim_embed=32, label_dim=1, num_blocks=(1, 1, 1, 1))
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    v = net.init(k, x, train=False)
    (y_hat, h), _ = net.apply(v, x, train=True, mutable=["batch_stats"])
    assert y_hat.shape == (2, 1)
    assert h.shape == (2, 32)
    assert float(y_hat.min()) >= 0  # ReLU head


def test_label_mlps():
    k = jax.random.PRNGKey(0)
    m = ModelY2H(32)
    v = m.init(k, jnp.zeros((4,)))
    out = m.apply(v, jnp.linspace(0, 1, 4))
    assert out.shape == (4, 32) and float(out.min()) >= 0
    mc = ModelY2Cov(48)
    vc = mc.init(k, jnp.zeros((4,)))
    outc = mc.apply(vc, jnp.linspace(0, 1, 4))
    assert outc.shape == (4, 48) and float(outc.min()) >= 0


@pytest.mark.slow
def test_ili_multidim_combiner(tmp_path):
    """The trained-ILI fn_y2h must route multi-dim labels through the
    requested combiner (VERDICT missing-5; ref label_embedding.py:875-1005)."""
    from ccdm_tpu.data.datasets import DatasetBundle
    from ccdm_tpu.embedding.ili import LabelEmbed

    rng = np.random.default_rng(0)
    labels = rng.uniform(0.1, 0.9, (48, 2)).astype(np.float64)
    images = np.clip(labels.mean(1)[:, None, None, None] * 255
                     + rng.normal(0, 25, (48, 16, 16, 3)), 0, 255).astype(np.uint8)
    fn_id = lambda y: np.asarray(y, float)
    ds = DatasetBundle("synthetic", images, labels, labels, fn_id, fn_id)

    le_cross = LabelEmbed(ds, str(tmp_path / "c"), dim_embed=16, epochs_cnn=1,
                          epochs_mlp=1, batch_size=32, dim_combination="cross")
    le_mean = LabelEmbed(ds, str(tmp_path / "m"), dim_embed=16, epochs_cnn=1,
                         epochs_mlp=1, batch_size=32)
    y = jnp.asarray(labels[:4], jnp.float32)
    e_cross, e_mean = le_cross.fn_y2h(y), le_mean.fn_y2h(y)
    assert e_cross.shape == (4, 16)
    assert float(jnp.abs(e_cross - e_mean).max()) > 1e-5


@pytest.mark.slow
def test_ili_pipeline_trains_and_reloads(tmp_path):
    from ccdm_tpu.embedding.ili import LabelEmbed

    ds = make_synthetic(n=64, image_size=16, channels=3, n_labels=8)
    le = LabelEmbed(ds, str(tmp_path), dim_embed=16, epochs_cnn=2, epochs_mlp=2,
                    batch_size=32)
    e = le.fn_y2h(jnp.linspace(0.1, 0.9, 4))
    assert e.shape == (4, 16)
    le2 = LabelEmbed(ds, str(tmp_path), dim_embed=16, epochs_cnn=2, epochs_mlp=2,
                     batch_size=32)
    np.testing.assert_allclose(
        np.asarray(le2.fn_y2h(jnp.linspace(0.1, 0.9, 4))), np.asarray(e)
    )
