"""Tests for the diffusion loss and samplers (tiny UNet, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.diffusion import GaussianDiffusion, DiffusionConfig
from ccdm_tpu.models import Unet

IMG = 16
NC = 3


@pytest.fixture(scope="module")
def tiny():
    model = Unet(dim=8, dim_mults=(1, 2), in_channels=NC, attn_heads=1, attn_dim_head=8)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, IMG, IMG, NC))
    t = jnp.zeros((2,), dtype=jnp.int32)
    emb = jnp.zeros((2, 128))
    variables = model.init(key, x, t, emb, None, train=False)
    return model, variables


def make_diffusion(model, **kw):
    cfg = DiffusionConfig(
        image_size=IMG, channels=NC, timesteps=50, sampling_timesteps=5, **kw
    )
    return GaussianDiffusion(model.apply, cfg)


@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
def test_loss_finite_all_objectives(tiny, objective):
    model, variables = tiny
    diff = make_diffusion(model, objective=objective, vicinity_type="hv")
    key = jax.random.PRNGKey(1)
    imgs = jax.random.uniform(key, (4, IMG, IMG, NC))
    labels = jax.random.uniform(key, (4, 1))
    emb = jax.random.normal(key, (4, 128))
    w = jnp.ones((4,))
    loss, updates = diff.loss(variables, key, imgs, labels, emb, w, kappa=0.1)
    assert np.isfinite(float(loss))
    assert "batch_stats" in updates


@pytest.mark.parametrize("vicinity_type", ["hv", "sv", "shv", "ssv", "none"])
def test_loss_vicinity_types(tiny, vicinity_type):
    model, variables = tiny
    diff = make_diffusion(model, vicinity_type=vicinity_type, num_projections=3)
    key = jax.random.PRNGKey(2)
    imgs = jax.random.uniform(key, (4, IMG, IMG, NC))
    labels = jax.random.uniform(key, (4, 3))  # multi-dim to exercise sliced
    emb = jax.random.normal(key, (4, 128))
    w = jnp.ones((4,))
    loss, _ = diff.loss(variables, key, imgs, labels, emb, w, kappa=0.2)
    assert np.isfinite(float(loss))


def test_ddim_sample_shape_range_and_determinism(tiny):
    model, variables = tiny
    diff = make_diffusion(model)
    emb = jax.random.normal(jax.random.PRNGKey(3), (2, 128))
    key = jax.random.PRNGKey(4)
    out1 = diff.ddim_sample(variables, key, emb, cond_scale=1.5)
    out2 = diff.ddim_sample(variables, key, emb, cond_scale=1.5)
    assert out1.shape == (2, IMG, IMG, NC)
    # deterministic under the same PRNG key
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # different key -> different samples
    out3 = diff.ddim_sample(variables, jax.random.PRNGKey(5), emb, cond_scale=1.5)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_ddim_cond_scale_one_single_pass(tiny):
    model, variables = tiny
    diff = make_diffusion(model)
    emb = jax.random.normal(jax.random.PRNGKey(6), (2, 128))
    out = diff.ddim_sample(variables, jax.random.PRNGKey(7), emb, cond_scale=1.0)
    assert out.shape == (2, IMG, IMG, NC)


def test_ddpm_sample_shape(tiny):
    model, variables = tiny
    diff = make_diffusion(model)
    emb = jax.random.normal(jax.random.PRNGKey(8), (2, 128))
    out = diff.p_sample_loop(variables, jax.random.PRNGKey(9), emb,
                             cond_scale=1.5, sampling_timesteps=5)
    assert out.shape == (2, IMG, IMG, NC)
    assert np.all(np.isfinite(np.asarray(out)))


def test_hy_covariance_path(tiny):
    model, variables = tiny

    def fn_y2cov(labels):
        b = labels.shape[0]
        # positive output like the reference's ReLU-terminated y2cov MLP
        return jnp.abs(jnp.sin(labels.sum(axis=-1)))[:, None] * jnp.ones((b, NC * IMG * IMG))

    cfg = DiffusionConfig(image_size=IMG, channels=NC, timesteps=50,
                          sampling_timesteps=5, use_Hy=True, vicinity_type="hv")
    diff = GaussianDiffusion(model.apply, cfg, fn_y2cov=fn_y2cov)
    key = jax.random.PRNGKey(10)
    imgs = jax.random.uniform(key, (4, IMG, IMG, NC))
    labels = jax.random.uniform(key, (4, 1))
    emb = jax.random.normal(key, (4, 128))
    loss, _ = diff.loss(variables, key, imgs, labels, emb, jnp.ones((4,)), kappa=0.2)
    assert np.isfinite(float(loss))
    out = diff.ddim_sample(variables, key, emb, labels=labels, cond_scale=1.5)
    assert out.shape == (4, IMG, IMG, NC)


def test_cfg_plus_plus_changes_output(tiny):
    model, variables = tiny
    diff_a = make_diffusion(model, use_cfg_plus_plus=False, objective="pred_x0")
    diff_b = make_diffusion(model, use_cfg_plus_plus=True, objective="pred_x0")
    emb = jax.random.normal(jax.random.PRNGKey(11), (2, 128))
    key = jax.random.PRNGKey(12)
    out_a = diff_a.ddim_sample(variables, key, emb, cond_scale=2.0)
    out_b = diff_b.ddim_sample(variables, key, emb, cond_scale=2.0)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_loss_jits_cleanly(tiny):
    model, variables = tiny
    diff = make_diffusion(model, vicinity_type="hv")

    @jax.jit
    def step(v, key, imgs, labels, emb, w):
        return diff.loss(v, key, imgs, labels, emb, w, kappa=0.1)[0]

    key = jax.random.PRNGKey(13)
    imgs = jax.random.uniform(key, (4, IMG, IMG, NC))
    labels = jax.random.uniform(key, (4, 1))
    emb = jax.random.normal(key, (4, 128))
    l1 = step(variables, key, imgs, labels, emb, jnp.ones((4,)))
    l2 = step(variables, key, imgs, labels, emb, jnp.ones((4,)))
    np.testing.assert_allclose(float(l1), float(l2))


def test_hy_log_scale_cap(tiny):
    """A runaway y2cov tail (the round-4 teacher-collapse failure: h_max 17
    -> 1/Hy 3e7 at a few pixels) is bounded by hy_max_log; <=0 reproduces
    exact reference semantics (diffusion.py:502-505, no bound)."""
    from ccdm_tpu.diffusion.gaussian import hy_from_y2cov

    model, variables = tiny
    h = jnp.array([[0.02, 1.0, 17.0, 0.0]])
    capped = hy_from_y2cov(h, 4.0)
    raw = hy_from_y2cov(h, 0.0)
    assert np.allclose(np.asarray(capped[0, :2]), np.exp([-0.02, -1.0]), rtol=1e-6)
    assert float(capped[0, 2]) == pytest.approx(np.exp(-4.0))   # tail capped
    assert float(raw[0, 2]) == pytest.approx(np.exp(-17.0))     # reference: unbounded

    def heavy_tail_y2cov(labels):
        b = labels.shape[0]
        flat = jnp.full((b, NC * IMG * IMG), 0.02)
        return flat.at[:, 0].set(17.0)  # one runaway pixel

    key = jax.random.PRNGKey(11)
    imgs = jax.random.uniform(key, (4, IMG, IMG, NC))
    labels = jax.random.uniform(key, (4, 1))
    emb = jax.random.normal(key, (4, 128))
    losses = {}
    for tag, cap in (("capped", 4.0), ("reference", 0.0)):
        cfg = DiffusionConfig(image_size=IMG, channels=NC, timesteps=50,
                              sampling_timesteps=5, use_Hy=True,
                              vicinity_type="hv", hy_max_log=cap)
        diff = GaussianDiffusion(model.apply, cfg, fn_y2cov=heavy_tail_y2cov)
        loss, _ = diff.loss(variables, key, imgs, labels, emb, jnp.ones((4,)), kappa=0.2)
        losses[tag] = float(loss)
    # the single runaway pixel dominates the uncapped loss by ~exp(13)
    assert losses["reference"] > 1e3 * losses["capped"]
    assert np.isfinite(losses["capped"])
