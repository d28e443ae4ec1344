"""Tests for respaced schedules, timestep resampling, classifier guidance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.diffusion.respace import make_respaced_schedule, space_timesteps
from ccdm_tpu.training.resample import (
    create_loss_aware_state,
    loss_aware_weights,
    sample_timesteps,
    update_with_losses,
)


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim250")
    assert len(steps) == 250
    assert steps[0] == 0 and steps[-1] == 996


def test_space_timesteps_sections():
    steps = space_timesteps(100, "10,10")
    assert len(steps) == 20


def test_respaced_schedule_preserves_alphas():
    use = space_timesteps(1000, "ddim50")
    sched, tmap = make_respaced_schedule(1000, "cosine", "pred_noise", use)
    assert sched.num_timesteps == 50
    assert tmap.shape == (50,)
    # respaced cumprod at step i equals base cumprod at tmap[i]
    from ccdm_tpu.ops.schedule import make_schedule

    base = make_schedule(1000, "cosine", "pred_noise")
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod),
        np.asarray(base.alphas_cumprod)[tmap],
        rtol=1e-4,
    )


def test_loss_aware_sampler_warmup_uniform():
    st = create_loss_aware_state(10, history_per_term=4)
    w = np.asarray(loss_aware_weights(st))
    np.testing.assert_allclose(w, 0.1, atol=1e-6)


def test_loss_aware_sampler_prefers_high_loss():
    st = create_loss_aware_state(4, history_per_term=2)
    # fill history: t=0 gets big losses, others small
    for _ in range(4):
        t = jnp.array([0, 1, 2, 3])
        losses = jnp.array([10.0, 0.1, 0.1, 0.1])
        st = update_with_losses(st, t, losses)
    w = np.asarray(loss_aware_weights(st))
    assert w[0] > 0.8
    t, iw = sample_timesteps(jax.random.PRNGKey(0), st, 1000)
    assert (np.asarray(t) == 0).mean() > 0.5
    # importance weights normalize: E[iw] ~ 1
    assert 0.5 < float(np.mean(np.asarray(iw))) < 2.0


def test_update_with_losses_handles_duplicates():
    st = create_loss_aware_state(3, history_per_term=4)
    t = jnp.array([1, 1, 1, 2])
    losses = jnp.array([1.0, 2.0, 3.0, 4.0])
    st = update_with_losses(st, t, losses)
    hist_t1 = np.asarray(st.history[1])
    # all three duplicate losses recorded in distinct slots
    assert sorted(hist_t1[hist_t1 > 0].tolist()) == [1.0, 2.0, 3.0]
    assert int(st.counts[1]) == 3


@pytest.mark.slow  # compile-heavy e2e (~50s); guidance math covered by unit tests
def test_classifier_guided_sample():
    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.diffusion.guided import (
        classifier_grad_fn,
        classifier_guided_sample,
        make_fn_class_embed,
        bin_labels,
    )
    from ccdm_tpu.eval.backbones import ResNetEval
    from ccdm_tpu.models import Unet

    IMG, NC = 16, 3
    m = Unet(dim=8, dim_mults=(1, 2), in_channels=NC, attn_heads=1, attn_dim_head=8)
    k = jax.random.PRNGKey(0)
    v = m.init(k, jnp.zeros((2, IMG, IMG, NC)), jnp.zeros((2,), jnp.int32),
               jnp.zeros((2, 128)), None, train=False)
    diff = GaussianDiffusion(m.apply, DiffusionConfig(image_size=IMG, channels=NC,
                                                      timesteps=20, sampling_timesteps=4))
    cls = ResNetEval(5, "class", num_blocks=(1, 1, 1, 1))
    cv = cls.init(k, jnp.zeros((2, IMG, IMG, NC)), train=False)
    cond_fn = classifier_grad_fn(cls.apply, cv)

    emb_fn = make_fn_class_embed(5, 128)
    classes = jnp.array([1, 3])
    out = classifier_guided_sample(diff, v, k, emb_fn(classes), classes, cond_fn,
                                   guidance_scale=2.0, sampling_timesteps=4)
    assert out.shape == (2, IMG, IMG, NC)
    assert np.all(np.isfinite(np.asarray(out)))

    bins = bin_labels(np.array([0.0, 45.0, 89.9]), 49, 0.0, 90.0)
    assert bins[0] == 0 and bins[-1] == 48
