"""Golden tests for schedule buffers and conversions vs closed-form numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.ops import (
    make_schedule,
    linear_betas,
    cosine_betas,
    q_sample,
    predict_start_from_noise,
    predict_noise_from_start,
    predict_v,
    predict_start_from_v,
    q_posterior,
    extract,
)


def test_linear_betas_endpoints():
    b = linear_betas(1000)
    assert b[0] == pytest.approx(1e-4)
    assert b[-1] == pytest.approx(2e-2)
    # scale-invariance of integrated noise: T=500 doubles endpoints
    b500 = linear_betas(500)
    assert b500[0] == pytest.approx(2e-4)
    assert b500[-1] == pytest.approx(4e-2)


def test_cosine_betas_properties():
    b = cosine_betas(1000)
    assert b.shape == (1000,)
    assert np.all(b >= 0) and np.all(b <= 0.999)
    # alphas_cumprod must be monotonically decreasing from ~1 to ~0
    ac = np.cumprod(1 - b)
    assert ac[0] > 0.99
    assert ac[-1] < 1e-3
    assert np.all(np.diff(ac) < 0)


def test_posterior_identities():
    s = make_schedule(100, "cosine", "pred_noise")
    betas = np.asarray(s.betas, dtype=np.float64)
    ac = np.cumprod(1 - betas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    want_var = betas * (1 - ac_prev) / (1 - ac)
    np.testing.assert_allclose(np.asarray(s.posterior_variance), want_var, rtol=1e-5)
    # mean coefs sum applied to x0==xt recovers identity at t where x0==xt
    c1 = np.asarray(s.posterior_mean_coef1)
    c2 = np.asarray(s.posterior_mean_coef2)
    # closed form: c1 + c2*sqrt(ac_t/ac_prev_t) ~ relationship; check c1,c2 formulas
    np.testing.assert_allclose(c1, betas * np.sqrt(ac_prev) / (1 - ac), rtol=1e-5)
    np.testing.assert_allclose(c2, (1 - ac_prev) * np.sqrt(1 - betas) / (1 - ac), rtol=1e-5)


@pytest.mark.parametrize("objective,weight_fn", [
    ("pred_noise", lambda snr: np.ones_like(snr)),
    ("pred_x0", lambda snr: snr),
    ("pred_v", lambda snr: snr / (snr + 1)),
])
def test_loss_weights(objective, weight_fn):
    s = make_schedule(200, "cosine", objective)
    snr = np.asarray(s.snr, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(s.loss_weight), weight_fn(snr), rtol=1e-4)


def test_min_snr_clipping():
    s = make_schedule(200, "cosine", "pred_x0", min_snr_loss_weight=True, min_snr_gamma=5.0)
    assert np.max(np.asarray(s.loss_weight)) <= 5.0 + 1e-5


def test_qsample_roundtrip():
    """predict_start_from_noise(q_sample(x0, t, eps), t, eps) == x0."""
    s = make_schedule(1000, "cosine", "pred_noise")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (4, 8, 8, 3))
    eps = jax.random.normal(k2, (4, 8, 8, 3))
    t = jax.random.randint(k3, (4,), 0, 1000)
    xt = q_sample(s, x0, t, eps)
    x0_hat = predict_start_from_noise(s, xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=2e-3)
    eps_hat = predict_noise_from_start(s, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), atol=2e-2)


def test_v_roundtrip():
    s = make_schedule(1000, "cosine", "pred_v")
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (4, 8, 8, 3))
    eps = jax.random.normal(k2, (4, 8, 8, 3))
    t = jax.random.randint(k3, (4,), 0, 1000)
    xt = q_sample(s, x0, t, eps)
    v = predict_v(s, x0, t, eps)
    x0_hat = predict_start_from_v(s, xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=2e-3)


def test_qsample_statistics():
    """E[x_t] = sqrt(ac_t) x0, Var = 1-ac_t for large sample."""
    s = make_schedule(1000, "cosine", "pred_noise")
    t_val = 500
    n = 20000
    key = jax.random.PRNGKey(2)
    x0 = jnp.full((n, 1, 1, 1), 0.7)
    eps = jax.random.normal(key, (n, 1, 1, 1))
    t = jnp.full((n,), t_val, dtype=jnp.int32)
    xt = np.asarray(q_sample(s, x0, t, eps)).ravel()
    ac_t = float(s.alphas_cumprod[t_val])
    assert xt.mean() == pytest.approx(np.sqrt(ac_t) * 0.7, abs=0.02)
    assert xt.var() == pytest.approx(1 - ac_t, rel=0.05)


def test_extract_broadcast_shape():
    s = make_schedule(100, "linear", "pred_noise")
    t = jnp.array([0, 50, 99])
    out = extract(s.betas, t, 4)
    assert out.shape == (3, 1, 1, 1)


def test_q_posterior_shapes_and_t0():
    s = make_schedule(100, "cosine", "pred_noise")
    x0 = jnp.ones((2, 4, 4, 3))
    xt = jnp.ones((2, 4, 4, 3))
    t = jnp.array([0, 0])
    mean, var, logvar = q_posterior(s, x0, xt, t)
    assert mean.shape == x0.shape
    # at t=0 posterior variance is 0 (clipped log to log(1e-20))
    assert float(var[0, 0, 0, 0]) == pytest.approx(0.0, abs=1e-10)
