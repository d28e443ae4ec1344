"""Tests for ReACGAN/ADCGAN conditional losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.training.classgan import (
    ADCHead,
    D2DCEHead,
    adc_d_loss,
    adc_g_loss,
    d2d_ce_loss,
)


def test_d2d_ce_head_and_loss():
    head = D2DCEHead(embed_dim=16, num_classes=5)
    k = jax.random.PRNGKey(0)
    feats = jax.random.normal(k, (8, 32))
    v = head.init(k, feats)
    emb, proxies = head.apply(v, feats)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)
    labels = jnp.array([0, 1, 2, 3, 4, 0, 1, 2])
    loss = d2d_ce_loss(emb, proxies, labels)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_d2d_ce_decreases_when_aligned():
    """Loss must be lower when embeddings sit exactly on their class proxies."""
    k = jax.random.PRNGKey(1)
    proxies = jax.random.normal(k, (4, 8))
    proxies = proxies / jnp.linalg.norm(proxies, axis=-1, keepdims=True)
    labels = jnp.array([0, 1, 2, 3])
    aligned = proxies[labels]
    rand = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
    rand = rand / jnp.linalg.norm(rand, axis=-1, keepdims=True)
    assert float(d2d_ce_loss(aligned, proxies, labels)) < float(d2d_ce_loss(rand, proxies, labels))


def test_adc_losses():
    head = ADCHead(num_classes=3)
    k = jax.random.PRNGKey(0)
    feats = jax.random.normal(k, (6, 16))
    v = head.init(k, feats)
    logits = head.apply(v, feats)
    assert logits.shape == (6, 6)
    labels = jnp.array([0, 1, 2, 0, 1, 2])
    d = adc_d_loss(logits, logits, labels, labels, 3)
    g = adc_g_loss(logits, labels, 3)
    assert np.isfinite(float(d)) and np.isfinite(float(g))


def test_adc_d_loss_separates():
    """Perfectly separated logits give near-zero D loss."""
    labels = jnp.array([0, 1])
    real_logits = jnp.array([[50.0, 0, 0, 0, 0, 0], [0, 0, 50.0, 0, 0, 0]])  # (c, real)
    fake_logits = jnp.array([[0, 50.0, 0, 0, 0, 0], [0, 0, 0, 50.0, 0, 0]])  # (c, fake)
    loss = adc_d_loss(real_logits, fake_logits, labels, labels, 3)
    assert float(loss) < 1e-3
