"""Folded upsample-conv (ops/upsample_fold.py): exactness vs the reference
nearest-2x + conv3x3 composition, and checkpoint-tree stability of the
Upsample module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ccdm_tpu.ops.upsample_fold import (
    upsample_conv3x3_folded,
    upsample_conv3x3_reference,
)


def _mk(key, b=2, h=8, w=8, cin=6, cout=10, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (b, h, w, cin), dtype)
    kernel = (jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.3)
    bias = jax.random.normal(k3, (cout,), jnp.float32) * 0.1
    return x, kernel, bias


def _nn_conv_on_upsampled(x, kernel, bias):
    """Oracle: literal flax nn.Conv over the materialized nearest-2x map."""
    b, h, w, c = x.shape
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    up = up.reshape(b, 2 * h, 2 * w, c)
    conv = nn.Conv(kernel.shape[-1], (3, 3), padding=1, dtype=x.dtype)
    return conv.apply({"params": {"kernel": kernel, "bias": bias}}, up)


def test_reference_path_matches_nn_conv():
    x, kernel, bias = _mk(jax.random.PRNGKey(0))
    got = upsample_conv3x3_reference(x, kernel, bias)
    want = _nn_conv_on_upsampled(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("variant", ["conv3", "conv2x3"])
def test_folded_matches_reference_f32(variant):
    x, kernel, bias = _mk(jax.random.PRNGKey(1), h=9, w=7, cin=5, cout=8)
    got = upsample_conv3x3_folded(x, kernel, bias, variant)
    want = upsample_conv3x3_reference(x, kernel, bias)
    assert got.shape == want.shape == (2, 18, 14, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("variant", ["conv3", "conv2x3"])
def test_folded_matches_reference_bf16(variant):
    x, kernel, bias = _mk(jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    got = np.asarray(upsample_conv3x3_folded(x, kernel, bias, variant),
                     np.float32)
    want = np.asarray(upsample_conv3x3_reference(x, kernel, bias), np.float32)
    assert got.dtype == want.dtype
    scale = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / scale) < 0.05


@pytest.mark.parametrize("variant", ["conv3", "conv2x3"])
def test_folded_gradients_match(variant):
    """The rewrite must be transparent to autodiff (the sampler never
    differentiates it, but DMD's generator path can)."""
    x, kernel, bias = _mk(jax.random.PRNGKey(3), b=1, h=5, w=5, cin=3, cout=4)

    def loss_fold(k):
        return jnp.sum(upsample_conv3x3_folded(x, k, bias, variant) ** 2)

    def loss_ref(k):
        return jnp.sum(upsample_conv3x3_reference(x, k, bias) ** 2)

    gf = jax.grad(loss_fold)(kernel)
    gr = jax.grad(loss_ref)(kernel)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_upsample_module_param_tree_unchanged():
    """Upsample keeps nn.Conv's {conv:{kernel,bias}} tree — existing
    checkpoints restore without remapping."""
    from ccdm_tpu.models.layers import Upsample

    m = Upsample(12, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 6)))
    params = v["params"]
    assert set(params.keys()) == {"conv"}
    assert params["conv"]["kernel"].shape == (3, 3, 6, 12)
    assert params["conv"]["bias"].shape == (12,)


def test_upsample_module_off_tpu_matches_reference():
    """On CPU the module takes the reference path; output must equal the
    pre-rewrite composition bit-for-bit (same ops)."""
    from ccdm_tpu.models.layers import Upsample

    m = Upsample(8, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 4))
    v = m.init(jax.random.PRNGKey(2), x)
    got = m.apply(v, x)
    want = _nn_conv_on_upsampled(x, v["params"]["conv"]["kernel"],
                                 v["params"]["conv"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
