"""Tests for TPU-native style_ops vs numpy oracles of the reference fallbacks."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.ops.style_ops import bias_act, filtered_lrelu, upfirdn2d


@pytest.mark.parametrize("act,gain", [
    ("linear", 1.0), ("relu", math.sqrt(2)), ("lrelu", math.sqrt(2)),
    ("tanh", 1.0), ("sigmoid", 1.0), ("elu", 1.0), ("selu", 1.0),
    ("softplus", 1.0), ("swish", math.sqrt(2)),
])
def test_bias_act_default_gains(act, gain, rng):
    x = jnp.asarray(rng.normal(0, 1, (4, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (8,)).astype(np.float32))
    out = np.asarray(bias_act(x, b, act=act, impl="ref"))
    # spot-check gain scaling on the linear region
    if act == "linear":
        np.testing.assert_allclose(out, np.asarray(x) + np.asarray(b)[None], atol=1e-6)
    assert np.all(np.isfinite(out))


def test_bias_act_clamp():
    x = jnp.asarray(np.linspace(-10, 10, 32, dtype=np.float32).reshape(4, 8))
    out = np.asarray(bias_act(x, act="linear", clamp=1.5, impl="ref"))
    assert out.min() >= -1.5 and out.max() <= 1.5


def oracle_upfirdn2d(x, f, up, down, pad):
    """Numpy transcription of upfirdn2d.py:166-207 (NHWC)."""
    b, h, w, c = x.shape
    upx = upy = up
    downx = downy = down
    padx0, padx1, pady0, pady1 = pad, pad, pad, pad
    # zero-insert upsample
    z = np.zeros((b, h * upy, w * upx, c), np.float32)
    z[:, ::upy, ::upx] = x
    # pad
    z = np.pad(z, ((0, 0), (max(pady0, 0), max(pady1, 0)), (max(padx0, 0), max(padx1, 0)), (0, 0)))
    z = z[:, max(-pady0, 0): z.shape[1] - max(-pady1, 0), max(-padx0, 0): z.shape[2] - max(-padx1, 0)]
    # correlate with flipped filter (reference flips when flip_filter=False)
    ff = np.flip(f, (0, 1))
    kh, kw = ff.shape
    oh = z.shape[1] - kh + 1
    ow = z.shape[2] - kw + 1
    out = np.zeros((b, oh, ow, c), np.float32)
    for i in range(kh):
        for j in range(kw):
            out += ff[i, j] * z[:, i:i + oh, j:j + ow]
    return out[:, ::downy, ::downx]


@pytest.mark.parametrize("up,down,pad", [(1, 1, 1), (2, 1, 1), (1, 2, 1), (2, 2, 2)])
def test_upfirdn2d_matches_oracle(rng, up, down, pad):
    x = rng.normal(0, 1, (2, 8, 8, 3)).astype(np.float32)
    f = rng.normal(0, 1, (3, 3)).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f), up=up, down=down, padding=pad))
    want = oracle_upfirdn2d(x, f, up, down, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upfirdn2d_separable_matches_2d(rng):
    x = rng.normal(0, 1, (2, 8, 8, 3)).astype(np.float32)
    f1 = rng.normal(0, 1, (3,)).astype(np.float32)
    f2 = np.outer(f1, f1)
    got_sep = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f1), padding=1))
    got_2d = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f2), padding=1))
    np.testing.assert_allclose(got_sep, got_2d, atol=1e-4)


def test_filtered_lrelu_shapes(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 4)).astype(np.float32))
    f = jnp.asarray(np.array([1.0, 3.0, 3.0, 1.0], np.float32) / 8.0)
    out = filtered_lrelu(x, fu=f, fd=f, up=2, down=2, padding=2)
    assert out.ndim == 4 and out.shape[0] == 2 and out.shape[-1] == 4
    assert np.all(np.isfinite(np.asarray(out)))
