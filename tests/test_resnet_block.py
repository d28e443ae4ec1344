"""Fused resnet block (ops/resnet_block.py + FusedResnetBlock module).

Contract: identical math to ResnetBlock (conv3x3+RMSNorm+FiLM+SiLU,
conv3x3+RMSNorm+SiLU, residual/1x1-projection). The roll+mask flat conv is
the part most worth distrusting — it is pinned against lax.conv on random
AND structured (edge-heavy) inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccdm_tpu.ops import resnet_block as rb


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _weights(rng, cin, cout):
    return (
        jnp.asarray(rng.normal(0, 0.2, (3, 3, cin, cout)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (cout,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.5, (cout,)).astype(np.float32)) + 1.0,
        jnp.asarray(rng.normal(0, 0.2, (3, 3, cout, cout)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (cout,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.5, (cout,)).astype(np.float32)) + 1.0,
    )


def test_reference_matches_unfused_module(rng):
    """resnet_block_reference == ResnetBlock.apply with mapped weights."""
    from ccdm_tpu.models.layers import ResnetBlock

    b, hh, ww, cin, cout, tdim = 2, 8, 8, 8, 16, 12
    w1, b1, g1, w2, b2, g2 = _weights(rng, cin, cout)
    wres = jnp.asarray(rng.normal(0, 0.2, (cin, cout)).astype(np.float32))
    bres = jnp.asarray(rng.normal(0, 0.1, (cout,)).astype(np.float32))
    wmlp = jnp.asarray(rng.normal(0, 0.2, (tdim, 2 * cout)).astype(np.float32))
    bmlp = jnp.asarray(rng.normal(0, 0.1, (2 * cout,)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, (b, hh, ww, cin)).astype(np.float32))
    t = jnp.asarray(rng.normal(0, 1, (b, tdim)).astype(np.float32))

    mod = ResnetBlock(cout)
    variables = {"params": {
        "tc_mlp": {"kernel": wmlp, "bias": bmlp},
        "block1": {"proj": {"kernel": w1, "bias": b1}, "norm": {"g": g1}},
        "block2": {"proj": {"kernel": w2, "bias": b2}, "norm": {"g": g2}},
        "res_conv": {"kernel": wres.reshape(1, 1, cin, cout), "bias": bres},
    }}
    want = mod.apply(variables, x, t)

    tc = jnp.dot(jax.nn.silu(t), wmlp) + bmlp
    scale, shift = jnp.split(tc, 2, axis=-1)
    got = rb.resnet_block_reference(
        x.reshape(b, hh * ww, cin), scale, shift, w1, b1, g1, w2, b2, g2,
        wres, bres, hh, ww)
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cin,cout,hh,ww", [(16, 16, 8, 8), (8, 16, 8, 16)])
def test_kernel_interpret_matches_reference(rng, monkeypatch, cin, cout, hh, ww):
    """Pallas kernel (interpret) vs the jnp reference, incl. channel change
    (projection residual) and non-square maps."""
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    b = 2
    w1, b1, g1, w2, b2, g2 = _weights(rng, cin, cout)
    has_res = cin != cout
    wres = jnp.asarray(rng.normal(0, 0.2, (cin, cout)).astype(np.float32))
    bres = jnp.asarray(rng.normal(0, 0.1, (cout,)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, (b, hh * ww, cin)).astype(np.float32))
    scale = jnp.asarray(rng.normal(0, 0.3, (b, cout)).astype(np.float32))
    shift = jnp.asarray(rng.normal(0, 0.3, (b, cout)).astype(np.float32))

    want = rb.resnet_block_reference(x, scale, shift, w1, b1, g1, w2, b2, g2,
                                     wres if has_res else None,
                                     bres if has_res else None, hh, ww)
    got = rb._forward_pallas(x, scale, shift, w1, b1, g1, w2, b2, g2,
                             wres if has_res else None,
                             bres if has_res else None, hh, ww)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_flat_conv_edges_exact(rng, monkeypatch):
    """Edge behavior of the roll+mask conv: an impulse at each corner must
    produce exactly the SAME-padded lax.conv response (no wraparound)."""
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    hh = ww = 8
    cin = cout = 8
    w1, b1, g1, w2, b2, g2 = _weights(rng, cin, cout)
    for pos in (0, ww - 1, (hh - 1) * ww, hh * ww - 1):  # four corners
        x = np.zeros((1, hh * ww, cin), np.float32)
        x[0, pos, :] = 3.0
        x = jnp.asarray(x)
        z = jnp.zeros((1, cout))
        want = rb.resnet_block_reference(x, z, z, w1, b1, g1, w2, b2, g2,
                                         None, None, hh, ww)
        got = rb._forward_pallas(x, z, z, w1, b1, g1, w2, b2, g2,
                                 None, None, hh, ww)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4)


def test_kernel_interpret_bf16(rng, monkeypatch):
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    cin = cout = 16
    hh = ww = 8
    w1, b1, g1, w2, b2, g2 = _weights(rng, cin, cout)
    x = jnp.asarray(rng.normal(0, 1, (2, hh * ww, cin)).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.zeros((2, cout))
    shift = jnp.zeros((2, cout))
    want = np.asarray(rb.resnet_block_reference(
        x, scale, shift, w1, b1, g1, w2, b2, g2, None, None, hh, ww), np.float32)
    got = np.asarray(rb._forward_pallas(
        x, scale, shift, w1, b1, g1, w2, b2, g2, None, None, hh, ww), np.float32)
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_gradients_match_reference(rng):
    cin, cout, hh, ww = 8, 16, 8, 8
    w1, b1, g1, w2, b2, g2 = _weights(rng, cin, cout)
    wres = jnp.asarray(rng.normal(0, 0.2, (cin, cout)).astype(np.float32))
    bres = jnp.zeros((cout,))
    x = jnp.asarray(rng.normal(0, 1, (2, hh * ww, cin)).astype(np.float32))
    scale = jnp.zeros((2, cout))
    shift = jnp.zeros((2, cout))

    def loss_fused(w):
        return jnp.sum(rb.fused_resnet_block(x, scale, shift, w, b1, g1, w2,
                                             b2, g2, wres, bres, hh, ww, True) ** 2)

    def loss_ref(w):
        return jnp.sum(rb.resnet_block_reference(x, scale, shift, w, b1, g1,
                                                 w2, b2, g2, wres, bres, hh, ww) ** 2)

    gf = jax.grad(loss_fused)(w1)
    gr = jax.grad(loss_ref)(w1)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-5, atol=1e-6)


def test_module_matches_unfused_resnetblock(rng):
    """FusedResnetBlock.apply == ResnetBlock.apply with mapped params
    (CPU -> reference path; pins the module wiring + param mapping)."""
    from ccdm_tpu.models.layers import FusedResnetBlock, ResnetBlock

    b, hh, ww, cin, cout, tdim = 2, 8, 8, 8, 16, 12
    x = jnp.asarray(rng.normal(0, 1, (b, hh, ww, cin)).astype(np.float32))
    t = jnp.asarray(rng.normal(0, 1, (b, tdim)).astype(np.float32))

    fused = FusedResnetBlock(cout)
    vf = fused.init(jax.random.PRNGKey(0), x, t)
    pf = vf["params"]
    vref = {"params": {
        "tc_mlp": pf["tc_mlp"],
        "block1": {"proj": {"kernel": pf["conv1_kernel"], "bias": pf["conv1_bias"]},
                   "norm": {"g": pf["norm1_g"]}},
        "block2": {"proj": {"kernel": pf["conv2_kernel"], "bias": pf["conv2_bias"]},
                   "norm": {"g": pf["norm2_g"]}},
        "res_conv": {"kernel": pf["res_kernel"].reshape(1, 1, cin, cout),
                     "bias": pf["res_bias"]},
    }}
    want = ResnetBlock(cout).apply(vref, x, t)
    got = fused.apply(vf, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    n_f = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(vf))
    n_r = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(vref))
    assert n_f == n_r
