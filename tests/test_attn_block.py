"""Fused prenorm+qkv+attention+out block (ops/attn_block.py).

Contract: fused_attn_block == x + out_norm(Wout·linattn(Wqkv·pre_norm(x)))
with the exact RMSNorm/softmax semantics of models/layers.py. The Pallas
kernel is validated in interpret mode against the pure-jnp composition; the
composition itself is validated against the ORIGINAL unfused module stack
(PreNormResidual(LinearAttention)) to pin the refactor.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccdm_tpu.ops import attn_block as ab


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _params(rng, c, f):
    return (
        jnp.asarray(rng.normal(0, 1, (c,)).astype(np.float32)) * 0.5 + 1.0,
        jnp.asarray(rng.normal(0, 0.1, (c, 3 * f)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (f, c)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 1, (c,)).astype(np.float32)) * 0.5 + 1.0,
    )


def test_reference_matches_unfused_module_stack(rng):
    """attn_block_reference == PreNormResidual(LinearAttention) with the
    same weights mapped onto the flax param tree (pins the refactor)."""
    from ccdm_tpu.models.layers import LinearAttention, PreNormResidual

    b, hw, c, heads, dim_head = 2, 8, 32, 4, 32
    f = heads * dim_head
    g_pre, wqkv, wout, bout, g_out = _params(rng, c, f)
    x = jnp.asarray(rng.normal(0, 1, (b, hw, hw, c)).astype(np.float32))

    mod = PreNormResidual(c, LinearAttention(c, heads, dim_head))
    variables = {"params": {
        "norm": {"g": g_pre},
        "fn": {
            "to_qkv": {"kernel": wqkv.reshape(1, 1, c, 3 * f)},
            "to_out": {"kernel": wout.reshape(1, 1, f, c), "bias": bout},
            "out_norm": {"g": g_out},
        },
    }}
    want = mod.apply(variables, x)
    got = ab.attn_block_reference(x.reshape(b, hw * hw, c), g_pre, wqkv,
                                  wout, bout, g_out, heads, dim_head)
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c,n", [(32, 64), (128, 256)])
def test_kernel_interpret_matches_reference(rng, monkeypatch, c, n):
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    heads, dim_head = 4, 32
    f = heads * dim_head
    g_pre, wqkv, wout, bout, g_out = _params(rng, c, f)
    x = jnp.asarray(rng.normal(0, 2, (2, n, c)).astype(np.float32))
    want = ab.attn_block_reference(x, g_pre, wqkv, wout, bout, g_out,
                                   heads, dim_head)
    got = ab._forward_pallas(x, g_pre, wqkv, wout, bout, g_out, heads, dim_head)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_kernel_interpret_bf16(rng, monkeypatch):
    """bf16 activations (the sampler dtype): f32 norms/softmaxes inside."""
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    heads, dim_head, c, n = 4, 32, 64, 128
    f = heads * dim_head
    g_pre, wqkv, wout, bout, g_out = _params(rng, c, f)
    x = jnp.asarray(rng.normal(0, 1, (2, n, c)).astype(np.float32)).astype(jnp.bfloat16)
    want = np.asarray(ab.attn_block_reference(x, g_pre, wqkv, wout, bout,
                                              g_out, heads, dim_head), np.float32)
    got = np.asarray(ab._forward_pallas(x, g_pre, wqkv, wout, bout, g_out,
                                        heads, dim_head), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("n,chunk", [(4096, 2048), (6144, 2048)])
def test_large_n_kernel_interpret_matches_reference(rng, monkeypatch, n, chunk):
    """Two-pass large-N fused block (interpret) vs the composition,
    incl. a non-power-of-two chunk count."""
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    heads, dim_head, c = 4, 32, 64
    f = heads * dim_head
    g_pre, wqkv, wout, bout, g_out = _params(rng, c, f)
    x = jnp.asarray(rng.normal(0, 2, (2, n, c)).astype(np.float32))
    want = ab.attn_block_reference(x, g_pre, wqkv, wout, bout, g_out,
                                   heads, dim_head)
    got = ab._forward_pallas_large(x, g_pre, wqkv, wout, bout, g_out,
                                   heads, dim_head, chunk=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_large_n_kernel_shifted_exp_matches_at_high_k(rng, monkeypatch):
    """The large-N pass A shifts by the exact XLA-precomputed colmax of k.
    Scaling the QKV WEIGHTS (the input scale is normalized away by the
    prenorm) drives |k| to ~30 — well past normal operation — where the
    shifted kernel must match the reference softmax."""
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    heads, dim_head, c, n = 4, 32, 64, 4096
    f = heads * dim_head
    g_pre, wqkv, wout, bout, g_out = _params(rng, c, f)
    x = jnp.asarray(rng.normal(0, 1, (1, n, c)).astype(np.float32))
    # check the scale actually reaches the intended regime
    xn = np.asarray(ab._rms_norm(x, g_pre))
    k = np.einsum("bnc,cf->bnf", xn, np.asarray(wqkv * 8)[:, f:2 * f])
    assert 20 < np.abs(k).max() < 45, np.abs(k).max()
    want = np.asarray(ab.attn_block_reference(x, g_pre, wqkv * 8, wout, bout,
                                              g_out, heads, dim_head))
    got = np.asarray(ab._forward_pallas_large(x, g_pre, wqkv * 8, wout, bout,
                                              g_out, heads, dim_head))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


def test_large_n_kernel_exact_softmax_at_extreme_k(rng, monkeypatch):
    """With |k| ~ 150 the round-2 clamp-at-45 silently deviated from the
    reference; the exact colmax shift must now MATCH the reference softmax
    in this blow-up regime (ADVICE round-2 fix). Only W_k is scaled: the
    q-side keeps its documented global-row-max-shift underflow caveat for
    intra-row gaps > ~87, which is a separate (inference-benign) regime."""
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    heads, dim_head, c, n = 4, 32, 64, 2048
    f = heads * dim_head
    g_pre, wqkv, wout, bout, g_out = _params(rng, c, f)
    wqkv_hot_k = wqkv.at[:, f:2 * f].mul(40.0)  # |k| ~ 150, q/v normal
    x = jnp.asarray(rng.normal(0, 1, (1, n, c)).astype(np.float32))
    want = np.asarray(ab.attn_block_reference(x, g_pre, wqkv_hot_k, wout, bout,
                                              g_out, heads, dim_head))
    got = np.asarray(ab._forward_pallas_large(x, g_pre, wqkv_hot_k, wout, bout,
                                              g_out, heads, dim_head))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)
    # the all-weights blow-up regime must at least stay finite
    got_all = np.asarray(ab._forward_pallas_large(x, g_pre, wqkv * 40, wout,
                                                  bout, g_out, heads, dim_head))
    assert np.isfinite(got_all).all()


def test_large_n_kernel_bf16(rng, monkeypatch):
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    heads, dim_head, c, n = 4, 32, 64, 4096
    f = heads * dim_head
    g_pre, wqkv, wout, bout, g_out = _params(rng, c, f)
    x = jnp.asarray(rng.normal(0, 1, (1, n, c)).astype(np.float32)).astype(jnp.bfloat16)
    want = np.asarray(ab.attn_block_reference(x, g_pre, wqkv, wout, bout,
                                              g_out, heads, dim_head), np.float32)
    got = np.asarray(ab._forward_pallas_large(x, g_pre, wqkv, wout, bout,
                                              g_out, heads, dim_head), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_gradients_flow_through_custom_vjp(rng):
    """Backward runs the reference composition: grads finite and match an
    undecorated composition exactly (same function)."""
    heads, dim_head, c, n = 4, 32, 32, 64
    f = heads * dim_head
    g_pre, wqkv, wout, bout, g_out = _params(rng, c, f)
    x = jnp.asarray(rng.normal(0, 1, (2, n, c)).astype(np.float32))

    def loss_fused(w):
        return jnp.sum(ab.fused_attn_block(x, g_pre, w, wout, bout, g_out,
                                           heads, dim_head) ** 2)

    def loss_ref(w):
        return jnp.sum(ab.attn_block_reference(x, g_pre, w, wout, bout, g_out,
                                               heads, dim_head) ** 2)

    gf = jax.grad(loss_fused)(wqkv)
    gr = jax.grad(loss_ref)(wqkv)
    assert np.isfinite(np.asarray(gf)).all()
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # compile-heavy; parity pinned elsewhere
def test_unet_param_count_unchanged_by_fusion(rng):
    """The fused module declares the same parameters as the old
    PreNormResidual(LinearAttention) composition (reference parity tests
    pin the absolute count; this pins the refactor's invariance)."""
    from ccdm_tpu.models import Unet

    model = Unet(dim=16, dim_mults=(1, 2), in_channels=3)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                   jnp.zeros((1,), jnp.int32), jnp.zeros((1, 128)), None,
                   train=False)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    # old composition, per attention site: C (pre g) + C*3F (qkv) + F*C + C
    # (out) + C (out g). mults (1,2) -> dims [16,16,32], in_out
    # [(16,16),(16,32)]: down sites at dim_in 16,16; up sites at dim_out 32,16
    fdim = 4 * 32
    expect_site = lambda c: c + c * 3 * fdim + fdim * c + c + c
    total_attn = 3 * expect_site(16) + expect_site(32)
    blocks = {k: v2 for k, v2 in v["params"].items()
              if k.endswith("_attn") and k != "mid_attn"}
    got_attn = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(blocks))
    assert got_attn == total_attn
    assert n_params > total_attn  # sanity: rest of the net present


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_fused_backward_matches_reference_vjp(rng, monkeypatch, dtype):
    """The round-3 fused two-pass backward (interpret mode) must reproduce
    jax.vjp of the unfused composition for ALL six gradients."""
    import jax
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    heads, dim_head, c, n = 4, 32, 64, 4096
    f = heads * dim_head
    g_pre, wqkv, wout, bout, g_out = _params(rng, c, f)
    x = jnp.asarray(rng.normal(0, 1, (2, n, c)).astype(np.float32))
    dy = jnp.asarray(rng.normal(0, 1, (2, n, c)).astype(np.float32))
    if dtype == "bfloat16":
        x, dy = x.astype(jnp.bfloat16), dy.astype(jnp.bfloat16)

    _, a, s, kmax = ab._forward_pallas_large(
        x, g_pre, wqkv, wout, bout, g_out, heads, dim_head,
        return_residuals=True)
    got = ab._backward_pallas_large(x, g_pre, wqkv, wout, bout, g_out, dy,
                                    a, s, kmax, heads, dim_head)

    # oracle: f32 reference vjp (for bf16 inputs our f32-internal backward
    # is CLOSER to the true gradient than a bf16 reference vjp, whose own
    # rounding noise under token-sum cancellation would dominate the diff)
    _, vjp = jax.vjp(
        lambda *args: ab.attn_block_reference(*args, heads=heads,
                                              dim_head=dim_head),
        x.astype(jnp.float32), g_pre, wqkv, wout, bout, g_out)
    want = vjp(dy.astype(jnp.float32))

    exact = dtype == "float32"
    names = ["dx", "d_gpre", "d_wqkv", "d_wout", "d_bout", "d_gout"]
    for nm, gv, wv in zip(names, got, want):
        assert gv.shape == wv.shape, nm
        gv32, wv32 = np.asarray(gv, np.float32), np.asarray(wv, np.float32)
        if exact:
            np.testing.assert_allclose(gv32, wv32, rtol=2e-3, atol=2e-3,
                                       err_msg=nm)
        else:  # bf16: scale-aware bound (reductions amplify rounding noise)
            np.testing.assert_allclose(
                gv32, wv32, rtol=1e-1,
                atol=0.02 * max(float(np.abs(wv32).max()), 1.0), err_msg=nm)
    # dtype contract: dx matches x's dtype, weight grads stay f32
    assert got[0].dtype == x.dtype and got[2].dtype == wqkv.dtype
