"""Fully-fused attention block: prenorm + qkv + linear attention + out.

Round-2 bandwidth optimization. PROFILE.md shows the 64^2 sampler running at
79% of the HBM-traffic roofline with the MXU at 29% — the remaining lever is
removing bytes. The unfused block (`models/unet.py:189-216` in the torch
reference; PreNormResidual(LinearAttention) here) bounces five [N,*]-sized
tensors off HBM per call:

    x -> rmsnorm -> [N,C] -> qkv conv -> [N,3F] -> attention -> [N,F]
      -> out conv -> [N,C] -> rmsnorm -> + x

This op computes the ENTIRE chain per batch cell in VMEM: x is read from HBM
once, y = x + block(x) written once; the six small weight tensors ride along
broadcast. At the 64^2 level (N=4096, C=64, F=128, 2B=256) that removes
~1.9 GB of qkv/attn-out round-trip traffic per forward.

Numerics: norms and softmaxes in f32 (same as the unfused path); MXU
operand dtype follows the activation dtype (bf16 sampler path = native bf16
dots with f32 accumulation, matching nn.Conv(dtype=bf16) semantics).

Training: jax.custom_vjp — forward runs the kernel, backward re-runs the
pure-jnp reference composition under jax.vjp (attention backward is off the
benchmark path; sampling is forward-only).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _rms_norm(x: jax.Array, g: jax.Array) -> jax.Array:
    """f32-stats RMSNorm matching models/layers.py:RMSNorm."""
    inv = jax.lax.rsqrt(
        jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True) + 1e-12
    )
    return x * inv.astype(x.dtype) * g.astype(x.dtype)


def attn_block_reference(x2d: jax.Array, g_pre: jax.Array, wqkv: jax.Array,
                         wout: jax.Array, bout: jax.Array, g_out: jax.Array,
                         heads: int, dim_head: int) -> jax.Array:
    """Pure-jnp composition (also the custom_vjp backward and the CPU path).

    x2d [B,N,C]; wqkv [C,3F]; wout [F,C]. Compute dtype of the projections
    follows x2d.dtype (nn.Conv(dtype=...) semantics); attention math f32.
    """
    from ccdm_tpu.ops.linear_attention import linear_attention_reference

    b, n, c = x2d.shape
    f = heads * dim_head
    dt = x2d.dtype
    xn = _rms_norm(x2d, g_pre)
    qkv = jnp.einsum("bnc,cf->bnf", xn, wqkv.astype(dt))
    q, k, v = (qkv[..., i * f:(i + 1) * f].reshape(b, n, heads, dim_head)
               for i in range(3))
    out = linear_attention_reference(q, k, v).reshape(b, n, f)
    o = jnp.einsum("bnf,fc->bnc", out, wout.astype(dt)) + bout.astype(dt)
    return x2d + _rms_norm(o, g_out)


def _kernel(x_ref, gp_ref, wqkv_ref, wout_ref, bout_ref, go_ref, bd_ref,
            y_ref, *, dim_head: int, f: int):
    """One batch cell: the whole block on a [N, C] tile resident in VMEM.

    Attention math is the full-lane formulation (all heads packed in lanes,
    per-head softmax via global-row-max shift invariance + block-diagonal
    ones matmuls bd) — see linear_attention._kernel_fulllane."""
    x = x_ref[0]
    mxu = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-12)
    xn = xf * inv * gp_ref[:].astype(jnp.float32)

    qkv = jax.lax.dot_general(
        xn.astype(mxu), wqkv_ref[:].astype(mxu), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [N, 3F]
    q, k = qkv[:, :f], qkv[:, f:2 * f]
    bd = bd_ref[:].astype(mxu)
    d = jnp.float32(dim_head)

    # q': per-head-group softmax over lanes
    eq = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
    gsum = jax.lax.dot_general(eq.astype(mxu), bd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # a head group sitting far below the GLOBAL row max can underflow its
    # whole eq block to 0 -> gsum 0; guard turns 0/0 into 0 (not NaN)
    qs = eq / jnp.maximum(gsum, 1e-30) * jax.lax.rsqrt(d)

    # k': softmax over tokens (sublanes)
    ek = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
    ks = ek / jnp.sum(ek, axis=0, keepdims=True)

    ctx = jax.lax.dot_general(ks.astype(mxu), qkv[:, 2 * f:].astype(mxu),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ctx = (ctx * bd_ref[:].astype(jnp.float32)).astype(mxu)
    out = jax.lax.dot_general(qs.astype(mxu), ctx, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [N, F]

    o = jax.lax.dot_general(out.astype(mxu), wout_ref[:].astype(mxu),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + bout_ref[:].astype(jnp.float32)
    inv2 = jax.lax.rsqrt(jnp.mean(o * o, axis=-1, keepdims=True) + 1e-12)
    y_ref[0] = (xf + o * inv2 * go_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


def _forward_pallas(x2d, g_pre, wqkv, wout, bout, g_out, heads, dim_head):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ccdm_tpu.ops.linear_attention import make_blockdiag

    b, n, c = x2d.shape
    f = heads * dim_head
    bd = make_blockdiag(heads, dim_head)
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, dim_head=dim_head, f=f),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x2d.dtype),
        grid=(b,),
        in_specs=[xspec, row((c,)), row((c, 3 * f)), row((f, c)), row((c,)),
                  row((c,)), row((f, f))],
        out_specs=xspec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (c * 3 * f + 2 * f * f + f * c),
            bytes_accessed=2 * b * n * c * x2d.dtype.itemsize,
            transcendentals=2 * b * n * f,
        ),
    )(x2d, g_pre, wqkv, wout, bout, g_out, bd)


# per-cell VMEM: the dominant residents are qkv f32 [N,3F] plus a few [N,F]
# f32 temporaries and the [N,C] x/y tiles — cap the cell so the live set
# stays under the 16 MB budget (the 128^2 L0 level exceeds it -> XLA path)
_MAX_CELL_ELEMS = int(os.environ.get("CCDM_TPU_ATTN_BLOCK_MAX_CELL", 4096 * 128))
_USE_FUSED = os.environ.get("CCDM_TPU_FUSED_ATTN", "1") == "1"


def _kernel_ctx_large(x_ref, gp_ref, wkv_ref, a_ref, s_ref, *, f: int):
    """Large-N pass A: per x-chunk, prenorm -> kv projection -> UNSHIFTED
    exp(k) -> accumulate context A += e^T v and colsum s (VMEM-resident
    output blocks across the minor chunk axis, as in the two-pass
    linear-attention kernel).

    The softmax shift is omitted: k is the projection of an RMS-normalized
    activation (|k| is O(||g_pre|| · ||W_k||), in practice < 30), and both
    the exp and the f32 accumulators carry an 8-bit exponent. A shifted
    variant would need the global column max of k BEFORE k exists
    (chicken-and-egg with the fused projection), i.e. a third full pass
    over x. As a training safeguard k is clamped at 45 before the exp
    (exp(45)≈3.5e19; summed over N=36864 tokens times |v| the f32
    accumulator stays below ~1e26 « 3.4e38): numerics are bit-identical
    below the clamp, and a blown-up learned W_k degrades gracefully
    instead of producing inf→NaN losses. Validated against the shifted
    reference with weight scales driving |k|≈30, plus a finiteness check
    at |k|≈150 (tests/test_attn_block.py)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        a_ref[0] = jnp.zeros_like(a_ref[0])
        s_ref[0] = jnp.zeros_like(s_ref[0])

    x = x_ref[0]
    mxu = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-12)
    xn = xf * inv * gp_ref[:].astype(jnp.float32)
    kv = jax.lax.dot_general(
        xn.astype(mxu), wkv_ref[:].astype(mxu), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [CH, 2F]
    e = jnp.exp(jnp.minimum(kv[:, :f], 45.0))
    s_ref[0] += jnp.sum(e, axis=0, keepdims=True)
    a_ref[0] += jax.lax.dot_general(
        e.astype(mxu), kv[:, f:].astype(mxu), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _kernel_out_large(x_ref, gp_ref, wq_ref, ctx_ref, bd_ref, wout_ref,
                      bout_ref, go_ref, y_ref, *, dim_head: int):
    """Large-N pass B: per x-chunk, prenorm -> q projection -> per-head
    softmax -> @ctx -> out projection -> out norm -> + residual."""
    x = x_ref[0]
    mxu = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-12)
    xn = xf * inv * gp_ref[:].astype(jnp.float32)
    q = jax.lax.dot_general(
        xn.astype(mxu), wq_ref[:].astype(mxu), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [CH, F]
    bd = bd_ref[:].astype(mxu)
    eq = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
    gsum = jax.lax.dot_general(eq.astype(mxu), bd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    qs = eq / jnp.maximum(gsum, 1e-30) * jax.lax.rsqrt(jnp.float32(dim_head))
    out = jax.lax.dot_general(qs.astype(mxu), ctx_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o = jax.lax.dot_general(out.astype(mxu), wout_ref[:].astype(mxu),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + bout_ref[:].astype(jnp.float32)
    inv2 = jax.lax.rsqrt(jnp.mean(o * o, axis=-1, keepdims=True) + 1e-12)
    y_ref[0] = (xf + o * inv2 * go_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


def _forward_pallas_large(x2d, g_pre, wqkv, wout, bout, g_out, heads,
                          dim_head, chunk: int = 2048):
    """Large-N fused block: x is read TWICE (once per pass) and y written
    once — versus the unfused XLA chain's ~8 [N,F]-sized HBM round trips.
    The projection weights are split so pass A computes only k,v and pass
    B only q (no wasted thirds)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x2d.shape
    f = heads * dim_head
    dt = x2d.dtype
    nc = max(n // chunk, 1)
    chunk = n // nc

    row = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((1, f, f), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, f), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)

    wkv = wqkv[:, f:].astype(dt)   # [C, 2F]
    a, s = pl.pallas_call(
        functools.partial(_kernel_ctx_large, f=f),
        out_shape=(jax.ShapeDtypeStruct((b, f, f), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, f), jnp.float32)),
        grid=(b, nc),
        in_specs=[xspec, row((c,)), row((c, 2 * f))],
        out_specs=(a_spec, s_spec),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (c * 2 * f + f * f),
            bytes_accessed=b * n * c * dt.itemsize,
            transcendentals=b * n * f,
        ),
    )(x2d, g_pre, wkv)

    from ccdm_tpu.ops.linear_attention import finalize_ctx, make_blockdiag

    bd = make_blockdiag(heads, dim_head)
    mxu = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
    ctx = finalize_ctx(a, s, bd, mxu)

    return pl.pallas_call(
        functools.partial(_kernel_out_large, dim_head=dim_head),
        out_shape=jax.ShapeDtypeStruct((b, n, c), dt),
        grid=(b, nc),
        in_specs=[xspec, row((c,)), row((c, f)), a_spec, row((f, f)),
                  row((f, c)), row((c,)), row((c,))],
        out_specs=xspec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (c * f + 2 * f * f + f * c),
            bytes_accessed=2 * b * n * c * dt.itemsize,
            transcendentals=b * n * f,
        ),
    )(x2d, g_pre, wqkv[:, :f].astype(dt), ctx, bd.astype(dt),
      wout.astype(dt), bout, g_out)


_USE_LARGE_N = os.environ.get("CCDM_TPU_FUSED_ATTN_LARGE_N", "1") == "1"


def _dispatch(x2d, g_pre, wqkv, wout, bout, g_out, heads, dim_head):
    f = heads * dim_head
    n = x2d.shape[1]
    if (_USE_FUSED and jax.default_backend() == "tpu" and f % 128 == 0):
        if n * f <= _MAX_CELL_ELEMS:
            return _forward_pallas(x2d, g_pre, wqkv, wout, bout, g_out, heads, dim_head)
        if _USE_LARGE_N and n % 2048 == 0:
            return _forward_pallas_large(x2d, g_pre, wqkv, wout, bout, g_out,
                                         heads, dim_head)
    return attn_block_reference(x2d, g_pre, wqkv, wout, bout, g_out,
                                heads=heads, dim_head=dim_head)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_attn_block(x2d, g_pre, wqkv, wout, bout, g_out, heads, dim_head):
    """Dispatch: fused Pallas block on TPU for VMEM-sized cells, else the
    pure-jnp composition (identical numerics contract)."""
    return _dispatch(x2d, g_pre, wqkv, wout, bout, g_out, heads, dim_head)


def _fwd(x2d, g_pre, wqkv, wout, bout, g_out, heads, dim_head):
    return (_dispatch(x2d, g_pre, wqkv, wout, bout, g_out, heads, dim_head),
            (x2d, g_pre, wqkv, wout, bout, g_out))


def _bwd(heads, dim_head, res, g):
    x2d, g_pre, wqkv, wout, bout, g_out = res
    _, vjp = jax.vjp(
        lambda *a: attn_block_reference(*a, heads=heads, dim_head=dim_head),
        x2d, g_pre, wqkv, wout, bout, g_out)
    return vjp(g)


fused_attn_block.defvjp(_fwd, _bwd)
