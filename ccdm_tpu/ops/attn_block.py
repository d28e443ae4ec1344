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


def _kernel_ctx_large(x_ref, gp_ref, wkv_ref, kmax_ref, a_ref, s_ref, *, f: int):
    """Large-N pass A: per x-chunk, prenorm -> kv projection -> SHIFTED
    exp(k - colmax(k)) -> accumulate context A += e^T v and colsum s
    (VMEM-resident output blocks across the minor chunk axis, as in the
    two-pass linear-attention kernel).

    kmax is the exact per-column max of k over ALL tokens, precomputed by
    one XLA matmul+reduce over x before the kernel launches (the max fuses
    into the matmul consumer; cost is one extra read of x and ~N·C·F MACs,
    « 0.1% of the forward). The normalized context a/s is invariant to the
    per-column shift, so finalize_ctx and pass B are unchanged — this
    preserves EXACT softmax semantics at every weight scale, replacing the
    round-2 clamp-at-45 safeguard whose above-clamp regime silently
    deviated from the reference softmax (ADVICE round-2)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        a_ref[0] = jnp.zeros_like(a_ref[0])
        s_ref[0] = jnp.zeros_like(s_ref[0])

    mxu = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    gp = gp_ref[:].astype(jnp.float32)
    wkv = wkv_ref[:].astype(mxu)
    kmax = kmax_ref[0]
    # 4-way sub-chunk software pipeline (as in linear_attention.py's
    # _kernel_ctx_twopass): the per-part norm->matmul->exp->dot chains are
    # independent, so the VLIW scheduler overlaps part i's MXU dot with
    # part i+1's VPU exp — one chain per chunk serializes VPU and MXU and
    # was the dominant per-chunk cost at the 128^2 L0 shape (PROFILE.md §8)
    ch = x_ref.shape[1]
    parts = 4 if ch % 4 == 0 else 1
    sub = ch // parts
    s_parts, a_parts = [], []
    for p in range(parts):
        xf = x_ref[0, p * sub:(p + 1) * sub, :].astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-12)
        xn = xf * inv * gp
        kv = jax.lax.dot_general(
            xn.astype(mxu), wkv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [SUB, 2F]
        e = jnp.exp(kv[:, :f] - kmax)
        s_parts.append(jnp.sum(e, axis=0, keepdims=True))
        a_parts.append(jax.lax.dot_general(
            e.astype(mxu), kv[:, f:].astype(mxu), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    s_ref[0] += sum(s_parts)
    a_ref[0] += sum(a_parts)


def _kernel_out_large(x_ref, gp_ref, wq_ref, ctx_ref, bd_ref, wout_ref,
                      bout_ref, go_ref, y_ref, *, dim_head: int):
    """Large-N pass B: per x-chunk, prenorm -> q projection -> per-head
    softmax -> @ctx -> out projection -> out norm -> + residual."""
    mxu = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    gp = gp_ref[:].astype(jnp.float32)
    wq = wq_ref[:].astype(mxu)
    bd = bd_ref[:].astype(mxu)
    wout = wout_ref[:].astype(mxu)
    bout = bout_ref[:].astype(jnp.float32)
    go = go_ref[:].astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.float32(dim_head))
    # 4-way sub-chunk pipeline (independent row blocks — see _kernel_ctx_large)
    ch = x_ref.shape[1]
    parts = 4 if ch % 4 == 0 else 1
    sub = ch // parts
    for p in range(parts):
        xf = x_ref[0, p * sub:(p + 1) * sub, :].astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-12)
        xn = xf * inv * gp
        q = jax.lax.dot_general(
            xn.astype(mxu), wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [SUB, F]
        eq = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
        gsum = jax.lax.dot_general(eq.astype(mxu), bd, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        qs = eq / jnp.maximum(gsum, 1e-30) * scale
        out = jax.lax.dot_general(qs.astype(mxu), ctx_ref[0],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o = jax.lax.dot_general(out.astype(mxu), wout,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = o + bout
        inv2 = jax.lax.rsqrt(jnp.mean(o * o, axis=-1, keepdims=True) + 1e-12)
        y_ref[0, p * sub:(p + 1) * sub, :] = (
            xf + o * inv2 * go).astype(y_ref.dtype)


def _forward_pallas_large(x2d, g_pre, wqkv, wout, bout, g_out, heads,
                          dim_head, chunk: int = 2048,
                          return_residuals: bool = False):
    """Large-N fused block: x is read TWICE (once per pass) and y written
    once — versus the unfused XLA chain's ~8 [N,F]-sized HBM round trips.
    The projection weights are split so pass A computes only k,v and pass
    B only q (no wasted thirds).

    With return_residuals, also returns (a, s, kmax) — the tiny [F,F]/[1,F]
    per-batch context statistics the fused BACKWARD needs (they make the
    k-softmax reconstructible per chunk without any global re-reduction)."""
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

    # exact per-column k max over all tokens, one XLA matmul+reduce (the
    # [B,N,F] k never hits HBM — XLA fuses the max into the matmul): makes
    # the pass-A softmax shift exact at every weight scale
    xn32 = x2d.astype(jnp.float32)
    xn32 = xn32 * jax.lax.rsqrt(
        jnp.mean(xn32 * xn32, axis=-1, keepdims=True) + 1e-12)
    xn32 = xn32 * g_pre.astype(jnp.float32)
    mxu_t = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
    k_full = jax.lax.dot_general(
        xn32.astype(mxu_t), wqkv[:, f:2 * f].astype(mxu_t),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    kmax = jnp.max(k_full, axis=1, keepdims=True)  # [B, 1, F]

    a, s = pl.pallas_call(
        functools.partial(_kernel_ctx_large, f=f),
        out_shape=(jax.ShapeDtypeStruct((b, f, f), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, f), jnp.float32)),
        grid=(b, nc),
        in_specs=[xspec, row((c,)), row((c, 2 * f)), s_spec],
        out_specs=(a_spec, s_spec),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (c * 2 * f + f * f),
            bytes_accessed=b * n * c * dt.itemsize,
            transcendentals=b * n * f,
        ),
    )(x2d, g_pre, wkv, kmax)

    from ccdm_tpu.ops.linear_attention import finalize_ctx, make_blockdiag

    bd = make_blockdiag(heads, dim_head)
    mxu = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
    ctx = finalize_ctx(a, s, bd, mxu)

    y = pl.pallas_call(
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
    if return_residuals:
        return y, a, s, kmax
    return y


_USE_LARGE_N = os.environ.get("CCDM_TPU_FUSED_ATTN_LARGE_N", "1") == "1"


# --------------------------------------------------------------- backward
#
# Round-3: the training path no longer recomputes the UNFUSED composition
# on the backward pass (round-2 weak spot: every [N,F] intermediate took
# the full HBM round trip under jax.vjp). The fused backward reuses the
# two-pass chunked structure of the forward:
#
#   residuals saved by the forward: a=[F,F] e^T v, s=[1,F] colsum(e),
#   kmax=[1,F] — per batch, tiny; every [N,*] intermediate is recomputed
#   per chunk in VMEM (rematerialization: trade MXU flops for HBM bytes).
#
#   pass A (per chunk): recompute xn, q-softmax q', out=q'·ctx, o, on;
#     compute do (out-norm backward) and d_out; accumulate d_ctx += q'^T
#     d_out and the out-projection grads; write do [N,C] (the one extra
#     HBM tensor — C-wide, the narrowest choice).
#   between passes (XLA, [F,F]-sized): finalize backward — d_a, d_s from
#     d_ctx, a, s.
#   pass B (per chunk): recompute xn, full qkv, both softmaxes; d_q from
#     d_out=do·Wout^T via the grouped-softmax backward (BD matmul),
#     d_k/d_v from d_a/d_s via the colsum-softmax backward; accumulate
#     d_Wqkv; prenorm backward -> dx (+ residual dy).
#
# Weight-grad accumulators use a constant output block index over the
# whole (batch, chunk) grid — the sequential TPU grid keeps the block
# VMEM-resident and accumulates across every step.


def _recompute_q_softmax(xn, wq_ref, bd, mxu, dim_head):
    """Shared pass-A/B recompute: q projection -> grouped softmax q'
    (identical math to the forward's pass B)."""
    q = jax.lax.dot_general(xn.astype(mxu), wq_ref[:].astype(mxu),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    eq = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
    gsum = jax.lax.dot_general(eq.astype(mxu), bd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    p = eq / jnp.maximum(gsum, 1e-30)
    return p, p * jax.lax.rsqrt(jnp.float32(dim_head))


def _kernel_bwd_a(x_ref, dy_ref, gp_ref, wq_ref, ctx_ref, bd_ref, wout_ref,
                  bout_ref, go_ref, do_ref, dctx_ref, dwout_ref, dbout_ref,
                  dgout_ref, *, dim_head: int):
    import jax.experimental.pallas as pl

    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _init_batch():
        dctx_ref[0] = jnp.zeros_like(dctx_ref[0])

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_global():
        dwout_ref[:] = jnp.zeros_like(dwout_ref[:])
        dbout_ref[:] = jnp.zeros_like(dbout_ref[:])
        dgout_ref[:] = jnp.zeros_like(dgout_ref[:])

    x = x_ref[0]
    mxu = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-12)
    xn = xf * inv * gp_ref[:].astype(jnp.float32)
    _, qs = _recompute_q_softmax(xn, wq_ref, bd_ref[:].astype(mxu), mxu, dim_head)

    out = jax.lax.dot_general(qs.astype(mxu), ctx_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [CH, F]
    o = jax.lax.dot_general(out.astype(mxu), wout_ref[:].astype(mxu),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + bout_ref[:].astype(jnp.float32)
    r2 = jax.lax.rsqrt(jnp.mean(o * o, axis=-1, keepdims=True) + 1e-12)
    on = o * r2

    dy = dy_ref[0].astype(jnp.float32)
    d_on = dy * go_ref[:].astype(jnp.float32)
    c = jnp.float32(o.shape[-1])
    do = r2 * d_on - o * (r2**3) * (jnp.sum(o * d_on, axis=-1, keepdims=True) / c)
    d_out = jax.lax.dot_general(do.astype(mxu), wout_ref[:].astype(mxu),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [CH, F]

    do_ref[0] = do.astype(do_ref.dtype)
    dctx_ref[0] += jax.lax.dot_general(qs.astype(mxu), d_out.astype(mxu),
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    dwout_ref[:] += jax.lax.dot_general(out.astype(mxu), do.astype(mxu),
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dbout_ref[:] += jnp.sum(do, axis=0, keepdims=True)
    dgout_ref[:] += jnp.sum(dy * on, axis=0, keepdims=True)


def _kernel_bwd_b(x_ref, dy_ref, do_ref, gp_ref, wqkv_ref, ctx_ref, bd_ref,
                  wout_ref, kmax_ref, da_ref, ds_ref, dx_ref, dwqkv_ref,
                  dgpre_ref, *, dim_head: int, f: int):
    import jax.experimental.pallas as pl

    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_global():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref[:])
        dgpre_ref[:] = jnp.zeros_like(dgpre_ref[:])

    x = x_ref[0]
    mxu = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-12)
    xr = xf * inv  # x * r1 (pre-gain normalized activation)
    xn = xr * gp_ref[:].astype(jnp.float32)
    qkv = jax.lax.dot_general(xn.astype(mxu), wqkv_ref[:].astype(mxu),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [CH, 3F]
    q, k, v = qkv[:, :f], qkv[:, f:2 * f], qkv[:, 2 * f:]
    bd = bd_ref[:].astype(mxu)

    # ---- q path: d_out -> grouped-softmax backward
    do = do_ref[0].astype(jnp.float32)
    d_out = jax.lax.dot_general(do.astype(mxu), wout_ref[:].astype(mxu),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [CH, F]
    eq = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
    gsum = jax.lax.dot_general(eq.astype(mxu), bd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    p = eq / jnp.maximum(gsum, 1e-30)
    d_qs = jax.lax.dot_general(d_out.astype(mxu), ctx_ref[0],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d_p = d_qs * jax.lax.rsqrt(jnp.float32(dim_head))
    pg = jax.lax.dot_general((d_p * p).astype(mxu), bd,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    d_q = p * (d_p - pg)

    # ---- k/v path: d_a, d_s -> colsum-softmax backward
    e = jnp.exp(k - kmax_ref[0])
    d_e = jax.lax.dot_general(v.astype(mxu), da_ref[0],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [CH, F]
    d_e = d_e + ds_ref[0]
    d_k = e * d_e
    d_v = jax.lax.dot_general(e.astype(mxu), da_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    d_qkv = jnp.concatenate([d_q, d_k, d_v], axis=-1)  # [CH, 3F]
    dwqkv_ref[:] += jax.lax.dot_general(xn.astype(mxu), d_qkv.astype(mxu),
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    d_xn = jax.lax.dot_general(d_qkv.astype(mxu), wqkv_ref[:].astype(mxu),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [CH, C]
    dgpre_ref[:] += jnp.sum(d_xn * xr, axis=0, keepdims=True)

    du = d_xn * gp_ref[:].astype(jnp.float32)
    c = jnp.float32(x.shape[-1])
    dx = inv * du - xf * (inv**3) * (jnp.sum(xf * du, axis=-1, keepdims=True) / c)
    dx_ref[0] = (dy_ref[0].astype(jnp.float32) + dx).astype(dx_ref.dtype)


def _backward_pallas_large(x2d, g_pre, wqkv, wout, bout, g_out, dy,
                           a, s, kmax, heads, dim_head, chunk: int = 1024):
    """Fused two-pass backward; returns grads for the six diff inputs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ccdm_tpu.ops.linear_attention import finalize_ctx, make_blockdiag

    b, n, c = x2d.shape
    f = heads * dim_head
    dt = x2d.dtype
    nc = max(n // chunk, 1)
    chunk = n // nc
    bd = make_blockdiag(heads, dim_head)
    mxu = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
    ctx = finalize_ctx(a, s, bd, mxu)

    row = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    fb_spec = pl.BlockSpec((1, f, f), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    sb_spec = pl.BlockSpec((1, 1, f), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)

    do, d_ctx, d_wout, d_bout, d_gout = pl.pallas_call(
        functools.partial(_kernel_bwd_a, dim_head=dim_head),
        out_shape=(jax.ShapeDtypeStruct((b, n, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, f, f), jnp.float32),
                   jax.ShapeDtypeStruct((f, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        grid=(b, nc),
        in_specs=[xspec, xspec, row((c,)), row((c, f)), fb_spec, row((f, f)),
                  row((f, c)), row((c,)), row((c,))],
        out_specs=(xspec, fb_spec, row((f, c)), row((1, c)), row((1, c))),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (c * f + 3 * f * f + 2 * f * c),
            bytes_accessed=3 * b * n * c * 4,
            transcendentals=b * n * f,
        ),
    )(x2d, dy, g_pre, wqkv[:, :f].astype(dt), ctx, bd.astype(dt),
      wout.astype(dt), bout, g_out)

    # finalize backward (tiny [F,F] math): ctx = (a / s^T) (x) BD
    bd_mask = bd[None]
    d_ctxm = d_ctx * bd_mask
    s_t = jnp.maximum(jnp.transpose(s, (0, 2, 1)), 1e-30)  # [B, F, 1]
    d_a = d_ctxm / s_t
    ctxu = a / s_t
    d_s = -jnp.sum(d_ctxm * ctxu, axis=2, keepdims=True) / s_t  # [B, F, 1]
    d_s = jnp.transpose(d_s, (0, 2, 1))  # [B, 1, F]

    dx, d_wqkv, d_gpre = pl.pallas_call(
        functools.partial(_kernel_bwd_b, dim_head=dim_head, f=f),
        out_shape=(jax.ShapeDtypeStruct((b, n, c), dt),
                   jax.ShapeDtypeStruct((c, 3 * f), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        grid=(b, nc),
        in_specs=[xspec, xspec, xspec, row((c,)), row((c, 3 * f)), fb_spec,
                  row((f, f)), row((f, c)), sb_spec, fb_spec, sb_spec],
        out_specs=(xspec, row((c, 3 * f)), row((1, c))),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (c * 3 * f + 4 * f * f + 3 * f * c + c * 3 * f),
            bytes_accessed=3 * b * n * c * 4,
            transcendentals=2 * b * n * f,
        ),
    )(x2d, dy, do, g_pre, wqkv.astype(dt), ctx, bd.astype(dt),
      wout.astype(dt), kmax, d_a, d_s)

    return (dx,
            d_gpre[0].astype(g_pre.dtype),
            d_wqkv.astype(wqkv.dtype),
            d_wout.astype(wout.dtype),
            d_bout[0].astype(bout.dtype),
            d_gout[0].astype(g_out.dtype))


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


def _can_fuse_bwd(n: int, f: int) -> bool:
    # env read at call time so A/B benchmarks can toggle without re-import
    fused_bwd = os.environ.get("CCDM_TPU_FUSED_ATTN_BWD", "1") == "1"
    return (fused_bwd and _USE_FUSED and _USE_LARGE_N
            and jax.default_backend() == "tpu"
            and f % 128 == 0 and n % 2048 == 0)


def _fwd(x2d, g_pre, wqkv, wout, bout, g_out, heads, dim_head):
    f = heads * dim_head
    if _can_fuse_bwd(x2d.shape[1], f):
        # training path: run the chunked forward so the tiny (a, s, kmax)
        # context residuals come out for free — the fused backward then
        # rematerializes every [N,*] intermediate per chunk in VMEM
        y, a, s, kmax = _forward_pallas_large(
            x2d, g_pre, wqkv, wout, bout, g_out, heads, dim_head,
            return_residuals=True)
        return y, (x2d, g_pre, wqkv, wout, bout, g_out, (a, s, kmax))
    return (_dispatch(x2d, g_pre, wqkv, wout, bout, g_out, heads, dim_head),
            (x2d, g_pre, wqkv, wout, bout, g_out, None))


def _bwd(heads, dim_head, res, g):
    x2d, g_pre, wqkv, wout, bout, g_out, resid = res
    if resid is not None:
        a, s, kmax = resid
        return _backward_pallas_large(x2d, g_pre, wqkv, wout, bout, g_out,
                                      g, a, s, kmax, heads, dim_head)
    _, vjp = jax.vjp(
        lambda *a: attn_block_reference(*a, heads=heads, dim_head=dim_head),
        x2d, g_pre, wqkv, wout, bout, g_out)
    return vjp(g)


fused_attn_block.defvjp(_fwd, _bwd)
