"""Fused linear-attention Pallas kernel (the UNet's hottest op).

The lucidrains linear attention (`CCDM_unified/models/unet.py:189-216`) is
the single largest cost in the 64^2 sampler: measured ~60% of UNet forward
time on v5e, and the op is HBM-bandwidth-bound — the unfused XLA version
materializes softmax(q), softmax(k), and the per-head context between every
stage. This kernel computes, per (batch, head) grid cell, entirely in VMEM:

    q' = softmax_D(q) * D^-1/2          (rowwise, per token)
    k' = softmax_N(k)                    (columnwise, over all tokens)
    ctx[d,e] = sum_n k'[n,d] v[n,e]      (D x E, tiny)
    out = q' @ ctx

reading q/k/v from HBM once and writing out once. Numerics match the
reference formulation exactly (softmaxes in f32).

Training still works: jax.custom_vjp with the forward running the kernel and
the backward re-running the pure-jnp reference under jax.vjp (attention
backward is not on the benchmark path; sampling is).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_blockdiag(heads: int, dim_head: int, dtype=jnp.float32) -> jax.Array:
    """[F, F] block-diagonal ones mask, F = heads*dim_head — the shared
    currency of the full-lane kernels (per-head group sums and cross-head
    ctx masking via one MXU matmul each)."""
    return jnp.kron(jnp.eye(heads, dtype=dtype),
                    jnp.ones((dim_head, dim_head), dtype))


def finalize_ctx(a: jax.Array, s: jax.Array, bd: jax.Array, out_dtype) -> jax.Array:
    """Normalize + block-diag-mask the accumulated context of a two-pass
    large-N kernel: a [B,F,F] unnormalized exp(k)^T v, s [B,1,F] colsumexp.
    ONE definition shared by the standalone two-pass linear-attention
    kernel and the large-N fused attention block — a numerics change here
    must hit both."""
    return ((a / jnp.maximum(jnp.transpose(s, (0, 2, 1)), 1e-30)) * bd[None]
            ).astype(out_dtype)


def linear_attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Pure-jnp reference: q,k,v [B,N,H,D] -> out [B,N,H,D]."""
    d = q.shape[-1]
    qf = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * (d**-0.5)
    kf = jax.nn.softmax(k.astype(jnp.float32), axis=1)
    ctx = jnp.einsum("bnhd,bnhe->bhde", kf, v.astype(jnp.float32))
    out = jnp.einsum("bhde,bnhd->bnhe", ctx, qf)
    return out.astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref):
    """One (batch*head) cell: q/k/v refs are [1, N, D] blocks in VMEM."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    d = q.shape[-1]

    # rowwise softmax over D (lanes)
    qm = jnp.max(q, axis=-1, keepdims=True)
    qe = jnp.exp(q - qm)
    qs = qe / jnp.sum(qe, axis=-1, keepdims=True) * (d**-0.5)

    # columnwise softmax over N (sublanes)
    km = jnp.max(k, axis=0, keepdims=True)
    ke = jnp.exp(k - km)
    ks = ke / jnp.sum(ke, axis=0, keepdims=True)

    # tiny context matrix [D, E] on the MXU, then out = q' @ ctx
    ctx = jax.lax.dot_general(ks, v, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = jax.lax.dot_general(qs, ctx, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _forward_pallas(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = q.shape
    # [B,N,H,D] -> [B*H, N, D] grid cells
    to_cells = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    qc, kc, vc = to_cells(q), to_cells(k), to_cells(v)

    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * d * d * 2,
            bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
            transcendentals=2 * b * h * n * d,
        ),
    )(qc, kc, vc)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _kernel_fulllane(q_ref, k_ref, v_ref, bd_ref, o_ref, *, dim_head: int):
    """One batch-element cell with ALL heads packed in lanes: refs [1, N, F]
    where F = H*D (=128 -> full lane utilization).

    Per-head q softmax uses the shift-invariance trick: subtracting the
    GLOBAL row max (constant across the row, hence within each head group)
    leaves each group softmax unchanged; group sums come from one MXU matmul
    with the block-diagonal ones matrix bd [F, F]. The head-mixing terms of
    ctx are masked off with the same bd.
    """
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    d = jnp.float32(dim_head)
    # MXU operand dtype follows the input dtype: on the bf16 sampler path
    # the dots run native bf16 x bf16 -> f32 (f32xf32 dots run the MXU at a
    # fraction of bf16 rate and dominated this kernel's round-1 cost);
    # f32 inputs keep exact f32 math. (Mosaic cannot reshape [N,F]->[N,H,D]
    # for a VPU group reduce, so group sums stay on the MXU via bd.)
    mxu = jnp.bfloat16 if o_ref.dtype == jnp.bfloat16 else jnp.float32
    bd = bd_ref[:].astype(mxu)

    # --- q': per-head-group softmax over lanes (global-row-max shift
    # invariance; group sums from one block-diagonal ones matmul)
    q_shift = q - jnp.max(q, axis=-1, keepdims=True)
    eq = jnp.exp(q_shift)
    group_sum = jax.lax.dot_general(eq.astype(mxu), bd, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    # guard: a head group far below the GLOBAL row max underflows eq to 0
    qs = eq / jnp.maximum(group_sum, 1e-30) * jax.lax.rsqrt(d)

    # --- k': softmax over tokens (sublanes)
    ek = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
    ks = ek / jnp.sum(ek, axis=0, keepdims=True)

    # --- ctx = k'^T v masked to per-head blocks; out = q' @ ctx
    ctx = jax.lax.dot_general(ks.astype(mxu), v_ref[0].astype(mxu),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ctx = (ctx * bd_ref[:].astype(jnp.float32)).astype(mxu)
    out = jax.lax.dot_general(qs.astype(mxu), ctx,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _forward_pallas_fulllane(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = q.shape
    f = h * d
    flat = lambda x: x.reshape(b, n, f)
    qc, kc, vc = flat(q), flat(k), flat(v)
    bd = make_blockdiag(h, d, q.dtype)

    spec = pl.BlockSpec((1, n, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bd_spec = pl.BlockSpec((f, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_fulllane, dim_head=d),
        out_shape=jax.ShapeDtypeStruct((b, n, f), q.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec, bd_spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * f * f * 2,
            bytes_accessed=4 * b * n * f * q.dtype.itemsize,
            transcendentals=2 * b * n * f,
        ),
    )(qc, kc, vc, bd)
    return out.reshape(b, n, h, d)


def _kernel_ctx_twopass(k_ref, v_ref, m_ref, a_ref, s_ref):
    """Context accumulation for the two-pass large-N path.

    Grid (B, NC), chunk axis minor: the [F,F] accumulator A and [1,F]
    colsumexp s are OUTPUT blocks whose index map ignores the chunk axis,
    so they stay VMEM-resident across one batch row's chunks — accumulate
    in place, no scratch, no rescaling. The column max m is precomputed by
    XLA (one cheap fused reduction pass over k), which removes the serial
    online-max dependency that sank the round-1 chunked kernel
    (per-chunk A *= scale rescaling on the minor axis)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        a_ref[0] = jnp.zeros_like(a_ref[0])
        s_ref[0] = jnp.zeros_like(s_ref[0])

    # MXU operand dtype follows the input dtype (see _kernel_fulllane)
    mxu = jnp.bfloat16 if v_ref.dtype == jnp.bfloat16 else jnp.float32
    m = m_ref[0].astype(jnp.float32)  # [1, F]
    # 4-way sub-chunk software pipeline: the partial (exp -> dot) chains are
    # independent, so the VLIW scheduler overlaps part i's MXU dot with
    # part i+1's VPU exp (a single chain serializes them and was the
    # dominant per-chunk cost at large N)
    ch = k_ref.shape[1]
    parts = 4 if ch % 4 == 0 else 1
    sub = ch // parts
    s_parts, a_parts = [], []
    for p in range(parts):
        kp = k_ref[0, p * sub:(p + 1) * sub, :].astype(jnp.float32)
        e = jnp.exp(kp - m)
        s_parts.append(jnp.sum(e, axis=0, keepdims=True))
        a_parts.append(jax.lax.dot_general(
            e.astype(mxu), v_ref[0, p * sub:(p + 1) * sub, :].astype(mxu),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ))
    s_ref[0] += sum(s_parts)
    a_ref[0] += sum(a_parts)


def _kernel_out_twopass(q_ref, ctx_ref, bd_ref, o_ref, *, dim_head: int):
    """Output pass: per-chunk q softmax times the finalized [F,F] context
    (already normalized, block-diag masked, cast to the MXU dtype)."""
    mxu = ctx_ref.dtype
    bd = bd_ref[:].astype(mxu)
    scale = jax.lax.rsqrt(jnp.float32(dim_head))
    # 4-way sub-chunk pipeline (fully independent row blocks — see
    # _kernel_ctx_twopass)
    ch = q_ref.shape[1]
    parts = 4 if ch % 4 == 0 else 1
    sub = ch // parts
    for p in range(parts):
        q = q_ref[0, p * sub:(p + 1) * sub, :].astype(jnp.float32)
        eq = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
        group_sum = jax.lax.dot_general(eq.astype(mxu), bd,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        qs = eq / jnp.maximum(group_sum, 1e-30) * scale
        out = jax.lax.dot_general(
            qs.astype(mxu), ctx_ref[0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, p * sub:(p + 1) * sub, :] = out.astype(o_ref.dtype)


def _forward_pallas_twopass(q: jax.Array, k: jax.Array, v: jax.Array,
                            chunk: int = 2048) -> jax.Array:
    """Large-N path: each of q/k/v is read from HBM exactly once (plus one
    XLA reduction pass over k for the column max), out written once.

    Pass A (grid B x NC): accumulate unnormalized context A = exp(k-m)^T v
    and colsumexp s into VMEM-resident output blocks.
    Between passes (XLA, [B,F,F] — trivial): ctx = (A / s^T) * blockdiag.
    Pass B (grid B x NC): out = softmax_group(q)/sqrt(d) @ ctx.

    Replaces the round-1 chunked kernel that LOST to XLA at N=16384
    (13.5 vs 7.7 ms/op): its per-chunk online-max rescaling serialized the
    accumulator update, and its f32 q-softmax epilogue in XLA materialized
    multiple [B,N,F] f32 temporaries."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = q.shape
    f = h * d
    kc = k.reshape(b, n, f)
    vc = v.reshape(b, n, f)
    qc = q.reshape(b, n, f)
    nc = max(n // chunk, 1)
    chunk = n // nc

    # one fused XLA reduction pass; shift-invariance of softmax makes any
    # per-column constant valid, the true max is the numerically safest
    m = jnp.max(kc, axis=1, keepdims=True).astype(jnp.float32)  # [B, 1, F]

    chunk_spec = pl.BlockSpec((1, chunk, f), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, f, f), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    sum_spec = pl.BlockSpec((1, 1, f), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    a, s = pl.pallas_call(
        _kernel_ctx_twopass,
        out_shape=(jax.ShapeDtypeStruct((b, f, f), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, f), jnp.float32)),
        grid=(b, nc),
        in_specs=[chunk_spec, chunk_spec,
                  pl.BlockSpec((1, 1, f), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=(acc_spec, sum_spec),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * f * f,
            bytes_accessed=2 * b * n * f * k.dtype.itemsize,
            transcendentals=b * n * f,
        ),
    )(kc, vc, m)

    bdf = make_blockdiag(h, d)
    mxu = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    ctx = finalize_ctx(a, s, bdf, mxu)

    ctx_spec = pl.BlockSpec((1, f, f), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    bd_spec = pl.BlockSpec((f, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_out_twopass, dim_head=d),
        out_shape=jax.ShapeDtypeStruct((b, n, f), q.dtype),
        grid=(b, nc),
        in_specs=[chunk_spec, ctx_spec, bd_spec],
        out_specs=chunk_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * f * f,
            bytes_accessed=2 * b * n * f * q.dtype.itemsize,
            transcendentals=b * n * f,
        ),
    )(qc, ctx, bdf.astype(q.dtype))
    return out.reshape(b, n, h, d)


import os

# v5e-1 A/B, dim-64 UNet at 64^2, B=128 (ms/forward):
#   33.4  f32 layers + unfused XLA attention      (round-1 start)
#   24.2  bf16 layers + unfused XLA attention
#   44.1  original [N, D=32]-cell kernel           (lane-starved; kept for study)
#   22.1  full-lane kernel (heads packed in lanes) <- default on TPU, small N
# Large N (128^2/192^2 top levels): XLA stays the default. Round 1's
# chunked kernel lost at N=16384 (13.5 vs 7.7 ms/op; serialized online-max
# rescaling); the round-2 two-pass redesign (XLA colmax -> accumulate ctx in
# VMEM-resident output blocks -> separate out pass, bf16 MXU operands,
# 4-way sub-chunk pipelining) closed most of the gap but still measures
# 5.5-8.1 ms vs XLA 4.3-5.9 at N>=8192 (interleaved min-of-rounds, v5e-1):
# the F=128 head-packing pays 4x MXU MACs on cross-head blocks and the
# exp->dot chains bound each chunk, while XLA's fused softmax+einsum is
# already near its traffic roofline. Full table: PROFILE.md.
# CCDM_TPU_TWOPASS_ATTN=1 opts the two-pass kernel in for large N;
# CCDM_TPU_FUSED_ATTN=0 falls back to XLA everywhere.
_USE_PALLAS = os.environ.get("CCDM_TPU_FUSED_ATTN", "1") == "1"
_USE_TWOPASS = os.environ.get("CCDM_TPU_TWOPASS_ATTN", "0") == "1"

# per-cell VMEM footprint ~ 6 f32 arrays of [N, H*D]; stay well under the
# 16 MB budget (128^2+ top levels exceed it and take the XLA path)
_MAX_CELL_ELEMS = 4096 * 128


@jax.custom_vjp
def linear_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Linear attention: q,k,v [B,N,H,D] -> [B,N,H,D].

    Full-lane fused Pallas kernel on TPU when the per-cell footprint fits
    VMEM; XLA reference math otherwise (CPU, huge N, or
    CCDM_TPU_FUSED_ATTN=0)."""
    b, n, h, d = q.shape
    if _USE_PALLAS and jax.default_backend() == "tpu" and (h * d) % 128 == 0:
        if n * h * d <= _MAX_CELL_ELEMS:
            return _forward_pallas_fulllane(q, k, v)
        if _USE_TWOPASS and n % 2048 == 0:
            return _forward_pallas_twopass(q, k, v)
    return linear_attention_reference(q, k, v)


def _fwd(q, k, v):
    return linear_attention(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(linear_attention_reference, q, k, v)
    return vjp(g)


linear_attention.defvjp(_fwd, _bwd)
