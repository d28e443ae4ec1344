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
    v = v_ref[0].astype(jnp.float32)
    bd = bd_ref[:].astype(jnp.float32)
    d = jnp.float32(dim_head)  # static per-head dim (bd encodes the grouping)

    # --- q': per-head-group softmax over lanes
    q_shift = q - jnp.max(q, axis=-1, keepdims=True)
    eq = jnp.exp(q_shift)
    group_sum = jax.lax.dot_general(eq, bd, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    qs = eq / group_sum * jax.lax.rsqrt(d)

    # --- k': softmax over tokens (sublanes)
    ek = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
    ks = ek / jnp.sum(ek, axis=0, keepdims=True)

    # --- ctx = k'^T v masked to per-head blocks; out = q' @ ctx
    ctx = jax.lax.dot_general(ks, v, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ctx = ctx * bd
    out = jax.lax.dot_general(qs, ctx, (((1,), (0,)), ((), ())),
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
    bd = jnp.kron(jnp.eye(h, dtype=q.dtype), jnp.ones((d, d), q.dtype))

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


def _kernel_ctx_chunked(k_ref, v_ref, bd_ref, ctx_ref, m_scr, s_scr, a_scr):
    """Chunked-N context accumulation with online max rescaling.

    Grid (B, NC); the N-chunk axis is minor so the f32 scratch (running
    colmax m [1,F], colsumexp s [1,F], accumulator A [F,F]) persists across
    chunks of one batch cell. At the last chunk the normalized, block-diag-
    masked context A/s is written out. This extends the full-lane fused
    kernel to resolutions whose full [N,F] cell exceeds VMEM (128^2/192^2
    top levels)."""
    import jax.experimental.pallas as pl

    nc = pl.num_programs(1)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        s_scr[:] = jnp.zeros_like(s_scr)
        a_scr[:] = jnp.zeros_like(a_scr)

    k = k_ref[0].astype(jnp.float32)  # [CH, F]
    v = v_ref[0].astype(jnp.float32)
    chunk_max = jnp.max(k, axis=0, keepdims=True)  # [1, F]
    new_m = jnp.maximum(m_scr[:], chunk_max)
    scale = jnp.exp(m_scr[:] - new_m)  # [1, F]
    e = jnp.exp(k - new_m)  # [CH, F]
    s_scr[:] = s_scr[:] * scale + jnp.sum(e, axis=0, keepdims=True)
    a_scr[:] = a_scr[:] * scale.T + jax.lax.dot_general(
        e, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = new_m

    @pl.when(j == nc - 1)
    def _finalize():
        bd = bd_ref[:].astype(jnp.float32)
        ctx_ref[0] = (a_scr[:] / jnp.maximum(s_scr[:].T, 1e-30)) * bd


def _forward_pallas_chunked(q: jax.Array, k: jax.Array, v: jax.Array,
                            chunk: int = 2048) -> jax.Array:
    """Large-N path: Pallas chunked context + XLA q-softmax/out matmul."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = q.shape
    f = h * d
    kc = k.reshape(b, n, f)
    vc = v.reshape(b, n, f)
    bd = jnp.kron(jnp.eye(h, dtype=q.dtype), jnp.ones((d, d), q.dtype))
    nc = max(n // chunk, 1)
    chunk = n // nc

    chunk_spec = pl.BlockSpec((1, chunk, f), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    ctx = pl.pallas_call(
        _kernel_ctx_chunked,
        out_shape=jax.ShapeDtypeStruct((b, f, f), jnp.float32),
        grid=(b, nc),
        in_specs=[
            chunk_spec,
            chunk_spec,
            pl.BlockSpec((f, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, f), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((f, f), jnp.float32),
        ],
    )(kc, vc, bd)

    # q softmax + output matmul: row-local, XLA fuses these cleanly
    qf = q.reshape(b, n, f).astype(jnp.float32)
    q_shift = qf - jnp.max(qf, axis=-1, keepdims=True)
    eq = jnp.exp(q_shift)
    group_sum = jnp.einsum("bnf,fg->bng", eq, jnp.kron(
        jnp.eye(h, dtype=jnp.float32), jnp.ones((d, d), jnp.float32)))
    qs = eq / group_sum * (d**-0.5)
    out = jnp.einsum("bnf,bfg->bng", qs, ctx)
    return out.reshape(b, n, h, d).astype(q.dtype)


import os

# v5e-1 A/B, dim-64 UNet at 64^2, B=128 (ms/forward):
#   33.4  f32 layers + unfused XLA attention      (round-1 start)
#   24.2  bf16 layers + unfused XLA attention
#   44.1  original [N, D=32]-cell kernel           (lane-starved; kept for study)
#   22.1  full-lane kernel (heads packed in lanes) <- default on TPU
# At N=16384 (128^2 L0) the chunked variant LOSES to XLA (13.5 vs 7.7 ms/op)
# so large-N cells default to the XLA path.
# CCDM_TPU_FUSED_ATTN=0 falls back to the XLA reference formulation.
_USE_PALLAS = os.environ.get("CCDM_TPU_FUSED_ATTN", "1") == "1"

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
        # chunked large-N variant: numerics validated (N up to 16384,
        # rel err ~bf16 noise) but MEASURED SLOWER than XLA at N=16384
        # (13.5 vs 7.7 ms/op, B=64) — the per-chunk scratch rescaling
        # serializes; kept opt-in as a starting point for a revised design.
        if n % 2048 == 0 and os.environ.get("CCDM_TPU_CHUNKED_ATTN") == "1":
            return _forward_pallas_chunked(q, k, v)
    return linear_attention_reference(q, k, v)


def _fwd(q, k, v):
    return linear_attention(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(linear_attention_reference, q, k, v)
    return vjp(g)


linear_attention.defvjp(_fwd, _bwd)
