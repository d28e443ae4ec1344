"""Fused resnet block: conv3x3+RMSNorm+FiLM+SiLU ×2 + residual, one kernel.

Second round-2 bandwidth fusion (after `ops/attn_block.py`). With the
attention block fused, PROFILE.md §4 shows the 64² sampler at 55% of HBM
bandwidth and 38.6% MFU — the remaining traffic is the resnet-block conv
chain (`models/unet.py:136-187` in the torch reference; ResnetBlock here),
which bounces h1/h2 activations and the residual read through HBM:

    x -> conv3x3 -> norm/FiLM/SiLU -> [N,C] -> conv3x3 -> norm/SiLU
      -> [N,C] -> (+ x or conv1x1(x))

This op keeps the whole block per batch cell in VMEM. The 3×3 SAME conv on
a flat [H*W, C] tile is computed as NINE sublane rolls + edge masks + MXU
matmuls: rolling the flattened map by dy*W+dx rows aligns tap (dy,dx), and
the positions where the flat roll wraps across a row boundary are exactly
the positions the (r+dy, c+dx)-in-bounds mask already zeroes — so no
[H,W,C] reshape, no halo exchange, no padding pass.

Numerics: norms in f32, conv accumulation f32, MXU operand dtype follows
the activation dtype (bf16 sampler path). Backward: custom_vjp re-runs the
pure-jnp reference composition (same contract as fused_attn_block).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def resnet_block_reference(x2d, scale, shift, w1, b1, g1, w2, b2, g2,
                           wres, bres, hh: int, ww: int):
    """Pure-jnp composition (CPU path + custom_vjp backward).

    x2d [B,HW,Cin]; scale/shift [B,Cout]; w1 [3,3,Cin,Cout]; w2
    [3,3,Cout,Cout]; wres [Cin,Cout] or None (identity residual).
    Conv compute dtype follows x2d.dtype (nn.Conv(dtype=...) semantics).
    """
    from ccdm_tpu.ops.attn_block import _rms_norm

    b, n, cin = x2d.shape
    cout = w1.shape[-1]
    dt = x2d.dtype
    img = x2d.reshape(b, hh, ww, cin)

    h = jax.lax.conv_general_dilated(
        img.astype(dt), w1.astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1.astype(dt)
    h = _rms_norm(h, g1)
    h = h * (scale[:, None, None, :].astype(dt) + 1.0) + shift[:, None, None, :].astype(dt)
    h = jax.nn.silu(h)

    h = jax.lax.conv_general_dilated(
        h, w2.astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2.astype(dt)
    h = jax.nn.silu(_rms_norm(h, g2))

    if wres is None:
        res = img
    else:
        res = jnp.einsum("bhwc,cd->bhwd", img, wres.astype(dt)) + bres.astype(dt)
    return (h + res).reshape(b, n, cout)


def _conv3x3_flat(flat, w_ref, bias, r, c, hh, ww, cin, mxu):
    """SAME 3x3 conv on a flat [HW, Cin] map: 9 × (roll + mask + dot),
    statically unrolled.

    w_ref is a [9*Cin, Cout] ref (tap-major); r/c are [HW, 1] row/col
    index vectors. Returns f32 [HW, Cout]. The Mosaic scheduler software-
    pipelines the unroll and keeps ~2 [HW,C] temporaries live PER TAP
    (rolled + masked copies) — which is why the block is split into two
    single-conv kernels (see _kernel_a) and why _dispatch budgets ~18
    [N,C]-equivalents of VMEM. (A fori_loop over taps bounds liveness to
    one tap but measured 5× slower: dynamic rotate is 32-bit-only and the
    loop defeats pipelining.)"""
    n = flat.shape[0]
    cout = w_ref.shape[-1]
    acc = None
    tap = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shift = dy * ww + dx
            # roll-by-0 lowers to a size-0 slice Mosaic rejects; the center
            # tap needs neither roll nor mask (always in bounds)
            sh = flat if shift == 0 else jnp.roll(flat, -shift, axis=0)
            if shift != 0:
                m = ((r + dy >= 0) & (r + dy < hh)
                     & (c + dx >= 0) & (c + dx < ww))
                sh = sh * m.astype(sh.dtype)
            w = w_ref[tap * cin:(tap + 1) * cin, :].astype(mxu)
            d = jax.lax.dot_general(sh.astype(mxu), w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
            tap += 1
    return acc + bias.astype(jnp.float32)


def _rms_f32(h, g):
    inv = jax.lax.rsqrt(jnp.mean(h * h, axis=-1, keepdims=True) + 1e-12)
    return h * inv * g.astype(jnp.float32)


def _kernel_a(x_ref, sc_ref, sf_ref, w1_ref, b1_ref, g1_ref, h_ref,
              *, hh: int, ww: int):
    """First half: conv3x3 + RMSNorm + FiLM + SiLU -> h1.

    The block is split into two kernels because one kernel holding BOTH
    9-tap convs keeps ~2× the rolled/masked [HW,C] temporaries live (the
    Mosaic scheduler software-pipelines across the whole body) and blows
    the 16 MB scoped-VMEM stack at N=4096 (measured 17.21M). Split, each
    half fits; h1 makes one HBM round trip — still ~3× fewer [N,C]
    transfers than the unfused chain."""
    flat = x_ref[0]
    cin = flat.shape[-1]
    mxu = jnp.bfloat16 if flat.dtype == jnp.bfloat16 else jnp.float32
    n = flat.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    r, c = idx // ww, idx % ww

    h = _conv3x3_flat(flat, w1_ref, b1_ref[:], r, c, hh, ww, cin, mxu)
    h = _rms_f32(h, g1_ref[:])
    h = h * (sc_ref[0, 0].astype(jnp.float32) + 1.0) + sf_ref[0, 0].astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)                         # SiLU
    h_ref[0] = h.astype(h_ref.dtype)


def _kernel_b(h_ref, x_ref, w2_ref, b2_ref, g2_ref, *rest,
              hh: int, ww: int, has_res: bool):
    """Second half: conv3x3 + RMSNorm + SiLU + residual(x) -> y."""
    if has_res:
        wres_ref, bres_ref, y_ref = rest
    else:
        (y_ref,) = rest
    hin = h_ref[0]
    cout = hin.shape[-1]
    mxu = jnp.bfloat16 if hin.dtype == jnp.bfloat16 else jnp.float32
    n = hin.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    r, c = idx // ww, idx % ww

    h = _conv3x3_flat(hin, w2_ref, b2_ref[:], r, c, hh, ww, cout, mxu)
    h = _rms_f32(h, g2_ref[:])
    h = h * jax.nn.sigmoid(h)

    flat = x_ref[0]
    if has_res:
        res = jax.lax.dot_general(flat.astype(mxu), wres_ref[:].astype(mxu),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        res = res + bres_ref[:].astype(jnp.float32)
    else:
        res = flat.astype(jnp.float32)
    y_ref[0] = (h + res).astype(y_ref.dtype)


def _forward_pallas(x2d, scale, shift, w1, b1, g1, w2, b2, g2, wres, bres,
                    hh, ww):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, cin = x2d.shape
    cout = w1.shape[-1]
    has_res = wres is not None
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    per_b = lambda shape: pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    # scale/shift ride as [B,1,Cout] so the per-batch block is (1,1,Cout):
    # Mosaic requires the LAST TWO block dims to tile (8,128) or equal the
    # array dims — a (1,Cout) block on [B,Cout] puts the size-1 batch slice
    # in the tiled position and is rejected on real TPUs
    # weights ride in the activation dtype: the kernel casts operands to the
    # MXU dtype anyway, and f32 weight refs alone exceed the 16 MB VMEM
    # budget at C=512 (the mid-block)
    dt = x2d.dtype
    h1 = pl.pallas_call(
        functools.partial(_kernel_a, hh=hh, ww=ww),
        out_shape=jax.ShapeDtypeStruct((b, n, cout), dt),
        grid=(b,),
        in_specs=[per_b((n, cin)), per_b((1, cout)), per_b((1, cout)),
                  row((9 * cin, cout)), row((cout,)), row((cout,))],
        out_specs=per_b((n, cout)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * 9 * cin * cout,
            bytes_accessed=b * n * (cin + cout) * dt.itemsize,
            transcendentals=b * n * cout,
        ),
    )(x2d, scale[:, None, :], shift[:, None, :],
      w1.reshape(9 * cin, cout).astype(dt), b1, g1)

    ins = [h1, x2d, w2.reshape(9 * cout, cout).astype(dt), b2, g2]
    specs = [per_b((n, cout)), per_b((n, cin)),
             row((9 * cout, cout)), row((cout,)), row((cout,))]
    if has_res:
        ins += [wres.astype(dt), bres]
        specs += [row((cin, cout)), row((cout,))]
    return pl.pallas_call(
        functools.partial(_kernel_b, hh=hh, ww=ww, has_res=has_res),
        out_shape=jax.ShapeDtypeStruct((b, n, cout), dt),
        grid=(b,),
        in_specs=specs,
        out_specs=per_b((n, cout)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (9 * cout * cout + cin * cout),
            bytes_accessed=b * n * (cin + 2 * cout) * dt.itemsize,
            transcendentals=b * n * cout,
        ),
    )(*ins)


# MEASURED RESULT (v5e-1, 64² dim-64 sampler): the fused path LOSES to the
# XLA composition — 23.9 vs 18.5 ms UNet forward (12.1 vs 16.5 img/s).
# Traffic does drop as designed (HBM 43% vs 55% of BW) but the 9-tap
# shifted-matmul conv runs the MXU far below XLA's native conv tiling
# (MFU 31% vs 39%), and the loss outweighs the byte savings. Variants
# tried: single fused kernel (scoped-VMEM OOM from scheduler pipelining:
# 17.21M > 16M), fori_loop taps (5× slower: dynamic rotate + no
# pipelining), optimization_barrier sequencing (primitive not lowerable),
# split two-kernel form (this one — compiles and runs, still loses).
# Kept opt-in for study: CCDM_TPU_FUSED_RESBLOCK=1. See PROFILE.md §5.
_MAX_CELL_ELEMS = int(os.environ.get("CCDM_TPU_RESBLOCK_MAX_CELL", 4096 * 160))
_USE_FUSED = os.environ.get("CCDM_TPU_FUSED_RESBLOCK", "0") == "1"


def _dispatch(x2d, scale, shift, w1, b1, g1, w2, b2, g2, wres, bres, hh, ww):
    b, n, cin = x2d.shape
    cout = w1.shape[-1]
    # VMEM estimate per cell: the Mosaic scheduler software-pipelines the
    # 9-tap unroll, keeping ~2 [N,C] temporaries live per tap (rolled +
    # masked copies) plus accumulator/io — measured ~18 [N,C]-equivalents.
    # Weight refs ride in the activation dtype. Cells estimated over the
    # 15 MB mark fall back to the XLA composition (e.g. the 64² up-path
    # concat blocks at Cin=128 and every 128² L0 block).
    welems = max(9 * cin, 9 * cout + (cin if wres is not None else 0)) * cout
    vmem = (welems * x2d.dtype.itemsize
            + 18 * n * max(cin, cout) * x2d.dtype.itemsize)
    if (_USE_FUSED and jax.default_backend() == "tpu"
            and n * max(cin, cout) <= _MAX_CELL_ELEMS
            and vmem <= 15 * 1024 * 1024):
        return _forward_pallas(x2d, scale, shift, w1, b1, g1, w2, b2, g2,
                               wres, bres, hh, ww)
    return resnet_block_reference(x2d, scale, shift, w1, b1, g1, w2, b2, g2,
                                  wres, bres, hh, ww)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def fused_resnet_block(x2d, scale, shift, w1, b1, g1, w2, b2, g2, wres, bres,
                       hh, ww, has_res):
    """Fused resnet block; wres/bres must be zeros-shaped dummies when
    has_res is False (kept in the signature so custom_vjp sees a fixed
    arity; they are ignored and get zero gradients)."""
    return _dispatch(x2d, scale, shift, w1, b1, g1, w2, b2, g2,
                     wres if has_res else None, bres if has_res else None,
                     hh, ww)


def _fwd(x2d, scale, shift, w1, b1, g1, w2, b2, g2, wres, bres, hh, ww, has_res):
    out = _dispatch(x2d, scale, shift, w1, b1, g1, w2, b2, g2,
                    wres if has_res else None, bres if has_res else None,
                    hh, ww)
    return out, (x2d, scale, shift, w1, b1, g1, w2, b2, g2, wres, bres)


def _bwd(hh, ww, has_res, res, g):
    x2d, scale, shift, w1, b1, g1, w2, b2, g2, wres, bres = res

    def f(x2d, scale, shift, w1, b1, g1, w2, b2, g2, wres, bres):
        return resnet_block_reference(
            x2d, scale, shift, w1, b1, g1, w2, b2, g2,
            wres if has_res else None, bres if has_res else None, hh, ww)

    _, vjp = jax.vjp(f, x2d, scale, shift, w1, b1, g1, w2, b2, g2, wres, bres)
    grads = vjp(g)
    if not has_res:  # dummies get explicit zeros (vjp already returns None-free)
        grads = grads[:9] + (jnp.zeros_like(wres), jnp.zeros_like(bres))
    return grads


fused_resnet_block.defvjp(_fwd, _bwd)
