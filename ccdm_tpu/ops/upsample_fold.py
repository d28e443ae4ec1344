"""Folded nearest-2x-upsample + conv3x3 (exact algebraic rewrite).

The reference Upsample (`CCDM_unified/models/unet.py:74-78`) materializes the
nearest-2x map and runs conv3x3 on it: at the UTKFace-128 north star that is
a [B,128,128,C] intermediate written+read through HBM and a conv whose input
is 4x larger than it needs to be. Because nearest-upsample repeats each
source pixel 2x2, the composition collapses exactly: for each output parity
(di,dj) in the 2x2 cell, the 3x3 taps over the upsampled map read only a 2x2
neighbourhood of the SOURCE map, with tap weights summed where two upsampled
positions alias the same source pixel:

    row fold  di=0: rows (i-1: w0), (i: w1+w2)
              di=1: rows (i: w0+w1), (i+1: w2)      (same fold for columns)

so conv3x3(nearest2x(x), W) == depth_to_space(conv(x, fold(W))) exactly (up
to one f32 pre-sum of aliased taps vs two MACs in the conv accumulator).

Two equivalent foldings, selected by `variant`:
  - "conv3": ONE 3x3 SAME conv to 4*Cout channels (parity-major), then
    depth-to-space. Same MAC count as the reference (5/9 of taps are the
    fold's structural zeros) but the input is read at source resolution
    (4x fewer bytes), the 4x intermediate never exists, and the output
    matmul runs 4*Cout lanes wide.
  - "conv2x3": TWO [2,3] convs (one per row parity, asymmetric row padding),
    each to 2*Cout channels — 2/3 of the reference MAC count, 2*Cout lanes.

Both keep the parameter tree of the reference module (kernel [3,3,Cin,Cout])
so checkpoints are unaffected; folding happens at trace time.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# tap-fold matrices R[parity, folded_row, source_tap_row] (same for columns)
_FOLD = jnp.array(
    [[[1, 0, 0], [0, 1, 1], [0, 0, 0]],
     [[0, 0, 0], [1, 1, 0], [0, 0, 1]]], jnp.float32)

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# Round-3 verdict (PROFILE.md §8): STANDALONE the fold wins at the large
# source maps (64^2: 5.70 vs 6.89 ms) — but IN-GRAPH XLA already fuses the
# nearest-2x broadcast into the conv's input, so the 4x intermediate never
# actually exists there and the fold's depth-to-space epilogue only adds a
# relayout: full-forward A/B at the 128^2 north star measured reference
# 81.41 / conv3 85.84 / conv2x3 85.43 ms. The reference composition stays
# the default; CCDM_TPU_UPSAMPLE=conv3|conv2x3 opts the fold in (kept,
# tested, exact — the win is real wherever the producer can't fuse, e.g.
# a non-broadcast upsample input).
UPSAMPLE_VARIANT = os.environ.get("CCDM_TPU_UPSAMPLE", "reference")


def _depth_to_space_2x(y4: jax.Array, cout: int) -> jax.Array:
    """[B,h,w,4*Cout] parity-major (di,dj,cout) -> [B,2h,2w,Cout]."""
    b, h, w, _ = y4.shape
    y4 = y4.reshape(b, h, w, 2, 2, cout)
    return y4.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)


def upsample_conv3x3_folded(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                            variant: str | None = None) -> jax.Array:
    """nearest2x + conv3x3(kernel,bias), computed at source resolution.

    x [B,h,w,Cin]; kernel [3,3,Cin,Cout] f32 params; bias [Cout].
    Returns [B,2h,2w,Cout] in x.dtype.
    """
    variant = variant or UPSAMPLE_VARIANT
    dt = x.dtype
    cout = kernel.shape[-1]

    if variant == "conv3":
        # K[a,b,i,(p,q,o)] = sum_{u,v} FOLD[p,a,u] FOLD[q,b,v] W[u,v,i,o]
        k4 = jnp.einsum("pau,qbv,uvio->abipqo", _FOLD, _FOLD,
                        kernel.astype(jnp.float32))
        k4 = k4.reshape(3, 3, kernel.shape[2], 4 * cout)
        y4 = jax.lax.conv_general_dilated(
            x.astype(dt), k4.astype(dt), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=_DIMNUMS)
        y4 = y4 + jnp.tile(bias, 4).astype(y4.dtype)
        return _depth_to_space_2x(y4, cout).astype(dt)

    if variant == "conv2x3":
        w32 = kernel.astype(jnp.float32)
        b2 = jnp.tile(bias, 2)
        halves = []
        for di, row_pad in ((0, (1, 0)), (1, (0, 1))):
            rf = _FOLD[di][:2] if di == 0 else _FOLD[di][1:]  # [2,3] row fold
            k2 = jnp.einsum("au,qbv,uvio->abiqo", rf, _FOLD, w32)
            k2 = k2.reshape(2, 3, kernel.shape[2], 2 * cout)
            y2 = jax.lax.conv_general_dilated(
                x.astype(dt), k2.astype(dt), window_strides=(1, 1),
                padding=(row_pad, (1, 1)), dimension_numbers=_DIMNUMS)
            y2 = y2 + b2.astype(y2.dtype)
            bsz, h, w, _ = y2.shape
            halves.append(y2.reshape(bsz, h, w, 2, cout))
        y = jnp.stack(halves, axis=2)  # [B,h,2(di),w,2(dj),Cout]
        bsz, h, _, w, _, _ = y.shape
        return y.reshape(bsz, 2 * h, 2 * w, cout).astype(dt)

    raise ValueError(f"unknown folded-upsample variant {variant!r}")


def upsample_conv3x3_reference(x: jax.Array, kernel: jax.Array,
                               bias: jax.Array) -> jax.Array:
    """Materialized nearest-2x + conv3x3 — the reference composition, with
    nn.Conv's numerics (operands cast to x.dtype)."""
    b, h, w, c = x.shape
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    up = up.reshape(b, 2 * h, 2 * w, c)
    y = jax.lax.conv_general_dilated(
        up.astype(x.dtype), kernel.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=_DIMNUMS)
    return (y + bias.astype(y.dtype)).astype(x.dtype)
