"""TPU-native style_ops: fused bias+activation and upfirdn2d.

The ONLY native (C++/CUDA) code in the reference is StudioGAN's style_ops
(`CCDM_vanilla/.../StudioGAN/utils/style_ops/`: bias_act.cu, upfirdn2d.cu,
filtered_lrelu.cu — 2,615 LoC of CUDA whose exact semantics are specified by
their Python `impl='ref'` fallbacks). These are the TPU equivalents
(SURVEY.md §2.3-B6):

- `bias_act`: all 9 activations with the reference's default alpha/gain and
  clamp semantics (`bias_act.py:20-30, 89-117`). On TPU the hot path is a
  Pallas VPU kernel fusing bias+act+gain+clamp in one VMEM pass; the jnp path
  is the always-correct fallback (XLA fuses it well too — the Pallas kernel
  exists to guarantee the fusion and skip HLO round-trips inside larger
  pallas pipelines).
- `upfirdn2d`: upsample-FIR-downsample as ONE `lax.conv_general_dilated`
  (lhs_dilation = up, window_strides = down, grouped depthwise filter) —
  the idiomatic XLA formulation of `upfirdn2d.py:166-207`; separable 1-D
  filters run as two thin convs exactly like the reference.
- `filtered_lrelu`: upfirdn(up) -> bias+lrelu+clamp -> upfirdn(down),
  matching `filtered_lrelu.py` ref semantics.

Layout: NHWC (channel on the TPU lane dim).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class _ActSpec:
    fn: callable
    def_alpha: float
    def_gain: float


activation_funcs = {
    "linear": _ActSpec(lambda x, a: x, 0.0, 1.0),
    "relu": _ActSpec(lambda x, a: jax.nn.relu(x), 0.0, math.sqrt(2)),
    "lrelu": _ActSpec(lambda x, a: jax.nn.leaky_relu(x, a), 0.2, math.sqrt(2)),
    "tanh": _ActSpec(lambda x, a: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _ActSpec(lambda x, a: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _ActSpec(lambda x, a: jax.nn.elu(x), 0.0, 1.0),
    "selu": _ActSpec(lambda x, a: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _ActSpec(lambda x, a: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _ActSpec(lambda x, a: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2)),
}


def _resolve(act: str, alpha, gain, clamp) -> Tuple[_ActSpec, float, float, float]:
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp if clamp is not None else -1.0)
    return spec, alpha, gain, clamp


def bias_act(x: jax.Array, b: Optional[jax.Array] = None, dim: int = -1,
             act: str = "linear", alpha: Optional[float] = None,
             gain: Optional[float] = None, clamp: Optional[float] = None,
             impl: str = "auto") -> jax.Array:
    """Fused bias + activation + gain + clamp (bias_act.py:89-117 semantics).

    dim: axis the 1-D bias lives on (default -1 = channels in NHWC).
    impl: 'ref' (jnp), 'pallas' (TPU kernel), or 'auto'.
    """
    spec, alpha, gain, clamp = _resolve(act, alpha, gain, clamp)
    if impl == "auto":
        impl = "pallas" if (
            jax.default_backend() == "tpu" and x.ndim >= 2 and x.shape[-1] % 128 == 0
            and (dim in (-1, x.ndim - 1))
        ) else "ref"
    if impl == "pallas":
        return _bias_act_pallas(x, b, act, alpha, gain, clamp)
    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape)
    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


def _bias_act_pallas(x: jax.Array, b: Optional[jax.Array], act: str,
                     alpha: float, gain: float, clamp: float) -> jax.Array:
    """Single-pass VPU kernel: load tile -> +bias -> act -> *gain -> clamp."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    c = orig_shape[-1]
    x2 = x.reshape(-1, c)
    n = x2.shape[0]
    if b is None:
        b = jnp.zeros((c,), x2.dtype)
    spec = activation_funcs[act]

    tile_n = min(256, n) if n % 8 == 0 or n < 8 else n
    # fall back to one big block when n isn't tileable
    if n % tile_n != 0:
        tile_n = n

    def kernel(x_ref, b_ref, o_ref):
        v = x_ref[:] + b_ref[:][None, :]
        v = spec.fn(v, alpha)
        if gain != 1.0:
            v = v * gain
        if clamp >= 0:
            v = jnp.clip(v, -clamp, clamp)
        o_ref[:] = v

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x2, b.astype(x2.dtype))
    return out.reshape(orig_shape)


def _parse_scaling(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _parse_padding(p):
    if isinstance(p, int):
        return p, p, p, p
    if len(p) == 2:
        return p[0], p[0], p[1], p[1]
    return tuple(p)  # (x0, x1, y0, y1)


def upfirdn2d(x: jax.Array, f: Optional[jax.Array], up=1, down=1, padding=0,
              flip_filter: bool = False, gain: float = 1.0) -> jax.Array:
    """Upsample (zero-insert), FIR filter, downsample — one grouped conv.

    x: [B,H,W,C]; f: [kh,kw] or [k] (separable) float32 taps.
    Semantics of `upfirdn2d.py:166-207` (ref impl), NHWC.
    """
    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    f = jnp.asarray(f, jnp.float32)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    b, h, w, c = x.shape

    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    # The reference zero-inserts AFTER each sample (H -> H*up with trailing
    # zeros, upfirdn2d.py:186-188); lhs_dilation inserts zeros BETWEEN
    # samples ((H-1)*up+1), so the missing up-1 trailing zeros become extra
    # bottom/right padding.
    pady1 = pady1 + upy - 1
    padx1 = padx1 + upx - 1

    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))

    def grouped_conv(v, taps_hw):
        kh, kw = taps_hw.shape
        kern = jnp.broadcast_to(taps_hw[:, :, None, None], (kh, kw, 1, c)).astype(v.dtype)
        return jax.lax.conv_general_dilated(
            v, kern,
            window_strides=(downy, downx),
            padding=((pady0, pady1), (padx0, padx1)),
            lhs_dilation=(upy, upx),
            dimension_numbers=dn,
            feature_group_count=c,
        )

    if f.ndim == 2:
        return grouped_conv(x, f)
    # separable: vertical then horizontal thin convs (ref :204-206)
    kern_v = f[:, None]
    kern_h = f[None, :]
    out = jax.lax.conv_general_dilated(
        x, jnp.broadcast_to(kern_v[:, :, None, None], (f.shape[0], 1, 1, c)).astype(x.dtype),
        window_strides=(downy, 1), padding=((pady0, pady1), (0, 0)),
        lhs_dilation=(upy, 1), dimension_numbers=dn, feature_group_count=c,
    )
    out = jax.lax.conv_general_dilated(
        out, jnp.broadcast_to(kern_h[:, :, None, None], (1, f.shape[0], 1, c)).astype(x.dtype),
        window_strides=(1, downx), padding=((0, 0), (padx0, padx1)),
        lhs_dilation=(1, upx), dimension_numbers=dn, feature_group_count=c,
    )
    return out


def filtered_lrelu(x: jax.Array, fu: Optional[jax.Array] = None,
                   fd: Optional[jax.Array] = None, b: Optional[jax.Array] = None,
                   up: int = 1, down: int = 1, padding=0, gain: float = math.sqrt(2),
                   slope: float = 0.2, clamp: Optional[float] = None) -> jax.Array:
    """StyleGAN3 fused filter + leaky-relu: upfirdn(up) -> bias+lrelu(+clamp)
    -> upfirdn(down). Semantics of `filtered_lrelu.py` ref impl, NHWC."""
    px0, px1, py0, py1 = _parse_padding(padding)
    x = upfirdn2d(x, fu, up=up, padding=(px0, px1, py0, py1), gain=up**2)
    x = bias_act(x, b, act="lrelu", alpha=slope, gain=gain, clamp=clamp, impl="ref")
    x = upfirdn2d(x, fd, down=down)
    return x
