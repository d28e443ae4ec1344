"""Train state pytree with EMA shadowing.

EMA re-implements the semantics of the vendored lucidrains
`CCDM_unified/ema_pytorch.py:18-181`: a per-call step counter, `update_every`
stride, copy-through until `update_after_step`, then lerp with an
inverse-decay warmup  d = clamp(1 - (1 + epoch/inv_gamma)^(-power),
min_value, beta)  where epoch = step - update_after_step - 1. Buffers
(batch_stats) shadow alongside params exactly as the reference EMAs torch
buffers. All branches are `jnp.where` on traced counters so the whole update
lives inside the jitted train step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class EmaConfig:
    beta: float = 0.9999
    update_after_step: int = 100
    update_every: int = 10
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0
    min_value: float = 0.0


@struct.dataclass
class TrainState:
    step: jax.Array  # int32 scalar, number of completed optimizer steps
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_step: jax.Array  # int32 scalar, number of ema.update() calls
    ema_params: Any
    ema_batch_stats: Any


def create_train_state(variables: dict, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_step=jnp.zeros((), jnp.int32),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        ema_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
    )


def ema_decay_value(step: jax.Array, cfg: EmaConfig) -> jax.Array:
    """Current decay (ema_pytorch.get_current_decay, `ema_pytorch.py:124-131`)."""
    epoch = jnp.maximum(step.astype(jnp.float32) - cfg.update_after_step - 1.0, 0.0)
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** (-cfg.power)
    value = jnp.clip(value, cfg.min_value, cfg.beta)
    return jnp.where(epoch <= 0.0, 0.0, value)


def ema_update(state: TrainState, cfg: EmaConfig) -> TrainState:
    """One ema.update() call (`ema_pytorch.py:133-181` semantics)."""
    step = state.ema_step
    do_update = (step % cfg.update_every) == 0
    do_copy = step <= cfg.update_after_step
    decay = ema_decay_value(step, cfg)

    def blend(ema, cur):
        # copy when warming up, lerp otherwise; frozen when off-stride
        target = jnp.where(do_copy, cur, decay * ema + (1.0 - decay) * cur)
        return jnp.where(do_update, target, ema)

    new_ema_params = jax.tree_util.tree_map(blend, state.ema_params, state.params)
    new_ema_stats = jax.tree_util.tree_map(blend, state.ema_batch_stats, state.batch_stats)
    return state.replace(
        ema_step=step + 1,
        ema_params=new_ema_params,
        ema_batch_stats=new_ema_stats,
    )


def ema_variables(state: TrainState) -> dict:
    """Variables dict for sampling with the EMA model."""
    v = {"params": state.ema_params}
    if state.ema_batch_stats:
        v["batch_stats"] = state.ema_batch_stats
    return v


def online_variables(state: TrainState) -> dict:
    v = {"params": state.params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


def precast_sampling_params(variables: dict) -> dict:
    """Cast f32 KERNEL leaves (ndim >= 2) to bf16 ONCE, outside the
    sampling scan.

    Sampling perf mode (`--samp_precast_bf16`): each DDIM step then reads
    2-byte weights from HBM instead of 4-byte ones. For flax Dense/Conv
    under `--train_amp` this is exactly the bf16 cast the layer performs
    at use anyway, hoisted out of the 250-step scan body. It is NOT fully
    bit-identical: the fused Pallas blocks (resnet_block/attn_block)
    consume raw kernels, so their weight operands drop from f32 to bf16 —
    one bf16 rounding per matmul, the standard inference-precision trade.
    1-D leaves (biases, norm scales) stay f32: they are a rounding error
    of the weight bytes and flax norm affine math promotes to f32. The
    train step keeps f32 masters — optax updates need them."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2
        else x,
        variables)
