"""Auxiliary label-regressor for the elastic loss (vanilla V8, optional).

TPU-native re-design of `CCDM_vanilla/.../models/aux_net.py:42-210`:
VGG / ResNet18/34 regressors ending in 512->512->1 ReLU MLP. The reference
defines a sinusoidal timestep embedding but never wires it into the nets,
while the elastic loss calls `net_aux(x_t_hat, t)` — a latent defect (the
feature is disabled by default, `lambda_aux=0`). Here the nets take an
optional timestep and inject it additively after the stem when
`use_t_emb=True`, defaulting to the reference's x-only behavior.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccdm_tpu.models.layers import SinusoidalPosEmb
from ccdm_tpu.models.resnet_embed import BasicBlock

VGG_CFG = {
    "VGG11": [64, "M", 128, "M", 128, "M", 128, "M"],
    "VGG13": [64, 64, "M", 128, 128, "M", 128, "M", 128, "M"],
    "VGG16": [64, 64, "M", 128, 128, "M", 128, 128, "M", 128, 128, "M"],
    "VGG19": [64, 64, "M", 128, 128, "M", 128, 128, 128, "M", 128, 128, 128, "M"],
}


class _RegressorHead(nn.Module):
    @nn.compact
    def __call__(self, h: jax.Array, train: bool) -> jax.Array:
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        h = nn.relu(bn("bn1")(nn.Dense(512, name="fc1")(h)))
        h = nn.relu(bn("bn2")(nn.Dense(512, name="fc2")(h)))
        return nn.relu(nn.Dense(1, name="fc3")(h))


class VGGAux(nn.Module):
    vgg_name: str = "VGG19"
    use_t_emb: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, t: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        h = x
        ci = 0
        for spec in VGG_CFG[self.vgg_name]:
            if spec == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                h = nn.Conv(spec, (3, 3), padding=1, name=f"conv{ci}")(h)
                h = nn.relu(bn(f"bn{ci}")(h))
                if ci == 0 and self.use_t_emb and t is not None:
                    temb = nn.Dense(spec, name="t_proj")(SinusoidalPosEmb(128, name="t_emb")(t))
                    h = h + temb[:, None, None, :]
                ci += 1
        h = h.reshape(h.shape[0], -1)
        return _RegressorHead(name="head")(h, train)


class ResNetAux(nn.Module):
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    use_t_emb: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, t: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="stem_conv")(x)
        h = nn.relu(bn("stem_bn")(h))
        if self.use_t_emb and t is not None:
            temb = nn.Dense(64, name="t_proj")(SinusoidalPosEmb(128, name="t_emb")(t))
            h = h + temb[:, None, None, :]
        for stage, nb in enumerate(self.num_blocks):
            planes = 64 * (2**stage)
            for b in range(nb):
                stride = 2 if b == 0 else 1
                h = BasicBlock(planes, stride, name=f"stage{stage}_block{b}")(h, train)
        h = jnp.mean(h, axis=(1, 2))
        return _RegressorHead(name="head")(h, train)


def make_aux_net(name: str, use_t_emb: bool = False):
    if "VGG" in name:
        return VGGAux(name, use_t_emb)
    if name == "ResNet18":
        return ResNetAux((2, 2, 2, 2), use_t_emb)
    if name == "ResNet34":
        return ResNetAux((3, 4, 6, 3), use_t_emb)
    raise ValueError(f"unknown aux name {name}")
