"""Evaluation backbones: AE encoder (SFID features), ResNet34 class/regre.

TPU-native re-design of the vanilla eval nets (SURVEY.md §2.2 V6):
- `AEEncoder`: conv x8 (stride-2/stride-1 alternating) -> 512-d bottleneck,
  the SFID feature extractor (`models/autoencoder.py:6-51`); `AEDecoder` for
  pretraining it as an autoencoder (`:55-98`).
- `ResNetEval`: ResNet34 trunk with a classification (Diversity entropy,
  `models/ResNet_class_eval.py:79-126`) or regression (Label Score,
  `models/ResNet_regre_eval.py:75-169`) head.

The reference ships these as downloadable checkpoints; parity claims here
retrain them from the same specs (SURVEY.md §7.3-7 caveat).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccdm_tpu.models.resnet_embed import BasicBlock


class AEEncoder(nn.Module):
    dim_bottleneck: int = 512
    ch: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        h = x
        for i, (mult, stride) in enumerate([(1, 2), (1, 1), (2, 2), (2, 1), (4, 2), (4, 1), (8, 2), (8, 1)]):
            k = 4 if stride == 2 else 3
            h = nn.Conv(self.ch * mult, (k, k), strides=stride, padding=1, name=f"conv{i}")(h)
            h = nn.relu(bn(f"bn{i}")(h))
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.dim_bottleneck, name="linear")(h)


class AEDecoder(nn.Module):
    ch: int = 64
    nc: int = 3
    init_size: int = 4

    @nn.compact
    def __call__(self, f: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        h = nn.Dense(self.ch * 16 * self.init_size**2, name="linear")(f)
        h = h.reshape(-1, self.init_size, self.init_size, self.ch * 16)
        for i, mult in enumerate([8, 4, 2, 1]):
            # torch ConvTranspose2d(k=4,s=2,p=1) doubles H/W == flax 'SAME'
            h = nn.ConvTranspose(self.ch * mult, (4, 4), strides=(2, 2), padding="SAME", name=f"deconv{i}")(h)
            h = nn.relu(bn(f"dbn{i}")(h))
            if mult > 1:
                h = nn.Conv(self.ch * mult, (3, 3), padding=1, name=f"conv{i}")(h)
                h = nn.relu(bn(f"cbn{i}")(h))
        h = nn.Conv(self.nc, (3, 3), padding=1, name="out_conv")(h)
        return jnp.tanh(h)


class NoisyClassifier(nn.Module):
    """Timestep-aware classifier over noisy images (ADM-G classifier parity,
    `ADM_G/classifier_train.py` + `scripts/classifier_train` semantics):
    ResNet trunk with additive sinusoidal t embedding after the stem, class
    head. Feeds classifier_grad_fn for guided sampling."""

    num_classes: int
    num_blocks: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, train: bool = False):
        from ccdm_tpu.models.layers import SinusoidalPosEmb

        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="stem_conv")(x)
        h = nn.relu(bn("stem_bn")(h))
        temb = nn.Dense(64, name="t_proj")(SinusoidalPosEmb(128, name="t_emb")(t))
        h = h + temb[:, None, None, :]
        for stage, nb in enumerate(self.num_blocks):
            planes = 64 * (2**stage)
            for b in range(nb):
                stride = 2 if b == 0 else 1
                h = BasicBlock(planes, stride, name=f"stage{stage}_block{b}")(h, train)
        feat = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.num_classes, name="head")(feat)


class ResNetEval(nn.Module):
    """ResNet34 eval net; mode='class' -> [B,num_classes] logits,
    mode='regre' -> [B,1] in [0,1] via ReLU head (regre_eval.py ends ReLU)."""

    num_outputs: int
    mode: str = "class"  # class | regre
    num_blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, *,
                 leaky_head: bool = False):
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="stem_conv")(x)
        h = nn.relu(bn("stem_bn")(h))
        for stage, nb in enumerate(self.num_blocks):
            planes = 64 * (2**stage)
            for b in range(nb):
                stride = 2 if b == 0 else 1
                h = BasicBlock(planes, stride, name=f"stage{stage}_block{b}")(h, train)
        feat = jnp.mean(h, axis=(1, 2))
        out = nn.Dense(self.num_outputs, name="head")(feat)
        if self.mode == "regre":
            # leaky_head: TRAINING-only surrogate — with targets in [0,1]
            # every fixed point of the leaky objective coincides with the
            # relu objective's, but a head driven negative keeps a gradient
            # instead of dying (observed live: relu+MSE+SGD pinned the LS
            # eval net at predict-0, loss E[y^2]~=0.33). Inference uses relu.
            out = (jax.nn.leaky_relu(out, negative_slope=0.01) if leaky_head
                   else nn.relu(out))
        return out, feat
