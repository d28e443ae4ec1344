"""ILI embedding networks: ResNet34 x->(y_hat, h) and y->h / y->cov MLPs.

TPU-native re-design of `CCDM_unified/models/resnet_y2h.py:29-173` and
`resnet_y2cov.py:82-179` (mixup-style ResNet34 backbone, `x2h_res`
512->512->dim MLP with BatchNorm, `h2y` dim->1 linear+ReLU head; label MLPs
with GroupNorm(8) + ReLU, input y+1e-8). NHWC, flax.linen.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# torch nn.BatchNorm2d(momentum=0.1) == flax momentum 0.9: running stats
# converge in tens of updates. Flax's 0.99 default leaves a 0.99^n residual
# of the INIT stats — after a 40-epoch fixture run eval-mode features were
# still ~1/3 init-biased, collapsing h2y's eval output to ~0 (round 3).
_BN_MOMENTUM = 0.9


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=_BN_MOMENTUM, name=name)
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        h = bn("bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False, name="shortcut_conv")(x)
            x = bn("shortcut_bn")(x)
        return nn.relu(h + x)


class ResNetEmbed(nn.Module):
    """ResNet34 regressor: x -> (y_hat [B,label_dim], h [B,dim_embed])."""

    dim_embed: int = 128
    label_dim: int = 1
    num_blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=_BN_MOMENTUM, name=name)
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="stem_conv")(x)
        h = nn.relu(bn("stem_bn")(h))
        planes = 64
        for stage, nb in enumerate(self.num_blocks):
            planes = 64 * (2**stage)
            for b in range(nb):
                stride = 2 if b == 0 else 1  # every stage downsamples (ref :93-96)
                h = BasicBlock(planes, stride, name=f"stage{stage}_block{b}")(h, train)
        h = jnp.mean(h, axis=(1, 2))  # AdaptiveAvgPool2d(1)

        # x2h_res: 512 -> 512 -> dim_embed with BN+ReLU
        h = nn.Dense(512, name="x2h_dense1")(h)
        h = nn.relu(bn("x2h_bn1")(h))
        h = nn.Dense(self.dim_embed, name="x2h_dense2")(h)
        features = nn.relu(bn("x2h_bn2")(h))

        y_hat = nn.relu(nn.Dense(self.label_dim, name="h2y")(features))
        return y_hat, features

    def h2y_apply(self, variables, features: jax.Array) -> jax.Array:
        """Frozen h2y head on external embeddings (for MLP inversion training)."""
        p = variables["params"]["h2y"]
        return nn.relu(features @ p["kernel"] + p["bias"])


class ModelY2H(nn.Module):
    """Label MLP 1->dim->...->dim, GroupNorm(8)+ReLU (ref resnet_y2h.py:143-173)."""

    dim_embed: int = 128
    num_groups: int = 8

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        h = y.reshape(-1, 1) + 1e-8
        for i in range(4):
            h = nn.Dense(self.dim_embed, name=f"dense{i}")(h)
            h = nn.relu(nn.GroupNorm(self.num_groups, name=f"gn{i}")(h))
        h = nn.Dense(self.dim_embed, name="dense_out")(h)
        return nn.relu(h)


class ModelY2Cov(nn.Module):
    """Deeper label MLP 1->512->1024->2048->4096->cov_dim, ReLU output
    (ref resnet_y2cov.py:149-179)."""

    cov_dim: int
    num_groups: int = 8

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        h = y.reshape(-1, 1) + 1e-8
        for i, width in enumerate((512, 1024, 2048, 4096)):
            h = nn.Dense(width, name=f"dense{i}")(h)
            h = nn.relu(nn.GroupNorm(self.num_groups, name=f"gn{i}")(h))
        h = nn.Dense(self.cov_dim, name="dense_out")(h)
        return nn.relu(h)
