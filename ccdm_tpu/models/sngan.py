"""SNGAN generator/discriminator with projection conditioning (flax, NHWC).

TPU-native re-design of `CCDM_unified/models/sngan.py:19-277`:
- Generator: dense z -> init_size^2 map, 4 (or 5 at 128/192) upsampling
  ResBlocks with ConditionalBatchNorm (gamma/beta from the 128-d label
  embedding, out + out*gamma + beta), final BN+ReLU+conv3x3+tanh.
- Discriminator: spectral-norm ResBlocks (power iteration via
  flax.linen.SpectralNorm, state in 'batch_stats'), projection head
  sum(phi(x) * W y) + linear(phi(x)).

BatchNorm statistics are global-batch under pjit (XLA inserts the
cross-replica mean automatically) — the one-line answer to StudioGAN's
500-line SyncBN (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccdm_tpu.models.layers import upsample_nearest_2x


class ConditionalBatchNorm(nn.Module):
    """BN(affine=False) modulated by label embedding (sngan.py:19-35)."""

    features: int
    # torch nn.BatchNorm2d default momentum=0.1 == flax momentum 0.9
    # (ref sngan.py:23 uses the default): without this the running stats
    # lag ~10x behind the conditional gammas/betas and eval-mode forwards
    # diverge from the train-mode outputs the discriminator was shown.
    # SAGAN overrides with 0.999 (ref sagan.py:93 momentum=0.001).
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, train: bool) -> jax.Array:
        out = nn.BatchNorm(
            use_running_average=not train, use_bias=False, use_scale=False,
            momentum=self.momentum, name="bn"
        )(x)
        gamma = nn.Dense(self.features, use_bias=False, name="embed_gamma")(y)
        beta = nn.Dense(self.features, use_bias=False, name="embed_beta")(y)
        return out + out * gamma[:, None, None, :] + beta[:, None, None, :]


def _xavier(scale: float = 1.0):
    # xavier_uniform with gain (reference uses gain sqrt(2) on conv weights)
    return nn.initializers.variance_scaling(scale**2, "fan_avg", "uniform")


class GenResBlock(nn.Module):
    """Conditional upsampling generator block (sngan.py:38-84)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, y: Optional[jax.Array], train: bool) -> jax.Array:
        h = ConditionalBatchNorm(x.shape[-1], name="condbn1")(x, y, train)
        h = upsample_nearest_2x(nn.relu(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, kernel_init=_xavier(2**0.5), name="conv1")(h)
        h = ConditionalBatchNorm(self.out_channels, name="condbn2")(h, y, train)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, kernel_init=_xavier(2**0.5), name="conv2")(nn.relu(h))
        bypass = nn.Conv(self.out_channels, (1, 1), kernel_init=_xavier(1.0), name="bypass_conv")(
            upsample_nearest_2x(x)
        )
        return h + bypass


class SNGANGenerator(nn.Module):
    dim_z: int = 128
    dim_embed: int = 128
    nc: int = 3
    img_size: int = 64
    gene_ch: int = 32
    ch_multi: Sequence[int] = (16, 8, 4, 2, 1)

    @nn.compact
    def __call__(self, z: jax.Array, y: jax.Array, train: bool = False) -> jax.Array:
        assert self.img_size in (64, 128, 192)
        init_size = 6 if self.img_size == 192 else 4
        m = self.ch_multi
        h = nn.Dense(init_size * init_size * self.gene_ch * m[0],
                     kernel_init=_xavier(1.0), name="dense")(z)
        h = h.reshape(-1, init_size, init_size, self.gene_ch * m[0])
        n_blocks = 5 if self.img_size in (128, 192) else 4
        widths = [self.gene_ch * m[i + 1] for i in range(4)] + [self.gene_ch]
        for i in range(n_blocks):
            h = GenResBlock(widths[i], name=f"genblock{i}")(h, y, train)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="final_bn")(h)
        h = nn.Conv(self.nc, (3, 3), padding=1, kernel_init=_xavier(1.0), name="final_conv")(nn.relu(h))
        return jnp.tanh(h)


class _SNConv(nn.Module):
    """Spectral-normalized conv (power-iteration state in 'batch_stats')."""

    features: int
    kernel: tuple = (3, 3)
    gain: float = 2**0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        conv = nn.Conv(self.features, self.kernel,
                       padding=(self.kernel[0] - 1) // 2,
                       kernel_init=_xavier(self.gain), name="conv")
        return nn.SpectralNorm(conv)(x, update_stats=train)


def _avgpool2(x: jax.Array) -> jax.Array:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DiscResBlock(nn.Module):
    out_channels: int
    stride: int = 1
    first: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.first:
            # no ReLU on raw pixels (sngan.py:189-214)
            h = _SNConv(self.out_channels, name="conv1")(x, train)
            h = _SNConv(self.out_channels, name="conv2")(nn.relu(h), train)
            h = _avgpool2(h)
            bypass = _SNConv(self.out_channels, (1, 1), 1.0, name="bypass_conv")(_avgpool2(x), train)
        else:
            h = _SNConv(self.out_channels, name="conv1")(nn.relu(x), train)
            h = _SNConv(self.out_channels, name="conv2")(nn.relu(h), train)
            if self.stride != 1:
                h = _avgpool2(h)
            bypass = _SNConv(self.out_channels, (1, 1), 1.0, name="bypass_conv")(x, train)
            if self.stride != 1:
                bypass = _avgpool2(bypass)
        return h + bypass


class SNGANDiscriminator(nn.Module):
    dim_embed: int = 128
    nc: int = 3
    img_size: int = 64
    disc_ch: int = 32
    ch_multi: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, train: bool = False,
                 return_features: bool = False):
        assert self.img_size in (64, 128, 192)
        init_size = 6 if self.img_size == 192 else 4
        m = self.ch_multi or ((1, 2, 4, 8, 16) if self.img_size == 64 else (1, 2, 2, 4, 8, 16))
        c = self.disc_ch

        h = DiscResBlock(c * m[0], stride=2, first=True, name="block0")(x, train)
        h = DiscResBlock(c * m[1], stride=2, name="block1")(h, train)
        h = DiscResBlock(c * m[2], stride=2, name="block2")(h, train)
        h = DiscResBlock(c * m[3], stride=2, name="block3")(h, train)
        if self.img_size == 64:
            h = DiscResBlock(c * m[4], stride=1, name="block4")(h, train)
        else:
            h = DiscResBlock(c * m[4], stride=2, name="block4")(h, train)
            h = DiscResBlock(c * m[5], stride=1, name="block5")(h, train)
        h = nn.relu(h)

        feat_dim = c * m[-1] * init_size * init_size
        # NCHW-order flatten to mirror the reference's projection layout
        phi = jnp.transpose(h, (0, 3, 1, 2)).reshape(-1, feat_dim)
        lin1 = nn.SpectralNorm(nn.Dense(1, kernel_init=_xavier(1.0), name="linear1"))
        lin2 = nn.SpectralNorm(nn.Dense(feat_dim, use_bias=False, kernel_init=_xavier(1.0), name="linear2"))
        out = lin1(phi, update_stats=train)[:, 0]
        out_y = jnp.sum(phi * lin2(y, update_stats=train), axis=1)
        if return_features:
            # feature tap for the StudioGAN-style conditional heads
            # (ReACGAN D2D-CE / ADCGAN operate on the pre-projection phi)
            return out + out_y, phi
        return out + out_y
