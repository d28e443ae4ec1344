"""Conditional UNet denoiser (flax, NHWC).

TPU-native re-design of the unified-tree UNet (`CCDM_unified/models/unet.py:
244-455`): init 7x7 conv -> per-resolution [ResnetBlock x2 + linear-attention
residual + downsample] -> mid [ResnetBlock, full attention, ResnetBlock] ->
mirrored up path with skip concats -> final ResnetBlock over concat(x, r) ->
1x1 out conv. Conditioning: sinusoidal time MLP (dim*4) and a label-embedding
MLP pair (cond_mlp_1/2 with BatchNorm, `unet.py:298-312`) merged per-ResBlock
via FiLM; CFG through a trainable null embedding initialized -|N(0,1)|.

Deliberate deviation from the reference (documented in SURVEY.md §2.1): the
CFG keep-mask is an explicit argument resolved ONCE by the caller and shared
with the loss-side null handling — the reference's unified tree silently
ignores the trainer-supplied mask (`unet.py:401`), making the loss's null_indx
disagree with the mask actually applied; the vanilla tree's
return-mask-from-the-UNet semantics (`CCDM_vanilla/.../models/unet.py:327-380`)
is what this reproduces.

CFG sampling does NOT use a forward_with_cond_scale double pass here: the
sampler batches cond+null into one 2B forward (ccdm_tpu/diffusion/sampling.py)
and applies ccdm_tpu.ops.guidance.apply_cfg — half the kernel launches of the
reference's two sequential passes per DDIM step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccdm_tpu.models.layers import (
    Attention,
    Downsample,
    FusedLinearAttentionBlock,
    FusedResnetBlock,
    PreNormResidual,
    SinusoidalPosEmb,
    Upsample,
    null_cond_init,
)


class Unet(nn.Module):
    dim: int
    embed_input_dim: int = 128
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    in_channels: int = 3
    out_dim: Optional[int] = None
    learned_variance: bool = False
    attn_heads: int = 4
    attn_dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @property
    def output_channels(self) -> int:
        if self.out_dim is not None:
            return self.out_dim
        return self.in_channels * (2 if self.learned_variance else 1)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        labels_emb: jax.Array,
        keep_mask: Optional[jax.Array] = None,
        train: bool = False,
        return_bottleneck: bool = False,
    ) -> jax.Array:
        """x: [B,H,W,Cin]; t: [B] int; labels_emb: [B, embed_input_dim];
        keep_mask: [B] bool, False rows get the null condition (None = keep all).
        """
        dim = self.dim
        time_dim = dim * 4
        cond_emb_dim = dim * 4
        norm = lambda name: nn.BatchNorm(use_running_average=not train, name=name, dtype=jnp.float32)

        # condition pathway (cond_mlp_1 -> null substitution -> cond_mlp_2)
        c = nn.Dense(dim, name="cond_dense_1")(labels_emb)
        c = nn.relu(norm("cond_bn_1")(c))
        null_emb = self.param("null_cond_emb", null_cond_init, (dim,))
        if keep_mask is not None:
            c = jnp.where(keep_mask[:, None], c, null_emb[None, :].astype(c.dtype))
        c_emb = nn.Dense(cond_emb_dim, name="cond_dense_2")(c)
        c_emb = nn.relu(norm("cond_bn_2")(c_emb))

        # time pathway
        t_emb = SinusoidalPosEmb(dim, name="sinu_pos_emb")(t)
        t_emb = nn.Dense(time_dim, name="time_dense_1")(t_emb)
        t_emb = nn.Dense(time_dim, name="time_dense_2")(nn.gelu(t_emb))

        t_emb = t_emb.astype(self.dtype)
        c_emb = c_emb.astype(self.dtype)
        x = x.astype(self.dtype)

        # unet trunk
        dims = [dim] + [dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        x = nn.Conv(dim, (7, 7), padding=3, name="init_conv", dtype=self.dtype)(x)
        r = x

        skips = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = FusedResnetBlock(dim_in, dtype=self.dtype, name=f"down_{ind}_block1")(x, t_emb, c_emb)
            skips.append(x)
            x = FusedResnetBlock(dim_in, dtype=self.dtype, name=f"down_{ind}_block2")(x, t_emb, c_emb)
            x = FusedLinearAttentionBlock(
                dim_in, self.attn_heads, self.attn_dim_head, dtype=self.dtype,
                name=f"down_{ind}_attn",
            )(x)
            skips.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=self.dtype, name=f"down_{ind}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, name=f"down_{ind}_conv", dtype=self.dtype)(x)

        mid_dim = dims[-1]
        x = FusedResnetBlock(mid_dim, dtype=self.dtype, name="mid_block1")(x, t_emb, c_emb)
        if return_bottleneck:
            return x
        x = PreNormResidual(
            mid_dim,
            Attention(mid_dim, self.attn_heads, self.attn_dim_head, dtype=self.dtype, name="mid_attn_inner"),
            name="mid_attn",
        )(x)
        x = FusedResnetBlock(mid_dim, dtype=self.dtype, name="mid_block2")(x, t_emb, c_emb)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_res - 1
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = FusedResnetBlock(dim_out, dtype=self.dtype, name=f"up_{ind}_block1")(x, t_emb, c_emb)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = FusedResnetBlock(dim_out, dtype=self.dtype, name=f"up_{ind}_block2")(x, t_emb, c_emb)
            x = FusedLinearAttentionBlock(
                dim_out, self.attn_heads, self.attn_dim_head, dtype=self.dtype,
                name=f"up_{ind}_attn",
            )(x)
            if not is_last:
                x = Upsample(dim_in, dtype=self.dtype, name=f"up_{ind}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1, name=f"up_{ind}_conv", dtype=self.dtype)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = FusedResnetBlock(dim, dtype=self.dtype, name="final_res_block")(x, t_emb, c_emb)
        out = nn.Conv(self.output_channels, (1, 1), name="final_conv", dtype=jnp.float32)(x)
        return out.astype(jnp.float32)
