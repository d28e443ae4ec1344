"""Class-conditional GAN losses: ReACGAN (D2D-CE) and ADCGAN (ADC).

TPU-native coverage of the StudioGAN baselines' distinctive machinery
(SURVEY.md §2.3-B5 — capability checklist): the two conditional losses the
reference's `worker.py` trains RC-49/Cell-200 class-conditional baselines
with, reusing our SNGAN/SAGAN backbones and binned labels
(ccdm_tpu.diffusion.guided.bin_labels). The vendored SyncBN the reference
needs for multi-GPU BN is irrelevant here: BatchNorm stats are global under
pjit (one mesh axis), see ccdm_tpu/models/sngan.py.

- D2D-CE (ReACGAN): data-to-data cross-entropy on an embedding head —
  cosine similarities between sample embeddings and class proxies, with
  easy-positive / easy-negative margin clamping.
- ADC (ADCGAN): a 2K-way auxiliary classifier over (class, real/fake);
  D maximizes log p(c+, real) for reals and log p(c-, fake) for fakes;
  G maximizes log p(c+, real) - log p(c-, fake).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class D2DCEHead(nn.Module):
    """ReACGAN embedding head: feature -> unit embedding + class proxies."""

    embed_dim: int
    num_classes: int

    @nn.compact
    def __call__(self, features: jax.Array):
        emb = nn.Dense(self.embed_dim, name="embed")(features)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        proxies = self.param("proxies", nn.initializers.normal(0.02),
                             (self.num_classes, self.embed_dim))
        proxies = proxies / (jnp.linalg.norm(proxies, axis=-1, keepdims=True) + 1e-12)
        return emb, proxies


def d2d_ce_loss(emb: jax.Array, proxies: jax.Array, labels: jax.Array,
                temperature: float = 0.5, m_p: float = 0.98, m_n: float = 1.0) -> jax.Array:
    """Data-to-data cross-entropy (ReACGAN): positives are sample-proxy
    similarities (clamped at margin m_p), negatives are same-batch
    DIFFERENT-class sample similarities (clamped at m_n == no clamp default).
    """
    b = emb.shape[0]
    sim_proxy = jnp.sum(emb * proxies[labels], axis=-1)  # [B]
    pos = jnp.minimum(sim_proxy, m_p) / temperature
    sim_data = emb @ emb.T  # [B, B]
    neg_mask = labels[:, None] != labels[None, :]
    neg = jnp.maximum(sim_data, -m_n) / temperature
    neg = jnp.where(neg_mask, neg, -jnp.inf)
    # log softmax over {pos} U {negatives}
    all_logits = jnp.concatenate([pos[:, None], neg], axis=1)
    logz = jax.nn.logsumexp(all_logits, axis=1)
    return jnp.mean(logz - pos)


class ADCHead(nn.Module):
    """ADCGAN auxiliary classifier: features -> 2*num_classes logits
    (class x {real, fake})."""

    num_classes: int

    @nn.compact
    def __call__(self, features: jax.Array) -> jax.Array:
        return nn.Dense(2 * self.num_classes, name="adc")(features)


def adc_d_loss(logits_real: jax.Array, logits_fake: jax.Array,
               labels_real: jax.Array, labels_fake: jax.Array,
               num_classes: int) -> jax.Array:
    """D: classify reals as (c, real)=2c and fakes as (c, fake)=2c+1."""
    import optax

    return (
        jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits_real, 2 * labels_real))
        + jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits_fake, 2 * labels_fake + 1))
    )


def adc_g_loss(logits_fake: jax.Array, labels_fake: jax.Array,
               num_classes: int) -> jax.Array:
    """G: push fakes toward (c, real) and away from (c, fake)."""
    import optax

    return (
        jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits_fake, 2 * labels_fake))
        - jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits_fake, 2 * labels_fake + 1))
    )
