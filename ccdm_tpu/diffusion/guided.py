"""Classifier-guided sampling (ADM-G parity) + class-conditional CFG helper.

TPU-native re-design of the class-conditional baselines (SURVEY.md §2.3):
- B3 ADM-G (`classifier_sample.py` / `gaussian_diffusion.py` cond_fn path):
  ancestral sampling where the posterior mean is shifted by
  guidance_scale * variance * grad_x log p(y|x_t); the classifier gradient
  comes from jax.grad of the eval classifier's log-softmax — no fp16
  master-param machinery needed on TPU.
- B4 CFG (`classifier_free_guidance.py`): conditional diffusion on BINNED
  labels; `make_fn_class_embed` maps integer classes to a fixed embedding
  table so the standard GaussianDiffusion CFG machinery runs unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ccdm_tpu.diffusion.gaussian import GaussianDiffusion
from ccdm_tpu.ops.image import unnormalize_to_zero_to_one
from ccdm_tpu.ops.schedule import q_posterior


def make_fn_class_embed(num_classes: int, dim: int = 128, seed: int = 7) -> Callable:
    """Integer classes [B] -> [B, dim] via a fixed N(0,1) embedding table
    (the lucidrains CFG baseline uses a learned nn.Embedding; fixed-seed
    table here keeps the fn pure — swap in trained params if desired)."""
    table = jax.random.normal(jax.random.PRNGKey(seed), (num_classes, dim))

    def fn(classes: jax.Array) -> jax.Array:
        return table[jnp.asarray(classes, jnp.int32).reshape(-1)]

    return fn


def classifier_grad_fn(classifier_apply: Callable, classifier_variables: Any,
                       takes_t: bool = False) -> Callable:
    """cond_fn(x_t, t, y) -> grad_x log softmax(classifier(x_t[, t]))[y].

    Matches ADM-G's cond_fn (classifier_sample.py:54-61). Pass takes_t=True
    with a NoisyClassifier (trained on q_sample'd images,
    eval/train_backbones.train_noisy_classifier) for exact ADM-G parity;
    takes_t=False works with the clean-image ResNetEval classifier."""

    def cond_fn(x: jax.Array, t: jax.Array, y: jax.Array) -> jax.Array:
        def logp(xi):
            if takes_t:
                out = classifier_apply(classifier_variables, xi, t, train=False)
            else:
                out = classifier_apply(classifier_variables, xi, train=False)
            logits = out[0] if isinstance(out, tuple) else out
            lsm = jax.nn.log_softmax(logits, axis=-1)
            return jnp.sum(jnp.take_along_axis(lsm, y[:, None], axis=1))

        return jax.grad(logp)(x)

    return cond_fn


def classifier_guided_sample(
    diffusion: GaussianDiffusion,
    variables: Any,
    key: jax.Array,
    labels_emb: jax.Array,
    classes: jax.Array,
    cond_fn: Callable,
    guidance_scale: float = 1.0,
    sampling_timesteps: Optional[int] = None,
    clip_denoised: bool = True,
) -> jax.Array:
    """Ancestral sampling with classifier guidance:
    mean' = mean + s * posterior_variance * grad log p(y|x_t)
    (ADM-G gaussian_diffusion.py condition_mean semantics). Returns [0,1]."""
    c = diffusion.config
    sched = diffusion.schedule
    b = labels_emb.shape[0]
    shape = (b, c.image_size, c.image_size, c.channels)
    S = sampling_timesteps or c.effective_sampling_timesteps

    k_init, k_scan = jax.random.split(key)
    img0 = jax.random.normal(k_init, shape)

    def step(img, t_and_key):
        t_scalar, k = t_and_key
        t_cond = jnp.full((b,), t_scalar, dtype=jnp.int32)
        _, x_start = diffusion.model_predictions(
            variables, img, t_cond, labels_emb, cond_scale=1.0,
        )
        if clip_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        mean, var, log_var = q_posterior(sched, x_start, img, t_cond)
        grad = cond_fn(img, t_cond, classes)
        mean = mean + guidance_scale * var * grad
        noise = jnp.where(t_scalar > 0, jax.random.normal(k, img.shape), 0.0)
        return mean + jnp.exp(0.5 * log_var) * noise, None

    ts = jnp.arange(S - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(k_scan, S)
    img, _ = jax.lax.scan(step, img0, (ts, keys))
    return unnormalize_to_zero_to_one(img)


def bin_labels(labels_raw, num_classes: int, label_min: float, label_max: float):
    """Continuous labels -> integer bins (the class-conditional baselines'
    CCGM approximation, e.g. RC-49 yaw -> 49 classes)."""
    import numpy as np

    lab = np.asarray(labels_raw, float)
    edges = np.linspace(label_min, label_max, num_classes + 1)
    return np.clip(np.digitize(lab, edges[1:-1]), 0, num_classes - 1)
