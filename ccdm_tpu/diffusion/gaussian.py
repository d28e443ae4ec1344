"""Gaussian diffusion: vicinal training loss + DDPM/DDIM samplers.

TPU-native re-design of `CCDM_unified/diffusion.py:109-757`:

- Training loss (`p_losses`, ref `:507-735`): q_sample with optional
  label-conditioned diagonal covariance H(y)=exp(-fn_y2cov(y)) (ref
  `:502-505, 550-557`), per-objective target, Hy-normalized MSE, SNR loss
  weighting, then hard/soft/sliced vicinal batch weighting. The CFG keep-mask
  is drawn ONCE here and passed into the network — fixing the reference's
  unified-tree mask mismatch (`models/unet.py:401`, see SURVEY.md §2.1).
- Sampling: `ddim_sample` (ref `:402-467`) and ancestral `p_sample_loop`
  (ref `:376-400`) are each ONE `jax.lax.scan` over precomputed time pairs;
  the guided prediction batches the cond and null UNet passes into a single
  2B forward (the reference runs two sequential passes per step), then applies
  `apply_cfg` (parallel-component removal, rescaled-phi, CFG++).

Everything is a pure function of (variables, rng key, inputs): EMA sampling is
just passing the EMA variables.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccdm_tpu.ops import (
    Schedule,
    make_schedule,
    q_sample,
    q_posterior,
    predict_start_from_noise,
    predict_noise_from_start,
    predict_v,
    predict_start_from_v,
    apply_cfg,
)
from ccdm_tpu.ops.image import normalize_to_neg_one_to_one, unnormalize_to_zero_to_one
from ccdm_tpu.ops.vicinal import (
    classic_batch_weights,
    random_projection_vectors,
    sliced_batch_weights,
)


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Static diffusion configuration (hashable; safe as a jit constant)."""

    image_size: int
    channels: int = 3
    timesteps: int = 1000
    sampling_timesteps: Optional[int] = None
    objective: str = "pred_noise"
    beta_schedule: str = "cosine"
    ddim_sampling_eta: float = 0.0
    cond_drop_prob: float = 0.5
    use_Hy: bool = False
    use_cfg_plus_plus: bool = False
    offset_noise_strength: float = 0.0
    min_snr_loss_weight: bool = False
    min_snr_gamma: float = 5.0
    vicinity_type: str = "shv"  # shv | ssv | hv | sv | none
    distance: str = "l2"
    vector_type: str = "gaussian"
    num_projections: int = 1
    # Cap on the y2cov log-scale (h in Hy=exp(-h)); <=0 disables (exact
    # reference semantics). See hy_from_y2cov for the rationale.
    hy_max_log: float = 4.0

    @property
    def effective_sampling_timesteps(self) -> int:
        return self.sampling_timesteps or self.timesteps


def hy_from_y2cov(h: jax.Array, max_log: float = 4.0) -> jax.Array:
    """Hy = exp(-h) with the log-scale tail capped at ``max_log``.

    The reference computes Hy = exp(-fn_y2cov(y)) with NO bound on h
    (diffusion.py:502-505) and divides the per-pixel loss by Hy
    (:581-594) — so a single runaway feature dimension in the (10-epoch,
    barely-trained) y2cov CNN multiplies that pixel's loss by exp(h).
    Measured failure (round 4, Cell-200 fixture): h_max 17.3 -> 1/Hy up to
    3e7 at a handful of pixels, mean 1/Hy 8262; the vicinal loss was
    dominated by those pixels, training destabilized (loss spikes 28-480),
    and the 50k-step teacher sampled pure noise. Capping h bounds the
    per-pixel weight at exp(max_log) (=54.6 at the default 4.0) while
    leaving the healthy regime (h ~ 0.02 mean) untouched. DOCUMENTED
    DEVIATION from the reference; set max_log <= 0 for exact reference
    semantics."""
    if max_log and max_log > 0:
        h = jnp.minimum(h, max_log)
    return jnp.exp(-h)


class GaussianDiffusion:
    """Stateless orchestrator: holds static config + schedule buffers.

    `apply_fn(variables, x, t, labels_emb, keep_mask, train, mutable=...)`
    is the flax-style denoiser entry (Unet/ViT __call__ signature).
    """

    def __init__(
        self,
        apply_fn: Callable,
        config: DiffusionConfig,
        fn_y2cov: Optional[Callable] = None,
    ):
        self.apply_fn = apply_fn
        self.config = config
        self.fn_y2cov = fn_y2cov
        if config.use_Hy and fn_y2cov is None:
            raise ValueError("use_Hy=True requires fn_y2cov")
        self.schedule: Schedule = make_schedule(
            config.timesteps,
            config.beta_schedule,
            config.objective,
            config.min_snr_loss_weight,
            config.min_snr_gamma,
        )

    # ---------------------------------------------------------------- Hy

    def convert_y_to_cov(self, labels: jax.Array) -> jax.Array:
        """H(y) = exp(-fn_y2cov(y)) reshaped NHWC (ref diffusion.py:502-505)."""
        c = self.config
        b = labels.shape[0]
        # fn_y2cov emits the reference's flat [B, C*H*W] in CHW order; keep
        # that contract and transpose to NHWC.
        cov = hy_from_y2cov(self.fn_y2cov(labels), c.hy_max_log).reshape(
            b, c.channels, c.image_size, c.image_size)
        return jnp.transpose(cov, (0, 2, 3, 1))

    # ------------------------------------------------------------- loss

    def loss(
        self,
        variables: Any,
        key: jax.Array,
        images01: jax.Array,
        labels: jax.Array,
        labels_emb: jax.Array,
        vicinal_weights: Optional[jax.Array] = None,
        kappa: float | jax.Array = 0.01,
        train: bool = True,
        aux_info: Optional[dict] = None,
    ):
        """Vicinal diffusion loss. images01 in [0,1] NHWC (the trainer feeds
        [0,1]; normalization to [-1,1] happens here, ref diffusion.py:755).

        aux_info (optional): elastic aux-regressor loss, see _elastic_aux.

        Returns (loss_scalar, updates) where updates holds mutated
        batch_stats when train=True (else {}).
        """
        c = self.config
        sched = self.schedule
        b = images01.shape[0]

        k_t, k_mask, k_noise, k_null, k_offset, k_proj = jax.random.split(key, 6)

        x_start = normalize_to_neg_one_to_one(images01)
        t = jax.random.randint(k_t, (b,), 0, c.timesteps)
        keep_mask = jax.random.uniform(k_mask, (b,)) < (1.0 - c.cond_drop_prob)
        null_mask = ~keep_mask

        noise = jax.random.normal(k_noise, x_start.shape)
        Hy = None
        if c.use_Hy:
            Hy = self.convert_y_to_cov(labels)
            # null rows keep standard-normal noise (ref :556-557)
            noise = jnp.where(keep_mask[:, None, None, None], noise * jnp.sqrt(Hy), noise)

        offset_noise = None
        if c.offset_noise_strength > 0:
            offset_noise = jax.random.normal(k_offset, (b, c.channels))
        x_t = q_sample(sched, x_start, t, noise, c.offset_noise_strength, offset_noise)

        if train:
            model_out, updates = self.apply_fn(
                variables, x_t, t, labels_emb, keep_mask, train=True, mutable=["batch_stats"]
            )
        else:
            model_out = self.apply_fn(variables, x_t, t, labels_emb, keep_mask, train=False)
            updates = {}

        if c.objective == "pred_noise":
            target = noise
        elif c.objective == "pred_x0":
            target = x_start
        else:  # pred_v
            target = predict_v(sched, x_start, t, noise)

        sq = (model_out - target) ** 2
        if c.use_Hy:
            divisor = jnp.where(keep_mask[:, None, None, None], Hy, 1.0)
            sq = sq / divisor

        per_sample = jnp.mean(sq.reshape(b, -1), axis=-1) * sched.loss_weight[t]

        if vicinal_weights is None or c.vicinity_type == "none":
            loss = jnp.mean(per_sample)
            if aux_info is not None and c.objective == "pred_noise":
                loss = loss + self._elastic_aux(x_start, t, model_out, keep_mask,
                                                labels, aux_info)
            return loss, updates

        labels2d = jnp.atleast_2d(labels.astype(jnp.float32))
        if labels2d.shape[0] == 1 and b > 1:
            labels2d = labels2d.T
        is_hard = c.vicinity_type in ("hv", "shv")
        is_sliced = c.vicinity_type in ("shv", "ssv") and labels2d.shape[1] > 1
        if is_sliced:
            vecs = random_projection_vectors(k_proj, c.vector_type, labels2d.shape[1], c.num_projections)
            w = sliced_batch_weights(labels2d, vecs, kappa, is_hard, null_mask)
        else:
            w = classic_batch_weights(labels2d, kappa, is_hard, c.distance, null_mask)

        # reference final reduction: sum(w * per_sample_pixel_SUM) / (b*chw)
        # == sum(w * per_sample_pixel_mean) / b. NOTE vicinal_weights acts as
        # a GATE only — the unified reference never multiplies its values in
        # (diffusion.py:597-733); per-sample weighted reduction is
        # weighted_loss() (the vanilla-tree semantics).
        loss = jnp.sum(w * per_sample) / b
        if aux_info is not None and c.objective == "pred_noise":
            # the reference wires the elastic loss only alongside vicinal
            # weighting (vanilla diffusion.py:444 gates on vicinal_weights)
            loss = loss + self._elastic_aux(x_start, t, model_out, keep_mask,
                                            labels, aux_info)
        return loss, updates

    def _elastic_aux(self, x_start, t, model_out, keep_mask, labels, aux_info):
        """Elastic aux-regressor loss (vanilla diffusion.py:444-471): rebuild
        x_t from the PREDICTED noise, regress labels with the frozen aux net,
        penalize |y_pred - y| only outside the vicinity radius and on
        non-null rows; active once current_step >= aux_start_step.

        aux_info: {apply: fn(x_t_hat, t) -> [B,1], lambda_aux, vicinity_radius,
        aux_start_step?, current_step?}.
        """
        x_t_hat = q_sample(self.schedule, x_start, t, model_out)
        y_pred = aux_info["apply"](x_t_hat, t).reshape(-1)
        labels_gt = jnp.atleast_2d(labels.astype(jnp.float32))
        if labels_gt.shape[0] == 1 and x_start.shape[0] > 1:
            labels_gt = labels_gt.T
        err = jnp.abs(y_pred - labels_gt[:, 0])
        aux_w = keep_mask.astype(jnp.float32) * (err > aux_info["vicinity_radius"])
        n_nonzero = jnp.maximum(jnp.sum(aux_w), 1.0)
        term = aux_info["lambda_aux"] * jnp.sum(aux_w * err) / n_nonzero
        step = aux_info.get("current_step")
        if step is not None:
            term = jnp.where(step >= aux_info.get("aux_start_step", 0), term, 0.0)
        return term

    def weighted_loss(
        self,
        variables: Any,
        key: jax.Array,
        images01: jax.Array,
        labels: jax.Array,
        labels_emb: jax.Array,
        weights: jax.Array,
        train: bool = True,
        aux_info: Optional[dict] = None,
    ):
        """Vanilla-tree loss reduction: precomputed per-sample vicinal weights
        applied directly (no intra-batch pairwise weighting), null-CFG rows
        forced to weight 1 (`CCDM_vanilla/.../diffusion.py:388-436`).

        aux_info (optional, vanilla `:444-471` elastic loss): see
        _elastic_aux; only active for pred_noise (the reference gates on it).
        """
        c = self.config
        sched = self.schedule
        b = images01.shape[0]
        k_t, k_mask, k_noise = jax.random.split(key, 3)

        x_start = normalize_to_neg_one_to_one(images01)
        t = jax.random.randint(k_t, (b,), 0, c.timesteps)
        keep_mask = jax.random.uniform(k_mask, (b,)) < (1.0 - c.cond_drop_prob)

        noise = jax.random.normal(k_noise, x_start.shape)
        Hy = None
        if c.use_Hy:
            Hy = self.convert_y_to_cov(labels)
            noise = jnp.where(keep_mask[:, None, None, None], noise * jnp.sqrt(Hy), noise)
        x_t = q_sample(sched, x_start, t, noise)

        if train:
            model_out, updates = self.apply_fn(
                variables, x_t, t, labels_emb, keep_mask, train=True, mutable=["batch_stats"]
            )
        else:
            model_out = self.apply_fn(variables, x_t, t, labels_emb, keep_mask, train=False)
            updates = {}

        if c.objective == "pred_noise":
            target = noise
        elif c.objective == "pred_x0":
            target = x_start
        else:
            target = predict_v(sched, x_start, t, noise)

        sq = (model_out - target) ** 2
        if c.use_Hy:
            sq = sq / jnp.where(keep_mask[:, None, None, None], Hy, 1.0)
        per_sample = jnp.mean(sq.reshape(b, -1), axis=-1) * sched.loss_weight[t]
        w = jnp.where(keep_mask, weights, 1.0)
        loss = jnp.sum(w * per_sample) / b

        if aux_info is not None and c.objective == "pred_noise":
            loss = loss + self._elastic_aux(x_start, t, model_out, keep_mask,
                                            labels, aux_info)

        return loss, updates

    # --------------------------------------------------- guided prediction

    def model_predictions(
        self,
        variables: Any,
        x: jax.Array,
        t: jax.Array,
        labels_emb: jax.Array,
        cond_scale: float = 6.0,
        rescaled_phi: float = 0.7,
        clip_x_start: bool = False,
    ):
        """(pred_noise, x_start) with classifier-free guidance.

        cond+null batched as one 2B forward when cond_scale != 1
        (ref models/unet.py:350-380 runs them sequentially). A traced
        cond_scale (jnp scalar) always takes the 2B path.
        """
        c = self.config
        sched = self.schedule
        b = x.shape[0]

        if isinstance(cond_scale, (int, float)) and float(cond_scale) == 1.0:
            out = self.apply_fn(
                variables, x, t, labels_emb, jnp.ones((b,), dtype=bool), train=False
            )
            guided, null_out = out, out
        else:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            e2 = jnp.concatenate([labels_emb, labels_emb], axis=0)
            keep2 = jnp.concatenate(
                [jnp.ones((b,), dtype=bool), jnp.zeros((b,), dtype=bool)], axis=0
            )
            out2 = self.apply_fn(variables, x2, t2, e2, keep2, train=False)
            logits, null_logits = out2[:b], out2[b:]
            guided, null_out = apply_cfg(logits, null_logits, cond_scale, rescaled_phi)

        maybe_clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)

        if c.objective == "pred_noise":
            pred_noise = guided if not c.use_cfg_plus_plus else null_out
            x_start = maybe_clip(predict_start_from_noise(sched, x, t, guided))
        elif c.objective == "pred_x0":
            x_start = maybe_clip(guided)
            x_for_noise = x_start if not c.use_cfg_plus_plus else maybe_clip(null_out)
            pred_noise = predict_noise_from_start(sched, x, t, x_for_noise)
        else:  # pred_v
            x_start = maybe_clip(predict_start_from_v(sched, x, t, guided))
            x_for_noise = x_start
            if c.use_cfg_plus_plus:
                x_for_noise = maybe_clip(predict_start_from_v(sched, x, t, null_out))
            pred_noise = predict_noise_from_start(sched, x, t, x_for_noise)

        return pred_noise, x_start

    # ------------------------------------------------------------ sampling

    def _init_noise(self, key: jax.Array, shape, labels: Optional[jax.Array]):
        noise = jax.random.normal(key, shape)
        if self.config.use_Hy and labels is not None:
            noise = noise * jnp.sqrt(self.convert_y_to_cov(labels))
        return noise

    def ddim_sample(
        self,
        variables: Any,
        key: jax.Array,
        labels_emb: jax.Array,
        labels: Optional[jax.Array] = None,
        cond_scale: float = 6.0,
        rescaled_phi: float = 0.7,
        clip_denoised: bool = True,
        sampling_timesteps: Optional[int] = None,
        ddim_eta: Optional[float] = None,
        save_intermediate: bool = False,
    ) -> jax.Array:
        """DDIM sampler as one lax.scan over (t, t_next) pairs.

        Returns images in [0,1] NHWC — or, with save_intermediate, the
        [S, B, H, W, C] trajectory of intermediate states (the vanilla tree's
        GIF-frame mode, `CCDM_vanilla/.../diffusion.py:283-362`,
        `trainer.py:421-458`). Semantics of ref diffusion.py:402-467 incl.
        the call-time sampling_timesteps / eta overrides.
        """
        c = self.config
        sched = self.schedule
        b = labels_emb.shape[0]
        shape = (b, c.image_size, c.image_size, c.channels)
        S = sampling_timesteps or c.effective_sampling_timesteps
        eta = c.ddim_sampling_eta if ddim_eta is None else ddim_eta

        times = np.linspace(-1, c.timesteps - 1, S + 1).astype(np.int64)
        times = list(reversed(times.tolist()))
        pairs = np.array(list(zip(times[:-1], times[1:])), dtype=np.int32)  # [S, 2]

        k_init, k_scan = jax.random.split(key)
        img0 = self._init_noise(k_init, shape, labels)

        def step(img, pair_and_key):
            pair, k = pair_and_key
            time, time_next = pair[0], pair[1]
            t_cond = jnp.full((b,), time, dtype=jnp.int32)
            pred_noise, x_start = self.model_predictions(
                variables, img, t_cond, labels_emb, cond_scale, rescaled_phi,
                clip_x_start=clip_denoised,
            )
            alpha = sched.alphas_cumprod[time]
            alpha_next = jnp.where(time_next < 0, 1.0, sched.alphas_cumprod[time_next])
            if eta == 0.0:
                # deterministic DDIM: statically skip the sigma term AND the
                # per-step threefry noise generation (250 fewer PRNG kernels)
                coef = jnp.sqrt(jnp.maximum(1 - alpha_next, 0.0))
                img_next = x_start * jnp.sqrt(alpha_next) + coef * pred_noise
            else:
                sigma = eta * jnp.sqrt(
                    jnp.maximum((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0)
                )
                coef = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma**2, 0.0))
                noise = jax.random.normal(k, img.shape)
                img_next = x_start * jnp.sqrt(alpha_next) + coef * pred_noise + sigma * noise
            img_next = jnp.where(time_next < 0, x_start, img_next)
            return img_next, (img_next if save_intermediate else None)

        keys = jax.random.split(k_scan, len(pairs))
        img, frames = jax.lax.scan(step, img0, (jnp.asarray(pairs), keys))
        if save_intermediate:
            return unnormalize_to_zero_to_one(frames)
        return unnormalize_to_zero_to_one(img)

    def p_sample_loop(
        self,
        variables: Any,
        key: jax.Array,
        labels_emb: jax.Array,
        labels: Optional[jax.Array] = None,
        cond_scale: float = 6.0,
        rescaled_phi: float = 0.7,
        clip_denoised: bool = True,
        sampling_timesteps: Optional[int] = None,
    ) -> jax.Array:
        """Ancestral DDPM sampler as one lax.scan (ref diffusion.py:338-400).

        Note: like the reference, this iterates reversed(range(S)) against the
        FULL schedule buffers, so S < T is not a respaced schedule — callers
        wanting fewer steps use ddim_sample (the reference behaves
        identically; its `sample()` always takes the ancestral path,
        diffusion.py:476-477).
        """
        c = self.config
        sched = self.schedule
        b = labels_emb.shape[0]
        shape = (b, c.image_size, c.image_size, c.channels)
        S = sampling_timesteps or c.effective_sampling_timesteps

        k_init, k_scan = jax.random.split(key)
        img0 = self._init_noise(k_init, shape, labels)

        def step(img, t_and_key):
            t_scalar, k = t_and_key
            t_cond = jnp.full((b,), t_scalar, dtype=jnp.int32)
            _, x_start = self.model_predictions(
                variables, img, t_cond, labels_emb, cond_scale, rescaled_phi,
                clip_x_start=False,
            )
            if clip_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            mean, _, log_var = q_posterior(sched, x_start, img, t_cond)
            noise = jax.random.normal(k, img.shape)
            noise = jnp.where(t_scalar > 0, noise, 0.0)
            return mean + jnp.exp(0.5 * log_var) * noise, None

        ts = jnp.arange(S - 1, -1, -1, dtype=jnp.int32)
        keys = jax.random.split(k_scan, S)
        img, _ = jax.lax.scan(step, img0, (ts, keys))
        return unnormalize_to_zero_to_one(img)

    def sample(self, variables, key, labels_emb, labels=None, cond_scale=6.0,
               rescaled_phi=0.7, **kwargs):
        """Reference `sample()` (diffusion.py:469-484) always routes to the
        ancestral loop; kept for API parity."""
        return self.p_sample_loop(
            variables, key, labels_emb, labels, cond_scale, rescaled_phi, **kwargs
        )

    def interpolate(
        self,
        variables: Any,
        key: jax.Array,
        x1: jax.Array,
        x2: jax.Array,
        labels_emb: jax.Array,
        t: Optional[int] = None,
        lam: float = 0.5,
        cond_scale: float = 1.0,
    ) -> jax.Array:
        """Latent blending (vanilla diffusion.py:369-383): diffuse both inputs
        to step t, lerp, then run the ancestral chain down from t.

        Deviation: the reference's `p_sample(img, i)` call omits the classes
        argument its own signature requires (a latent defect); labels_emb is
        mandatory here. x1/x2 in [-1,1] NHWC; returns [-1,1].
        """
        c = self.config
        sched = self.schedule
        b = x1.shape[0]
        t = c.timesteps - 1 if t is None else t
        k1, k2, k_scan = jax.random.split(key, 3)
        tb = jnp.full((b,), t, dtype=jnp.int32)
        xt1 = q_sample(sched, x1, tb, jax.random.normal(k1, x1.shape))
        xt2 = q_sample(sched, x2, tb, jax.random.normal(k2, x2.shape))
        img0 = (1.0 - lam) * xt1 + lam * xt2

        def step(img, t_and_key):
            t_scalar, k = t_and_key
            t_cond = jnp.full((b,), t_scalar, dtype=jnp.int32)
            _, x_start = self.model_predictions(
                variables, img, t_cond, labels_emb, cond_scale, 0.0,
            )
            x_start = jnp.clip(x_start, -1.0, 1.0)
            mean, _, log_var = q_posterior(sched, x_start, img, t_cond)
            noise = jnp.where(t_scalar > 0, jax.random.normal(k, img.shape), 0.0)
            return mean + jnp.exp(0.5 * log_var) * noise, None

        ts = jnp.arange(t - 1, -1, -1, dtype=jnp.int32)
        keys = jax.random.split(k_scan, t)
        img, _ = jax.lax.scan(step, img0, (ts, keys))
        return img
