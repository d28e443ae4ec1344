"""Diffusion Trainer: pjit train step with device-resident vicinity batching.

TPU-native re-design of `CCDM_unified/trainer.py:43-871`. The reference's
step = host numpy label draws + per-sample Python vicinity loops + H2D copy +
DataParallel forward + NCCL allreduce. Here the ENTIRE step — target-label
sampling, vicinity selection, image gather + augmentation, label embedding,
vicinal loss, grads, clip, Adam, EMA — is one jitted function over a `data`
mesh; the training images stay resident in HBM as uint8.

Fidelity modes (the two trees disagree; both supported, SURVEY.md §2.2):
- `condition_on_target=False`, `vicinal_mode="batch"` (default, unified
  semantics `trainer.py:598-626`): condition on the REAL labels of selected
  images; p_losses computes intra-batch pairwise weights.
- `condition_on_target=True`, `vicinal_mode="target"` (vanilla semantics
  `CCDM_vanilla/.../trainer.py:273-287`): condition on the noised TARGET
  labels; weights are per-sample exp(-d^2/kappa^2) (soft) or indicator
  (hard) between real and target labels, applied directly.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ccdm_tpu.diffusion import GaussianDiffusion
from ccdm_tpu.ops.image import augment_for_dataset, normalize_images, to_uint8
from ccdm_tpu.ops.vicinal import hard_weights_from_targets, soft_weights_from_targets
from ccdm_tpu.parallel import constrain_batch, create_mesh, replicated
from ccdm_tpu.training.hyperparams import compute_vicinal_hyperparams
from ccdm_tpu.training.state import (
    EmaConfig,
    TrainState,
    create_train_state,
    ema_update,
    ema_variables,
    online_variables,
    precast_sampling_params,
)
from ccdm_tpu.training.vicinity import (
    sample_target_labels,
    select_vicinity_indices,
    select_vicinity_indices_sliced,
)
from ccdm_tpu.utils.ckpt import load_checkpoint, save_checkpoint
from ccdm_tpu.utils.logging import StepTimer, TrainLogger
from ccdm_tpu.utils.viz import save_image_grid


@dataclasses.dataclass
class TrainerConfig:
    data_name: str = "synthetic"
    train_batch_size: int = 16
    gradient_accumulate_every: int = 1
    train_lr: float = 1e-4
    train_num_steps: int = 100000
    ema_update_after_step: int = 100
    ema_update_every: int = 10
    ema_decay: float = 0.995
    adam_betas: Tuple[float, float] = (0.9, 0.99)
    sample_every: int = 1000
    save_every: int = 1000
    results_folder: str = "./results"
    max_grad_norm: float = 1.0
    # vicinal machinery
    vicinity_type: str = "shv"  # shv | ssv | hv | sv | none
    kappa: Optional[float] = None  # >0 exact radius; <=0/None -> policy (|kappa| multiplies max gap)
    kernel_sigma: Optional[float] = None
    nonzero_soft_weight_threshold: float = 1e-3
    vector_type: str = "gaussian"
    num_projections: int = 1
    distance: str = "l2"
    hyperparameter: str = "rule_of_thumb"
    percentile: float = 5.0
    # fidelity modes (see module docstring)
    condition_on_target: bool = False
    vicinal_mode: str = "batch"  # batch | target
    adaptive_slicing: bool = False  # per-batch sigma/kappa (ref trainer.py:254-306)
    # visualization
    y_visual: Optional[np.ndarray] = None
    nrow_visual: int = 6
    cond_scale_visual: float = 1.5
    sample_timesteps_visual: Optional[int] = None
    # logging cadence
    log_every: int = 500
    tb_log: bool = False  # --tb_log: TensorBoard event files
    # base of the per-step PRNG stream (--seed; the reference seeds
    # torch/numpy globally at main.py:50-54)
    seed: int = 0
    # sampling reads 2-byte weights per DDIM step instead of 4-byte ones
    # (state.precast_sampling_params, --samp_precast_bf16): opt-in perf
    # mode — bf16 weight rounding in the fused blocks, fewer HBM bytes
    sample_precast_bf16: bool = False


class Trainer:
    def __init__(
        self,
        diffusion: GaussianDiffusion,
        variables: dict,
        train_images: np.ndarray,  # [N,H,W,C] uint8
        train_labels: np.ndarray,  # [N] or [N,D] normalized to [0,1]
        config: TrainerConfig,
        mesh=None,
        aux_info: Optional[dict] = None,
    ):
        cfg = config
        assert train_images.dtype == np.uint8 and train_images.max() > 1, \
            "train_images must be raw uint8 (reference contract trainer.py:89)"
        labels2d = np.asarray(train_labels, dtype=np.float32)
        if labels2d.ndim == 1:
            labels2d = labels2d[:, None]
        assert labels2d.min() >= 0 and labels2d.max() <= 1.0, \
            "labels must be normalized to [0,1] (reference contract trainer.py:90)"
        assert cfg.train_batch_size * cfg.gradient_accumulate_every >= 16 or cfg.data_name == "synthetic", \
            "effective batch size must be >= 16 (reference contract trainer.py:127-129)"

        self.diffusion = diffusion
        self.config = cfg
        self.label_dim = labels2d.shape[1]
        self.mesh = mesh if mesh is not None else create_mesh()

        # resolve vicinal hyperparameters on host, once
        self.sigma_delta, self.kappa = compute_vicinal_hyperparams(
            labels2d,
            cfg.vicinity_type,
            cfg.hyperparameter,
            cfg.kernel_sigma,
            cfg.kappa,
            cfg.percentile,
            cfg.distance,
        )

        # device-resident dataset (uint8 images + f32 labels, replicated)
        rep = replicated(self.mesh)
        self.train_images = jax.device_put(train_images, rep)
        self.train_labels = jax.device_put(labels2d, rep)
        self.unique_labels = jax.device_put(
            np.unique(labels2d, axis=0).astype(np.float32), rep
        )
        # the bank tuple threaded into the jitted train step as arguments
        # (NOT closure constants — see _build_train_step)
        self._data = (self.train_images, self.train_labels, self.unique_labels)

        # optimizer + state
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.train_lr, b1=cfg.adam_betas[0], b2=cfg.adam_betas[1]),
        )
        self.ema_cfg = EmaConfig(
            beta=cfg.ema_decay,
            update_after_step=cfg.ema_update_after_step,
            update_every=cfg.ema_update_every,
        )
        self.state: TrainState = jax.device_put(create_train_state(variables, self.tx), rep)

        os.makedirs(cfg.results_folder, exist_ok=True)
        # elastic aux loss (--lambda_aux): {apply, lambda_aux,
        # vicinity_radius, aux_start_step}; current_step is added per step
        self.aux_info = aux_info
        self._train_step = None  # built lazily per fn_y2h
        self._sample_fns = {}

    # ------------------------------------------------------------ batching

    def _make_batch(self, key: jax.Array, fn_y2h: Callable, data=None):
        """Device-side vicinity batch: returns (images01, cond_labels,
        loss_labels, labels_emb, vicinal_weights_or_None).

        `data` is the (images, labels, unique_labels) bank as TRACED jit
        arguments. When None (direct callers, tiny fixtures) the self.*
        device arrays are closed over instead — but the jitted train step
        always threads `data` explicitly: closure-captured banks are
        embedded as HLO constants, and on relayed-TPU setups the compile
        RPC body then carries the whole dataset (SteeringAngle-64's 123 MB
        bank overflowed the relay's request limit with HTTP 413)."""
        cfg = self.config
        b = cfg.train_batch_size
        images_bank, labels_bank, uniq_bank = (
            data if data is not None
            else (self.train_images, self.train_labels, self.unique_labels))
        k_target, k_select, k_aug = jax.random.split(key, 3)

        if cfg.vicinity_type == "none":
            idx = jax.random.randint(k_select, (b,), 0, labels_bank.shape[0])
            targets = labels_bank[idx]
            weights = None
        else:
            sigma, kappa = self.sigma_delta, self.kappa
            if cfg.adaptive_slicing:
                # per-batch rule-of-thumb (ref trainer.py:254-278): sigma from
                # the drawn base labels' std, kappa = MIN pairwise distance
                k_pick, k_target = jax.random.split(k_target)
                base_idx = jax.random.randint(k_pick, (b,), 0, uniq_bank.shape[0])
                base = uniq_bank[base_idx]
                sigma = 1.06 * jnp.std(base, axis=0) * (b ** (-1.0 / 5.0))
                from ccdm_tpu.ops.vicinal import pairwise_distance as _pd

                d = _pd(base, base, cfg.distance)
                d = d + jnp.eye(b) * 1e9
                kappa = jnp.maximum(jnp.min(d), 1e-3)
                targets = base + jax.random.normal(k_target, base.shape) * sigma
            else:
                targets = sample_target_labels(k_target, uniq_bank, b, self.sigma_delta)
            if cfg.vicinity_type in ("shv", "ssv"):
                idx = select_vicinity_indices_sliced(
                    k_select, targets, labels_bank, kappa,
                    cfg.vector_type, cfg.num_projections,
                )
                weights = jnp.ones((b,), jnp.float32)
            else:
                idx = select_vicinity_indices(
                    k_select, targets, labels_bank, kappa,
                    cfg.vicinity_type, cfg.distance, cfg.nonzero_soft_weight_threshold,
                )
                real = labels_bank[idx]
                if cfg.vicinal_mode == "target":
                    if cfg.vicinity_type == "hv":
                        weights = hard_weights_from_targets(real, targets, kappa, cfg.distance)
                    else:
                        weights = soft_weights_from_targets(real, targets, kappa, cfg.distance)
                else:
                    weights = jnp.ones((b,), jnp.float32)

        # Shard the batch over the data axis HERE, at the selection boundary:
        # the gather from the replicated dataset and everything downstream
        # (augment, UNet fwd/bwd) then run partitioned, and XLA inserts the
        # grad all-reduce over ICI. Without this every chip would compute the
        # identical full batch (the indices come from a replicated key).
        idx = constrain_batch(self.mesh, idx)
        real_labels = labels_bank[idx]
        imgs_u8 = images_bank[idx]
        imgs_u8 = augment_for_dataset(cfg.data_name, k_aug, imgs_u8)
        images01 = normalize_images(imgs_u8, to_neg_one_to_one=False)

        cond_labels = targets if cfg.condition_on_target else real_labels
        loss_labels = real_labels
        labels_emb = fn_y2h(cond_labels)
        images01, cond_labels, loss_labels, labels_emb, weights = constrain_batch(
            self.mesh, images01, cond_labels, loss_labels, labels_emb, weights
        )
        batch_kappa = kappa if cfg.vicinity_type != "none" else self.kappa
        return images01, cond_labels, loss_labels, labels_emb, weights, batch_kappa

    # ---------------------------------------------------------- train step

    def _build_train_step(self, fn_y2h: Callable):
        cfg = self.config
        diffusion = self.diffusion
        use_batch_weights = cfg.vicinal_mode == "batch" and cfg.vicinity_type != "none"

        def _aux(step):
            if self.aux_info is None:
                return None
            info = dict(self.aux_info)
            info.setdefault("vicinity_radius", float(np.atleast_1d(np.asarray(self.kappa))[0]))
            info["current_step"] = step
            return info

        def loss_fn(params, batch_stats, key, step, data):
            # distinct streams: with threefry, split(key,3) == split(key,6)[:3],
            # so reusing `key` for both the batch draw and the loss would make
            # the CFG drop mask overlap the vicinity-selection uniforms.
            k_batch, k_loss = jax.random.split(key)
            images01, cond_labels, loss_labels, labels_emb, weights, kappa = self._make_batch(k_batch, fn_y2h, data)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            loss, updates = diffusion.loss(
                variables, k_loss, images01, loss_labels, labels_emb,
                vicinal_weights=weights if use_batch_weights else None,
                kappa=kappa, train=True, aux_info=_aux(step),
            )
            return loss, updates

        # vanilla "target" mode: the trainer-computed per-sample weights are
        # applied directly (no intra-batch pairwise weighting).
        def loss_fn_target(params, batch_stats, key, step, data):
            k_batch, k_loss = jax.random.split(key)
            images01, cond_labels, loss_labels, labels_emb, weights, kappa = self._make_batch(k_batch, fn_y2h, data)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            loss, updates = diffusion.weighted_loss(
                variables, k_loss, images01, loss_labels, labels_emb, weights,
                train=True, aux_info=_aux(step),
            )
            return loss, updates

        pick_loss = loss_fn_target if cfg.vicinal_mode == "target" else loss_fn
        grad_fn = jax.value_and_grad(pick_loss, has_aux=True)
        acc = cfg.gradient_accumulate_every

        def train_step(state: TrainState, key: jax.Array, data):
            keys = jax.random.split(key, acc)

            def micro(carry, k):
                grads_acc, loss_acc, stats = carry
                (loss, updates), grads = grad_fn(state.params, stats, k, state.step, data)
                new_stats = updates.get("batch_stats", stats)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss, new_stats), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, total_loss, batch_stats), _ = jax.lax.scan(
                micro, (zero_grads, 0.0, state.batch_stats), keys
            )
            grads = jax.tree_util.tree_map(lambda g: g / acc, grads)

            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=batch_stats,
                opt_state=opt_state,
            )
            state = ema_update(state, self.ema_cfg)
            return state, total_loss / acc

        # The (images, labels, unique_labels) bank rides as jit ARGUMENTS:
        # closed-over device arrays are lowered as HLO constants, and on a
        # relayed TPU the serialized compile request then contains the whole
        # dataset (SA-64's 123 MB bank -> HTTP 413 from the compile RPC).
        # The public step keeps its (state, key) signature via this wrapper.
        jitted = jax.jit(train_step, donate_argnums=(0,))

        def step(state: TrainState, key: jax.Array):
            return jitted(state, key, self._data)

        step.lower = lambda state, key: jitted.lower(state, key, self._data)
        return step

    # ---------------------------------------------------------------- train

    def train(self, fn_y2h: Callable, progress: bool = True) -> None:
        """Run the training loop (reference trainer.py:537-780)."""
        cfg = self.config
        logger = TrainLogger(cfg.results_folder, cfg.train_num_steps,
                             tb=cfg.tb_log)
        timer = StepTimer()
        if self._train_step is None:
            self._train_step = self._build_train_step(fn_y2h)

        # one-time FLOPs estimate for live MFU telemetry (VERDICT r2 #8).
        # Through the axon relay only the COMPILED executable carries a cost
        # analysis (lowered.cost_analysis() returns None), so AOT-compile the
        # step and run the loop on the executable — one compile total, same
        # as the lazy jit path, plus real FLOPs for the MFU line.
        flops_per_step = None
        peak_flops = float(os.environ.get("CCDM_TPU_PEAK_FLOPS", 197e12))
        if jax.devices()[0].platform == "tpu" and hasattr(self._train_step, "lower"):
            try:
                compiled = self._train_step.lower(
                    self.state, jax.random.PRNGKey(0)).compile()
                ca = compiled.cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                if ca:
                    flops_per_step = float(ca.get("flops", 0.0)) or None
                # the executable takes (state, key, data) — rebind the bank
                self._train_step = lambda s, k: compiled(s, k, self._data)
            except Exception:
                pass

        # Static regime context carried on every mfu-bearing log line so a
        # small-model run's MFU can't masquerade as flagship train efficiency
        # (a dim-32 Cell teacher legitimately sits ~14% MFU while the
        # flagship audit shows 36% — the numbers measure different regimes).
        _, h_img, w_img, c_img = (int(d) for d in self.train_images.shape)
        regime = {
            "model_mparams": round(sum(
                x.size for x in jax.tree_util.tree_leaves(self.state.params)) / 1e6, 2),
            "batch": cfg.train_batch_size * cfg.gradient_accumulate_every,
            "img": f"{h_img}x{w_img}x{c_img}",
        }

        base_key = jax.random.PRNGKey(cfg.seed)
        step = int(self.state.step)
        window_t0 = time.perf_counter()
        window_start = step
        while step < cfg.train_num_steps:
            key = jax.random.fold_in(base_key, step)
            timer.start()
            self.state, loss = self._train_step(self.state, key)
            # NOTE: loss stays a device array — materializing it every step
            # forces a host sync (a full round trip on remote-TPU setups);
            # we only block at log boundaries.
            dt = timer.stop()
            step += 1

            if step % cfg.log_every == 0 or step == 1:
                loss_val = float(loss)  # device sync, once per window
                window_dt = time.perf_counter() - window_t0
                n_window = max(step - window_start, 1)
                per_step = window_dt / n_window
                eff_batch = cfg.train_batch_size * cfg.gradient_accumulate_every
                logger.log_text(step, loss_val)
                scalars = {
                    "step": step,
                    "loss": loss_val,
                    "step_time_s": per_step,
                    "imgs_per_sec": eff_batch / per_step if per_step > 0 else 0.0,
                }
                if flops_per_step and per_step > 0:
                    scalars["mfu_pct"] = round(
                        100.0 * flops_per_step / per_step / peak_flops, 2)
                    scalars.update(regime)
                logger.log_scalars(scalars)
                if progress:
                    print(f"step {step}/{cfg.train_num_steps} loss {loss_val:.4f} ({per_step*1e3:.0f} ms)")
                window_t0 = time.perf_counter()
                window_start = step

            if cfg.y_visual is not None and step % cfg.sample_every == 0:
                self._save_visual_grid(fn_y2h, step)
            if step % cfg.save_every == 0:
                self.save(step)

    def _save_visual_grid(self, fn_y2h: Callable, step: int) -> None:
        cfg = self.config
        y = jnp.asarray(np.atleast_2d(np.asarray(cfg.y_visual, np.float32).T).T.reshape(len(cfg.y_visual), -1))
        emb = fn_y2h(y)
        v = ema_variables(self.state)
        if cfg.sample_precast_bf16:
            v = precast_sampling_params(v)
        imgs = self.diffusion.ddim_sample(
            v, jax.random.PRNGKey(step), emb, labels=y,
            cond_scale=cfg.cond_scale_visual,
            sampling_timesteps=cfg.sample_timesteps_visual,
        )
        save_image_grid(
            np.asarray(imgs), os.path.join(cfg.results_folder, f"sample_{step}.png"),
            nrow=cfg.nrow_visual,
        )

    # ----------------------------------------------------------- sampling

    def sample_given_labels(
        self,
        given_labels: np.ndarray,
        fn_y2h: Callable,
        batch_size: int,
        denorm: bool = True,
        to_numpy: bool = True,
        verbose: bool = False,
        sampler: str = "ddim",
        cond_scale: float = 6.0,
        sample_timesteps: int = 1000,
        ddim_eta: float = 0.0,
        use_ema: bool = True,
        key_base: int = 1,
    ):
        """Batched EMA sampling for an array of normalized labels
        (reference trainer.py:782-869). Returns (images, labels).
        key_base seeds the sampling noise stream (serving passes per-request
        seeds; the default matches the reference's fixed stream)."""
        labels = np.asarray(given_labels, dtype=np.float32)
        labels2d = labels[:, None] if labels.ndim == 1 else labels
        assert labels2d.min() >= 0 and labels2d.max() <= 1.0
        nfake = len(labels2d)
        batch_size = min(batch_size, nfake)

        variables = ema_variables(self.state) if use_ema else online_variables(self.state)
        if self.config.sample_precast_bf16:
            variables = precast_sampling_params(variables)

        # cond_scale is passed into the jitted sampler as a TRACED scalar, so
        # one compiled function serves every scale (a serving client sweeping
        # cond_scale must not trigger per-value recompiles). Unit scale keeps
        # its own compiled variant: it statically skips the 2B CFG forward.
        unit_scale = float(cond_scale) == 1.0
        cache_key = (sampler, unit_scale, sample_timesteps, ddim_eta, batch_size)
        if cache_key not in self._sample_fns:
            if sampler == "ddim":
                fn = lambda v, k, e, y, cs: self.diffusion.ddim_sample(
                    v, k, e, labels=y, cond_scale=(1.0 if unit_scale else cs),
                    sampling_timesteps=sample_timesteps, ddim_eta=ddim_eta,
                )
            else:
                fn = lambda v, k, e, y, cs: self.diffusion.p_sample_loop(
                    v, k, e, labels=y, cond_scale=(1.0 if unit_scale else cs),
                    sampling_timesteps=sample_timesteps,
                )
            self._sample_fns[cache_key] = jax.jit(fn)
        sample_fn = self._sample_fns[cache_key]
        cs_arg = jnp.float32(cond_scale)

        out = []
        done = 0
        while done < nfake:
            chunk = labels2d[done:done + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            y = jnp.asarray(chunk)
            emb = fn_y2h(y)
            imgs = sample_fn(variables, jax.random.fold_in(jax.random.PRNGKey(key_base), done), emb, y, cs_arg)
            imgs = np.asarray(imgs)[: len(chunk) - pad or None]
            if denorm:
                imgs = np.asarray(to_uint8(jnp.asarray(imgs)))
            out.append(imgs)
            done += batch_size
            if verbose:
                print(f"\r {min(done, nfake)}/{nfake} complete...")
        images = np.concatenate(out, axis=0)[:nfake]
        if not to_numpy:
            images = jnp.asarray(images)
        return images, given_labels

    # --------------------------------------------------------- checkpoints

    def save(self, milestone: int | str) -> str:
        if jax.process_index() != 0:
            return ""
        tree = {
            "step": np.asarray(self.state.step),
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
            "ema_step": np.asarray(self.state.ema_step),
            "ema_params": jax.device_get(self.state.ema_params),
            "ema_batch_stats": jax.device_get(self.state.ema_batch_stats),
        }
        return save_checkpoint(self.config.results_folder, milestone, tree)

    def load(self, milestone: int | str) -> None:
        # the restore TEMPLATE only needs shapes/dtypes — build it from
        # array metadata, NOT device_get: fetching hundreds of param/opt/EMA
        # leaves over a remote-TPU tunnel is one RPC per leaf and can stall
        # for minutes (observed through the axon relay)
        zeros = lambda tree: jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, x.dtype), tree)
        target = {
            "step": np.zeros(self.state.step.shape, self.state.step.dtype),
            "params": zeros(self.state.params),
            "batch_stats": zeros(self.state.batch_stats),
            "opt_state": zeros(self.state.opt_state),
            "ema_step": np.zeros(self.state.ema_step.shape, self.state.ema_step.dtype),
            "ema_params": zeros(self.state.ema_params),
            "ema_batch_stats": zeros(self.state.ema_batch_stats),
        }
        tree = load_checkpoint(self.config.results_folder, milestone, target)
        rep = replicated(self.mesh)
        self.state = jax.device_put(
            TrainState(
                step=jnp.asarray(tree["step"]),
                params=tree["params"],
                batch_stats=tree["batch_stats"],
                opt_state=tree["opt_state"],
                ema_step=jnp.asarray(tree["ema_step"]),
                ema_params=tree["ema_params"],
                ema_batch_stats=tree["ema_batch_stats"],
            ),
            rep,
        )
