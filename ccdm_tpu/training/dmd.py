"""DMD2-M one-step distillation trainer.

TPU-native re-design of `CCDM_unified/dmd.py:275-944`: distill a trained CCDM
teacher (pred_x0 UNet) into a one-step GAN generator via three losses:

- distribution matching (`dmd.py:503-551`): at t ~ U[0.02T, 0.98T], score
  difference (x - real_unet(x_t)) - (x - fake_unet(x_t)), normalized by
  mean|p_real|, applied through the stable-dreamfusion trick
  0.5*mse(x, stop_grad(x - grad)).
- generator adversarial (`dmd.py:591-629`): netD on q_sampled (optionally
  DiffAugment'ed) images; hinge or vanilla.
- fake-unet denoising (`dmd.py:554-588`): mse(fake_unet(x_t), x) * SNR[t],
  optional Hy division.

Two AdamW optimizers (betas 0.9/0.999, wd 0.01, `dmd.py:405-415`):
'generator' over netG; 'guidance' over netD + fake_unet, stepped num_D_steps
times per G step. All three updates are jitted; the vicinity batch
construction is the same device-side machinery as the diffusion Trainer
(NN fallback replaces the reference's rejection loop, `dmd.py:791-796`).
Fake-generation labels are U[target-kappa, target+kappa] clipped to [0,1]
(`dmd.py:806-813`).

The reference's dmd.py is unrunnable in the fork (broken imports, SURVEY.md
§2.1); flags are reconstructed from scripts/*/linux/run_dmd.sh semantics.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ccdm_tpu.ops.image import augment_for_dataset, normalize_images
from ccdm_tpu.ops.schedule import Schedule, make_schedule, q_sample
from ccdm_tpu.parallel import constrain_batch, create_mesh, replicated
from ccdm_tpu.training.diffaugment import diff_augment
from ccdm_tpu.training.hyperparams import compute_vicinal_hyperparams
from ccdm_tpu.training.vicinity import sample_target_labels, select_vicinity_indices
from ccdm_tpu.utils.ckpt import load_checkpoint, save_checkpoint
from ccdm_tpu.utils.logging import TrainLogger
from ccdm_tpu.utils.viz import save_image_grid


@dataclasses.dataclass
class DMDConfig:
    data_name: str = "synthetic"
    train_batch_size: int = 16
    gradient_accumulate_every: int = 1
    niters: int = 50000
    train_lr_generator: float = 1e-4
    train_lr_guidance: float = 1e-4
    max_grad_norm: float = 1.0
    num_D_steps: int = 2
    weight_generator_adv: float = 1.0  # wG
    weight_guidance_adv: float = 10.0  # wD
    adv_loss_type: str = "hinge"  # hinge | vanilla
    gan_DiffAugment: bool = True
    gan_DiffAugment_policy: str = "color,translation,cutout"
    min_step_percent: float = 0.02
    max_step_percent: float = 0.98
    train_timesteps: int = 1000
    beta_schedule: str = "cosine"
    use_Hy: bool = False
    hy_max_log: float = 4.0  # cap on the y2cov log-scale; <=0 disables
    kappa: Optional[float] = None  # resolved radius; 0 disables vicinity
    kernel_sigma: Optional[float] = None
    z_dim: int = 256
    sample_every: int = 1000
    save_every: int = 5000
    results_folder: str = "./dmd_results"
    log_every: int = 250
    seed: int = 42  # base of the per-step PRNG stream (--seed)


class DMD2Trainer:
    def __init__(
        self,
        teacher_apply: Callable,  # real_unet apply (frozen)
        teacher_variables: dict,
        fake_unet_apply: Callable,
        fake_unet_variables: dict,  # trainable copy (deepcopy of teacher, dmd.py:225)
        netG,  # flax module
        netD,  # flax module
        netG_variables: dict,
        netD_variables: dict,
        train_images: np.ndarray,  # uint8 NHWC
        train_labels: np.ndarray,  # [N] normalized
        fn_y2h: Callable,
        config: DMDConfig,
        fn_y2cov: Optional[Callable] = None,
        mesh=None,
    ):
        cfg = config
        self.cfg = cfg
        self.teacher_apply = teacher_apply
        self.fake_unet_apply = fake_unet_apply
        self.netG = netG
        self.netD = netD
        self.fn_y2h = fn_y2h
        self.fn_y2cov = fn_y2cov
        self.mesh = mesh if mesh is not None else create_mesh()

        self.image_shape = train_images.shape[1:]
        labels2d = np.asarray(train_labels, np.float32).reshape(len(train_labels), -1)
        if cfg.kappa is None or (cfg.kappa is not None and cfg.kappa <= 0 and cfg.kappa != 0):
            sigma, kappa = compute_vicinal_hyperparams(
                labels2d, "hv", kernel_sigma=cfg.kernel_sigma, kappa=cfg.kappa,
            )
            self.kernel_sigma, self.kappa = sigma, kappa
        else:
            self.kappa = float(cfg.kappa)
            self.kernel_sigma = cfg.kernel_sigma if cfg.kernel_sigma and cfg.kernel_sigma > 0 else float(
                compute_vicinal_hyperparams(labels2d, "hv", kernel_sigma=None, kappa=1.0)[0]
            )

        rep = replicated(self.mesh)
        self.train_images = jax.device_put(np.asarray(train_images), rep)
        self.train_labels = jax.device_put(labels2d, rep)
        self.unique_labels = jax.device_put(np.unique(labels2d, axis=0), rep)

        self.schedule: Schedule = make_schedule(cfg.train_timesteps, cfg.beta_schedule, "pred_x0")
        self.min_step = int(cfg.min_step_percent * cfg.train_timesteps)
        self.max_step = int(cfg.max_step_percent * cfg.train_timesteps)

        self.teacher_variables = jax.device_put(teacher_variables, rep)
        adamw = lambda lr: optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=0.01),
        )
        self.tx_gen = adamw(cfg.train_lr_generator)
        self.tx_gui = adamw(cfg.train_lr_guidance)

        gen_params = netG_variables["params"]
        gui_params = {
            "netD": netD_variables["params"],
            "fake_unet": fake_unet_variables["params"],
        }
        self.state = {
            "step": jnp.zeros((), jnp.int32),
            "gen_params": gen_params,
            "gen_stats": netG_variables.get("batch_stats", {}),
            "gui_params": gui_params,
            "netD_stats": netD_variables.get("batch_stats", {}),
            "fake_unet_stats": fake_unet_variables.get("batch_stats", {}),
            "gen_opt": self.tx_gen.init(gen_params),
            "gui_opt": self.tx_gui.init(gui_params),
        }
        self.state = jax.device_put(self.state, rep)
        os.makedirs(cfg.results_folder, exist_ok=True)
        self._g_step = None
        self._d_step = None

    # ----------------------------------------------------------- helpers

    def _convert_y_to_cov(self, labels: jax.Array) -> jax.Array:
        from ccdm_tpu.diffusion.gaussian import hy_from_y2cov

        h, w, c = self.image_shape
        cov = hy_from_y2cov(self.fn_y2cov(labels), self.cfg.hy_max_log).reshape(-1, c, h, w)
        return jnp.transpose(cov, (0, 2, 3, 1))

    def _noise_like(self, key, labels, shape):
        noise = jax.random.normal(key, shape)
        if self.cfg.use_Hy and self.fn_y2cov is not None:
            noise = noise * jnp.sqrt(self._convert_y_to_cov(labels))
        return noise

    def _unet(self, apply_fn, variables, x, t, labels):
        """Denoiser forward, condition always kept (cond_drop_prob=0)."""
        b = x.shape[0]
        emb = self.fn_y2h(labels.reshape(-1))
        return apply_fn(variables, x, t, emb, jnp.ones((b,), bool), train=False)

    def _d_out(self, gui_params, netD_stats, key, images, labels, train):
        """netD on q_sampled (+DiffAugment'ed) images (dmd.py:591-612)."""
        cfg = self.cfg
        b = images.shape[0]
        k_t, k_noise, k_aug = jax.random.split(key, 3)
        t = jax.random.randint(k_t, (b,), 0, cfg.train_timesteps)
        noise = self._noise_like(k_noise, labels, images.shape)
        if cfg.gan_DiffAugment:
            images = diff_augment(k_aug, images, cfg.gan_DiffAugment_policy)
        noisy = q_sample(self.schedule, images, t, noise)
        emb = self.fn_y2h(labels.reshape(-1))
        variables = {"params": gui_params["netD"]}
        if netD_stats:
            variables["batch_stats"] = netD_stats
        if train:
            out, upd = self.netD.apply(variables, noisy, emb, train=True, mutable=["batch_stats"])
            return out, upd.get("batch_stats", netD_stats)
        return self.netD.apply(variables, noisy, emb, train=False), netD_stats

    # -------------------------------------------------------- loss pieces

    def _dm_loss(self, fake_unet_params, fake_unet_stats, key, images, labels):
        """Distribution-matching loss (dmd.py:503-551). No grads through the
        unets — only through `images` via the dreamfusion trick."""
        cfg = self.cfg
        b = images.shape[0]
        k_t, k_noise = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), self.min_step, min(self.max_step + 1, cfg.train_timesteps))
        noise = self._noise_like(k_noise, labels, images.shape)
        noisy = q_sample(self.schedule, jax.lax.stop_gradient(images), t, noise)

        pred_real = self._unet(self.teacher_apply, self.teacher_variables, noisy, t, labels)
        fake_vars = {"params": fake_unet_params}
        if fake_unet_stats:
            fake_vars["batch_stats"] = fake_unet_stats
        pred_fake = self._unet(self.fake_unet_apply, fake_vars, noisy, t, labels)

        x = jax.lax.stop_gradient(images)
        p_real = x - pred_real
        p_fake = x - pred_fake
        weight = jnp.mean(jnp.abs(p_real), axis=(1, 2, 3), keepdims=True)
        grad = (p_real - p_fake) / (weight + 1e-8)
        grad = jnp.nan_to_num(grad)
        target = jax.lax.stop_gradient(images - grad)
        return 0.5 * jnp.mean((images - target) ** 2)

    def _denoising_loss(self, fake_unet_params, fake_unet_stats, key, images, labels):
        """Fake-unet denoising loss, SNR-weighted (dmd.py:554-588)."""
        cfg = self.cfg
        b = images.shape[0]
        images = jax.lax.stop_gradient(images)
        k_t, k_noise = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, cfg.train_timesteps)
        noise = self._noise_like(k_noise, labels, images.shape)
        noisy = q_sample(self.schedule, images, t, noise)
        emb = self.fn_y2h(labels.reshape(-1))
        variables = {"params": fake_unet_params}
        if fake_unet_stats:
            variables["batch_stats"] = fake_unet_stats
        out = self.fake_unet_apply(variables, noisy, t, emb, jnp.ones((b,), bool), train=False)
        sq = (out - images) ** 2
        if cfg.use_Hy and self.fn_y2cov is not None:
            sq = sq / self._convert_y_to_cov(labels)
        per_sample = jnp.mean(sq.reshape(b, -1), axis=-1) * self.schedule.snr[t]
        return jnp.mean(per_sample)

    def _adv_g(self, d_out):
        if self.cfg.adv_loss_type == "vanilla":
            return -jnp.mean(jnp.log(jax.nn.sigmoid(d_out) + 1e-20))
        return -jnp.mean(d_out)  # hinge

    def _adv_d(self, d_real, d_fake):
        if self.cfg.adv_loss_type == "vanilla":
            return (
                -jnp.mean(jnp.log(jax.nn.sigmoid(d_real) + 1e-20))
                - jnp.mean(jnp.log(1 - jax.nn.sigmoid(d_fake) + 1e-20))
            )
        return jnp.mean(jax.nn.relu(1.0 - d_real)) + jnp.mean(jax.nn.relu(1.0 + d_fake))

    # --------------------------------------------------------- batch draws

    def _draw_target_labels(self, key):
        cfg = self.cfg
        b = cfg.train_batch_size
        if self.kappa == 0:
            idx = jax.random.randint(key, (b,), 0, self.train_labels.shape[0])
            return constrain_batch(self.mesh, self.train_labels[idx])
        return constrain_batch(
            self.mesh, sample_target_labels(key, self.unique_labels, b, self.kernel_sigma)
        )

    def _draw_real_batch(self, key, targets, images_bank=None):
        """`images_bank` rides as a traced jit argument from d_step — a
        closure-captured bank lowers as an HLO constant and overflows the
        relayed compile RPC at SA-64 size (see Trainer._make_batch)."""
        cfg = self.cfg
        if images_bank is None:
            images_bank = self.train_images
        k_sel, k_aug = jax.random.split(key)
        if self.kappa == 0:
            idx = jax.random.randint(k_sel, (cfg.train_batch_size,), 0, self.train_labels.shape[0])
        else:
            idx = select_vicinity_indices(k_sel, targets, self.train_labels, self.kappa, "hv")
        idx = constrain_batch(self.mesh, idx)
        imgs = augment_for_dataset(cfg.data_name, k_aug, images_bank[idx])
        return normalize_images(imgs, to_neg_one_to_one=True)  # D works in [-1,1] (dmd.py:769)

    def _draw_fake_labels(self, key, targets):
        """U[target-kappa, target+kappa] clipped to [0,1] (dmd.py:806-813)."""
        if self.kappa == 0:
            return targets
        lb = jnp.clip(targets - self.kappa, 0.0, 1.0)
        ub = jnp.clip(targets + self.kappa, 0.0, 1.0)
        u = jax.random.uniform(key, targets.shape)
        return lb + u * (ub - lb)

    # ------------------------------------------------------------- steps

    def _build_steps(self):
        cfg = self.cfg

        def g_step(state, key):
            k_lbl, k_z, k_dm, k_adv = jax.random.split(key, 4)
            targets = self._draw_target_labels(k_lbl)
            z = constrain_batch(
                self.mesh, jax.random.normal(k_z, (cfg.train_batch_size, cfg.z_dim))
            )
            emb = self.fn_y2h(targets.reshape(-1))

            def loss_fn(gen_params):
                gvars = {"params": gen_params}
                if state["gen_stats"]:
                    gvars["batch_stats"] = state["gen_stats"]
                fake, upd = self.netG.apply(gvars, z, emb, train=True, mutable=["batch_stats"])
                dm = self._dm_loss(state["gui_params"]["fake_unet"],
                                   state["fake_unet_stats"], k_dm, fake, targets)
                d_out, _ = self._d_out(state["gui_params"], state["netD_stats"],
                                       k_adv, fake, targets, train=False)
                adv = self._adv_g(d_out)
                return dm + cfg.weight_generator_adv * adv, (upd.get("batch_stats", state["gen_stats"]), dm, adv)

            (loss, (gen_stats, dm, adv)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["gen_params"])
            upd, gen_opt = self.tx_gen.update(grads, state["gen_opt"], state["gen_params"])
            state = dict(state)
            state["gen_params"] = optax.apply_updates(state["gen_params"], upd)
            state["gen_stats"] = gen_stats
            state["gen_opt"] = gen_opt
            return state, (loss, dm, adv)

        def d_step(state, key, images_bank):
            k_lbl, k_fl, k_real, k_z, k_advr, k_advf, k_dn = jax.random.split(key, 7)
            targets = self._draw_target_labels(k_lbl)
            real = self._draw_real_batch(k_real, targets, images_bank)
            fake_labels = self._draw_fake_labels(k_fl, targets)
            z = constrain_batch(
                self.mesh, jax.random.normal(k_z, (cfg.train_batch_size, cfg.z_dim))
            )
            gvars = {"params": state["gen_params"]}
            if state["gen_stats"]:
                gvars["batch_stats"] = state["gen_stats"]
            # The reference never switches netG to eval between the G and D
            # sections (dmd.py:691 sets .train(); no .eval() before :746+), so
            # the fakes shown to D use BATCH statistics and the running stats
            # advance on every D-step forward. Generating these fakes in eval
            # mode instead lets the train/eval BN gap grow unchecked: D only
            # ever rejects eval-mode outputs while G optimizes train-mode
            # ones, and eval-time sampling collapses.
            fake, g_upd = self.netG.apply(
                gvars, z, self.fn_y2h(fake_labels.reshape(-1)),
                train=True, mutable=["batch_stats"],
            )
            fake = jax.lax.stop_gradient(fake)
            gen_stats = g_upd.get("batch_stats", state["gen_stats"])

            def loss_fn(gui_params):
                d_real, stats1 = self._d_out(gui_params, state["netD_stats"], k_advr, real, targets, train=True)
                d_fake, stats2 = self._d_out({"netD": gui_params["netD"]}, stats1, k_advf, fake, targets, train=True)
                adv = self._adv_d(d_real, d_fake)
                dn = self._denoising_loss(gui_params["fake_unet"], state["fake_unet_stats"], k_dn, fake, targets)
                return dn + cfg.weight_guidance_adv * adv, (stats2, dn, adv)

            (loss, (netD_stats, dn, adv)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["gui_params"])
            upd, gui_opt = self.tx_gui.update(grads, state["gui_opt"], state["gui_params"])
            state = dict(state)
            state["gui_params"] = optax.apply_updates(state["gui_params"], upd)
            state["netD_stats"] = netD_stats
            state["gen_stats"] = gen_stats
            state["gui_opt"] = gui_opt
            return state, (loss, dn, adv)

        jitted_d = jax.jit(d_step, donate_argnums=(0,))

        def d_step_bound(state, key):
            return jitted_d(state, key, self.train_images)

        return jax.jit(g_step, donate_argnums=(0,)), d_step_bound

    # -------------------------------------------------------------- train

    def train(self, progress: bool = True):
        cfg = self.cfg
        logger = TrainLogger(cfg.results_folder, cfg.niters)
        if self._g_step is None:
            self._g_step, self._d_step = self._build_steps()
        base = jax.random.PRNGKey(cfg.seed)
        step = int(self.state["step"])
        while step < cfg.niters:
            key = jax.random.fold_in(base, step)
            self.state, (g_loss, dm, g_adv) = self._g_step(self.state, jax.random.fold_in(key, 0))
            d_losses = []
            for j in range(cfg.num_D_steps):
                self.state, (d_loss, dn, d_adv) = self._d_step(self.state, jax.random.fold_in(key, 1 + j))
                d_losses.append(float(d_loss))
            step += 1
            self.state["step"] = jnp.asarray(step, jnp.int32)

            if step % cfg.log_every == 0 or step == 1:
                msg = {
                    "step": step, "g_loss": float(g_loss), "dm_loss": float(dm),
                    "g_adv": float(g_adv), "d_loss": float(np.mean(d_losses)),
                }
                logger.log_scalars(msg)
                logger.log_text(step, float(g_loss))
                if progress:
                    print(f"dmd step {step}/{cfg.niters} g={float(g_loss):.4f} d={np.mean(d_losses):.4f}")
            if step % cfg.sample_every == 0:
                # run the jitted sampling on ALL processes (globally-sharded
                # state would deadlock a multi-host mesh if only process 0
                # entered the computation); only the PNG write is gated
                self._dump_visual_grid(step)
            if step % cfg.save_every == 0:
                self.save(step)

    def _dump_visual_grid(self, step: int) -> None:
        """Periodic EVAL-mode sample grid (ref dmd.py y_visual PNG at
        sample_every) — 6 quantile-spaced labels x 6 z draws. Sampling in
        eval mode is deliberate: it watches the path the final per-label
        sampling uses, so a train/eval BN divergence shows up DURING
        training instead of at the end."""
        uniq = np.unique(np.asarray(jax.device_get(self.unique_labels)).reshape(-1))
        rows = np.quantile(uniq, np.linspace(0.05, 0.95, 6))
        y_visual = np.repeat(rows, 6).astype(np.float32)
        imgs, _ = self.sample_given_labels(y_visual, batch_size=len(y_visual), denorm=False)
        if jax.process_index() == 0:
            save_image_grid(
                np.clip(np.asarray(imgs), 0.0, 1.0),
                os.path.join(self.cfg.results_folder, f"sample_{step}.png"),
                nrow=6,
            )

    # ----------------------------------------------------------- sampling

    def sample_given_labels(self, given_labels: np.ndarray, batch_size: int,
                            denorm: bool = True, to_numpy: bool = True):
        """One-step sampling: netG(z, y2h(y)) (dmd.py:900-940)."""
        cfg = self.cfg
        labels = np.asarray(given_labels, np.float32).reshape(-1)
        n = len(labels)
        batch_size = min(batch_size, n)
        gvars = {"params": self.state["gen_params"]}
        if self.state["gen_stats"]:
            gvars["batch_stats"] = self.state["gen_stats"]

        # the compiled generator is cached per batch_size with the variables
        # passed as a traced argument — a jit built inside this function
        # would recompile on EVERY call (measured: ~45 s/label through the
        # TPU relay over the reference's per-label sampling loop)
        cached = getattr(self, "_gen_jit", None)
        if cached is None or cached[0] != batch_size:
            @jax.jit
            def gen(gv, key, y):
                z = jax.random.normal(key, (batch_size, cfg.z_dim))
                x = self.netG.apply(gv, z, self.fn_y2h(y), train=False)
                return (x + 1.0) * 0.5  # [-1,1] -> [0,1]

            self._gen_jit = cached = (batch_size, gen)
        gen = cached[1]

        out, done = [], 0
        while done < n:
            chunk = labels[done:done + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad)])
            imgs = np.asarray(gen(gvars,
                                  jax.random.fold_in(jax.random.PRNGKey(7), done),
                                  jnp.asarray(chunk)))
            if pad:
                imgs = imgs[:-pad]
            if denorm:
                imgs = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
            out.append(imgs)
            done += batch_size
        images = np.concatenate(out, axis=0)[:n]
        return images, given_labels

    # --------------------------------------------------------- checkpoints

    def save(self, milestone) -> str:
        if jax.process_index() != 0:
            return ""
        tree = jax.device_get({k: v for k, v in self.state.items()})
        return save_checkpoint(self.cfg.results_folder, f"dmd-{milestone}", tree)

    def load(self, milestone) -> None:
        target = jax.device_get(dict(self.state))
        tree = load_checkpoint(self.cfg.results_folder, f"dmd-{milestone}", target)
        self.state = jax.device_put(tree, replicated(self.mesh))
