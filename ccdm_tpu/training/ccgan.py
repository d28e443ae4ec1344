"""CcGAN (+Dual-NDA) trainer — continuous-conditional GAN baselines.

TPU-native re-design of `CCDM_vanilla/RC-49/.../CCGM/CcGAN/train_ccgan.py:
55-320` (HVDL/SVDL vicinal discriminator/generator losses with vicinity
resampling) and `CCGM/Dual-NDA/train_ccgan.py:53-620` (dual negative data
augmentation):

- D loss = mean(w_real * L_real) + nda_a * mean(w_fake * L_fake)
  (+ nda_b * corrupted-reals + nda_c * wrong-label reals
   + nda_d/nda_e * pre-generated bad fakes), hinge or vanilla.
- fake-generation labels ~ U[target ± radius] (hard: kappa;
  soft: sqrt(-ln(tau)/kappa_inv) == kappa * sqrt(-ln(tau)) with our
  raw-radius convention), clipped to [0,1].
- soft weights exp(-d^2/kappa^2) vs target labels; hard weights 1.
- Adam(0.5, 0.999) for both nets; vicinity rejection loop replaced by the
  same fixed-shape NN fallback as the diffusion Trainer.

Type-II negatives (nda_c) select reals OUTSIDE the vicinity; Type-I
negatives (nda_d/nda_e) are pre-generated bad-fake arrays passed in by the
caller (the reference loads NIQE-/MAE-filtered h5 dumps).
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
from ccdm_tpu.ops.vicinal import soft_weights_from_targets
from ccdm_tpu.parallel import constrain_batch, create_mesh, replicated
from ccdm_tpu.training.diffaugment import diff_augment, rand_cutout
from ccdm_tpu.training.hyperparams import compute_vicinal_hyperparams
from ccdm_tpu.training.vicinity import (
    _masked_uniform_choice,
    sample_target_labels,
    select_vicinity_indices,
)
from ccdm_tpu.ops.vicinal import pairwise_distance
from ccdm_tpu.utils.ckpt import load_checkpoint, save_checkpoint
from ccdm_tpu.utils.logging import TrainLogger


def jigsaw_k(key: jax.Array, x: jax.Array, k: int = 2) -> jax.Array:
    """Shuffle a kxk grid of patches per sample (Dual-NDA jigsaw negative)."""
    b, h, w, c = x.shape
    ph, pw = h // k, w // k
    patches = x.reshape(b, k, ph, k, pw, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, k * k, ph, pw, c)
    perm = jax.vmap(lambda kk: jax.random.permutation(kk, k * k))(jax.random.split(key, b))
    shuffled = jax.vmap(lambda p, idx: p[idx])(patches, perm)
    return shuffled.reshape(b, k, k, ph, pw, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def stitch(key: jax.Array, x: jax.Array, k: int = 2) -> jax.Array:
    """Stitch halves of two different batch samples (Dual-NDA stitch)."""
    b = x.shape[0]
    perm = jax.random.permutation(key, b)
    other = x[perm]
    h = x.shape[1]
    return jnp.concatenate([x[:, : h // k], other[:, h // k:]], axis=1)


@dataclasses.dataclass
class CcGANConfig:
    data_name: str = "synthetic"
    niters: int = 40000
    batch_size_disc: int = 64
    batch_size_gene: int = 64
    num_D_steps: int = 2
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    dim_gan: int = 256
    threshold_type: str = "hard"  # hard | soft
    kappa: Optional[float] = None
    kernel_sigma: Optional[float] = None
    nonzero_soft_weight_threshold: float = 1e-3
    loss_type: str = "hinge"  # hinge | vanilla
    use_DiffAugment: bool = False
    policy: str = "color,translation,cutout"
    # Dual-NDA mixing weights (must sum to 1 with implicit real weight 1)
    nda_a: float = 1.0
    nda_b: float = 0.0
    nda_c: float = 0.0
    nda_d: float = 0.0
    nda_e: float = 0.0
    nda_start_iter: int = 0
    save_niters_freq: int = 2000
    visualize_freq: int = 2000
    results_folder: str = "./ccgan_results"
    log_every: int = 20
    seed: int = 31  # base of the per-step PRNG stream (--seed)


class CcGANTrainer:
    def __init__(
        self,
        netG, netD,
        netG_variables: dict, netD_variables: dict,
        train_images: np.ndarray,  # uint8 NHWC
        train_labels: np.ndarray,  # [N] normalized
        fn_y2h: Callable,
        config: CcGANConfig,
        badfake_niqe: Optional[tuple] = None,  # (images_u8, labels_norm)
        badfake_mae: Optional[tuple] = None,
        mesh=None,
    ):
        cfg = config
        self.cfg = cfg
        self.netG, self.netD = netG, netD
        self.fn_y2h = fn_y2h
        self.mesh = mesh if mesh is not None else create_mesh()

        labels2d = np.asarray(train_labels, np.float32).reshape(len(train_labels), -1)
        vic_type = "hv" if cfg.threshold_type == "hard" else "sv"
        self.kernel_sigma, self.kappa = compute_vicinal_hyperparams(
            labels2d, vic_type, kernel_sigma=cfg.kernel_sigma, kappa=cfg.kappa,
        )
        self.vic_type = vic_type

        rep = replicated(self.mesh)
        self.train_images = jax.device_put(np.asarray(train_images), rep)
        self.train_labels = jax.device_put(labels2d, rep)
        self.unique_labels = jax.device_put(np.unique(labels2d, axis=0), rep)
        self.badfake_niqe = (
            (jax.device_put(badfake_niqe[0], rep),
             jax.device_put(np.asarray(badfake_niqe[1], np.float32).reshape(-1, 1), rep))
            if badfake_niqe is not None else None
        )
        self.badfake_mae = (
            (jax.device_put(badfake_mae[0], rep),
             jax.device_put(np.asarray(badfake_mae[1], np.float32).reshape(-1, 1), rep))
            if badfake_mae is not None else None
        )

        adam = lambda lr: optax.adam(lr, b1=0.5, b2=0.999)
        self.tx_g, self.tx_d = adam(cfg.lr_g), adam(cfg.lr_d)
        self.state = jax.device_put({
            "step": jnp.zeros((), jnp.int32),
            "g_params": netG_variables["params"],
            "g_stats": netG_variables.get("batch_stats", {}),
            "d_params": netD_variables["params"],
            "d_stats": netD_variables.get("batch_stats", {}),
            "g_opt": self.tx_g.init(netG_variables["params"]),
            "d_opt": self.tx_d.init(netD_variables["params"]),
        }, rep)
        os.makedirs(cfg.results_folder, exist_ok=True)
        self._steps = None

    # ------------------------------------------------------------ helpers

    def _fake_label_radius(self) -> float:
        cfg = self.cfg
        if cfg.threshold_type == "hard":
            return float(self.kappa)
        # soft support radius with raw-radius kappa: sqrt(-ln(tau)) * kappa
        return float(np.sqrt(-np.log(cfg.nonzero_soft_weight_threshold)) * self.kappa)

    def _weights(self, labels, targets):
        if self.cfg.threshold_type == "hard":
            return jnp.ones((labels.shape[0],), jnp.float32)
        return soft_weights_from_targets(labels, targets, self.kappa)

    def _d_apply(self, d_params, d_stats, x, emb, train):
        variables = {"params": d_params}
        if d_stats:
            variables["batch_stats"] = d_stats
        if train:
            out, upd = self.netD.apply(variables, x, emb, train=True, mutable=["batch_stats"])
            return out, upd.get("batch_stats", d_stats)
        return self.netD.apply(variables, x, emb, train=False), d_stats

    def _g_apply(self, g_params, g_stats, z, emb, train):
        variables = {"params": g_params}
        if g_stats:
            variables["batch_stats"] = g_stats
        if train:
            return self.netG.apply(variables, z, emb, train=True, mutable=["batch_stats"])
        return self.netG.apply(variables, z, emb, train=False), {}

    def _neg_loss(self, d_out):
        if self.cfg.loss_type == "vanilla":
            return -jnp.log(1.0 - jax.nn.sigmoid(d_out) + 1e-20)
        return jax.nn.relu(1.0 + d_out)

    def _pos_loss(self, d_out):
        if self.cfg.loss_type == "vanilla":
            return -jnp.log(jax.nn.sigmoid(d_out) + 1e-20)
        return jax.nn.relu(1.0 - d_out)

    # -------------------------------------------------------------- steps

    def _build_steps(self):
        cfg = self.cfg
        radius = self._fake_label_radius()

        def draw_common(key, images_bank):
            # images_bank is a traced jit argument — a closure-captured bank
            # lowers as an HLO constant and overflows the relayed compile
            # RPC at SA-64 size (see Trainer._make_batch)
            k_t, k_sel, k_fl, k_aug = jax.random.split(key, 4)
            targets = sample_target_labels(k_t, self.unique_labels, cfg.batch_size_disc, self.kernel_sigma)
            idx = select_vicinity_indices(
                k_sel, targets, self.train_labels, self.kappa, self.vic_type,
                nonzero_soft_weight_threshold=cfg.nonzero_soft_weight_threshold,
            )
            real_labels = self.train_labels[idx]
            real = normalize_images(
                augment_for_dataset(cfg.data_name, k_aug, images_bank[idx]),
                to_neg_one_to_one=True,
            )
            lb = jnp.clip(targets - radius, 0.0, 1.0)
            ub = jnp.clip(targets + radius, 0.0, 1.0)
            fake_labels = lb + jax.random.uniform(k_fl, targets.shape) * (ub - lb)
            return constrain_batch(self.mesh, targets, real, real_labels, fake_labels)

        def d_step(state, key, use_nda, images_bank):
            keys = jax.random.split(key, 8)
            targets, real, real_labels, fake_labels = draw_common(keys[0], images_bank)
            target_emb = self.fn_y2h(targets.reshape(-1))
            z = constrain_batch(
                self.mesh, jax.random.normal(keys[1], (cfg.batch_size_disc, cfg.dim_gan))
            )
            # reference netG stays in train() mode through the D updates
            # (train_ccgan.py:639 is the only mode switch in the loop), so the
            # fakes D rejects use batch statistics and the running stats
            # advance here too — eval-mode fakes would let the train/eval BN
            # gap grow unchecked (D never scores the eval path G samples with)
            fake, g_upd = self._g_apply(state["g_params"], state["g_stats"], z,
                                        self.fn_y2h(fake_labels.reshape(-1)), train=True)
            fake = jax.lax.stop_gradient(fake)
            g_stats_d = g_upd.get("batch_stats", state["g_stats"])

            w_real = self._weights(real_labels, targets)
            w_fake = self._weights(fake_labels, targets)

            maybe_aug = (
                (lambda k, v: diff_augment(k, v, cfg.policy))
                if cfg.use_DiffAugment else (lambda k, v: v)
            )

            def loss_fn(d_params):
                stats = state["d_stats"]
                out_r, stats = self._d_apply(d_params, stats, maybe_aug(keys[2], real), target_emb, True)
                out_f, stats = self._d_apply(d_params, stats, maybe_aug(keys[3], fake), target_emb, True)
                loss = jnp.mean(w_real * self._pos_loss(out_r)) + cfg.nda_a * jnp.mean(w_fake * self._neg_loss(out_f))
                if use_nda and cfg.nda_b > 0:
                    # corrupted reals: jigsaw / stitch / cutout picked per step
                    pick = jax.random.randint(keys[4], (), 0, 3)
                    corrupted = jax.lax.switch(pick, [
                        lambda v: jigsaw_k(keys[4], v, 2),
                        lambda v: stitch(keys[4], v, 2),
                        lambda v: rand_cutout(keys[4], v),
                    ], real)
                    out_b, stats = self._d_apply(d_params, stats, maybe_aug(keys[4], corrupted), target_emb, True)
                    loss = loss + cfg.nda_b * jnp.mean(self._neg_loss(out_b))
                if use_nda and cfg.nda_c > 0:
                    # Type-II: reals with labels OUTSIDE the vicinity
                    dist = pairwise_distance(targets, self.train_labels)
                    mask_out = dist > self.kappa
                    idx_w = _masked_uniform_choice(keys[5], mask_out)
                    wrong = normalize_images(images_bank[idx_w], to_neg_one_to_one=True)
                    out_c, stats = self._d_apply(d_params, stats, maybe_aug(keys[5], wrong), target_emb, True)
                    loss = loss + cfg.nda_c * jnp.mean(self._neg_loss(out_c))
                if use_nda and cfg.nda_d > 0 and self.badfake_niqe is not None:
                    imgs_bf, _ = self.badfake_niqe
                    idx_bf = jax.random.randint(keys[6], (cfg.batch_size_disc,), 0, imgs_bf.shape[0])
                    bf = normalize_images(imgs_bf[idx_bf], to_neg_one_to_one=True)
                    out_d, stats = self._d_apply(d_params, stats, maybe_aug(keys[6], bf), target_emb, True)
                    loss = loss + cfg.nda_d * jnp.mean(self._neg_loss(out_d))
                if use_nda and cfg.nda_e > 0 and self.badfake_mae is not None:
                    imgs_bf, _ = self.badfake_mae
                    idx_bf = jax.random.randint(keys[7], (cfg.batch_size_disc,), 0, imgs_bf.shape[0])
                    bf = normalize_images(imgs_bf[idx_bf], to_neg_one_to_one=True)
                    out_e, stats = self._d_apply(d_params, stats, maybe_aug(keys[7], bf), target_emb, True)
                    loss = loss + cfg.nda_e * jnp.mean(self._neg_loss(out_e))
                return loss, stats

            (loss, d_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["d_params"])
            upd, d_opt = self.tx_d.update(grads, state["d_opt"], state["d_params"])
            state = dict(state)
            state["d_params"] = optax.apply_updates(state["d_params"], upd)
            state["d_stats"] = d_stats
            state["g_stats"] = g_stats_d
            state["d_opt"] = d_opt
            return state, loss

        def g_step(state, key):
            k_t, k_z, k_aug = jax.random.split(key, 3)
            targets = sample_target_labels(k_t, self.unique_labels, cfg.batch_size_gene, self.kernel_sigma)
            emb = self.fn_y2h(targets.reshape(-1))
            targets, emb = constrain_batch(self.mesh, targets, emb)
            z = constrain_batch(
                self.mesh, jax.random.normal(k_z, (cfg.batch_size_gene, cfg.dim_gan))
            )

            def loss_fn(g_params):
                fake, upd = self._g_apply(g_params, state["g_stats"], z, emb, train=True)
                x_in = diff_augment(k_aug, fake, cfg.policy) if cfg.use_DiffAugment else fake
                d_out, _ = self._d_apply(state["d_params"], state["d_stats"], x_in, emb, False)
                if cfg.loss_type == "vanilla":
                    g_loss = -jnp.mean(jnp.log(jax.nn.sigmoid(d_out) + 1e-20))
                else:
                    g_loss = -jnp.mean(d_out)
                return g_loss, upd.get("batch_stats", state["g_stats"])

            (loss, g_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["g_params"])
            upd, g_opt = self.tx_g.update(grads, state["g_opt"], state["g_params"])
            state = dict(state)
            state["g_params"] = optax.apply_updates(state["g_params"], upd)
            state["g_stats"] = g_stats
            state["g_opt"] = g_opt
            return state, loss

        jit_d = jax.jit(lambda s, k, bank: d_step(s, k, False, bank), donate_argnums=(0,))
        jit_d_nda = jax.jit(lambda s, k, bank: d_step(s, k, True, bank), donate_argnums=(0,))
        return (
            lambda s, k: jit_d(s, k, self.train_images),
            lambda s, k: jit_d_nda(s, k, self.train_images),
            jax.jit(g_step, donate_argnums=(0,)),
        )

    # -------------------------------------------------------------- train

    def train(self, progress: bool = True):
        cfg = self.cfg
        logger = TrainLogger(cfg.results_folder, cfg.niters)
        if self._steps is None:
            self._steps = self._build_steps()
        d_plain, d_nda, g_step = self._steps
        base = jax.random.PRNGKey(cfg.seed)
        step = int(self.state["step"])
        while step < cfg.niters:
            key = jax.random.fold_in(base, step)
            use_nda = step >= cfg.nda_start_iter and (
                cfg.nda_b > 0 or cfg.nda_c > 0 or cfg.nda_d > 0 or cfg.nda_e > 0
            )
            d_fn = d_nda if use_nda else d_plain
            for j in range(cfg.num_D_steps):
                self.state, d_loss = d_fn(self.state, jax.random.fold_in(key, j))
            self.state, g_loss = g_step(self.state, jax.random.fold_in(key, 100))
            step += 1
            self.state["step"] = jnp.asarray(step, jnp.int32)

            if step % cfg.log_every == 0 or step == 1:
                logger.log_scalars({"step": step, "d_loss": float(d_loss), "g_loss": float(g_loss)})
                if progress:
                    print(f"ccgan step {step}/{cfg.niters} d={float(d_loss):.4f} g={float(g_loss):.4f}")
            if step % cfg.visualize_freq == 0:
                # sampling must run on ALL processes (globally-sharded state
                # under a multi-host mesh deadlocks if only process 0 enters
                # the jitted computation); only the PNG write is gated
                self._dump_visual_grid(step)
            if step % cfg.save_niters_freq == 0:
                self.save(step)

    def _dump_visual_grid(self, step: int) -> None:
        """Periodic EVAL-mode grid at visualize_freq (ref train_ccgan.py:
        679-686 saves a fixed-z y_fixed grid) — 6 quantile-spaced labels x 6
        z draws, watching the same eval-mode path the final sampling uses so
        a train/eval BN divergence is visible DURING training."""
        from ccdm_tpu.utils.viz import save_image_grid

        uniq = np.unique(np.asarray(jax.device_get(self.unique_labels)).reshape(-1))
        rows = np.quantile(uniq, np.linspace(0.05, 0.95, 6))
        y_visual = np.repeat(rows, 6).astype(np.float32)
        imgs, _ = self.sample_given_labels(y_visual, batch_size=len(y_visual), denorm=False)
        if jax.process_index() == 0:
            save_image_grid(
                np.clip(np.asarray(imgs) * 0.5 + 0.5, 0.0, 1.0),
                os.path.join(self.cfg.results_folder, f"sample_{step}.png"),
                nrow=6,
            )

    def sample_given_labels(self, given_labels: np.ndarray, batch_size: int = 500,
                            denorm: bool = True, to_numpy: bool = True):
        """netG(z, y2h(y)) batched sampling (train_ccgan.py:276-320)."""
        cfg = self.cfg
        labels = np.asarray(given_labels, np.float32).reshape(-1)
        n = len(labels)
        batch_size = min(batch_size, n)
        gvars = {"params": self.state["g_params"]}
        if self.state["g_stats"]:
            gvars["batch_stats"] = self.state["g_stats"]

        # compiled generator cached per batch_size, variables traced as an
        # argument — an inline jit would recompile on every per-label call
        # (same defect class as DMD sample_given_labels; fixed round 3)
        cached = getattr(self, "_gen_jit", None)
        if cached is None or cached[0] != batch_size:
            @jax.jit
            def gen(gv, key, y):
                z = jax.random.normal(key, (batch_size, cfg.dim_gan))
                return self.netG.apply(gv, z, self.fn_y2h(y), train=False)

            self._gen_jit = cached = (batch_size, gen)
        gen = cached[1]

        out, done = [], 0
        while done < n:
            chunk = labels[done:done + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad)])
            imgs = np.asarray(gen(gvars,
                                  jax.random.fold_in(jax.random.PRNGKey(9), done),
                                  jnp.asarray(chunk)))
            if pad:
                imgs = imgs[:-pad]
            if denorm:
                imgs = ((np.clip(imgs, -1, 1) * 0.5 + 0.5) * 255).astype(np.uint8)
            out.append(imgs)
            done += batch_size
        return np.concatenate(out, axis=0)[:n], given_labels

    def save(self, milestone) -> str:
        if jax.process_index() != 0:
            return ""
        return save_checkpoint(self.cfg.results_folder, f"ccgan-{milestone}",
                               jax.device_get(dict(self.state)))

    def load(self, milestone) -> None:
        tree = load_checkpoint(self.cfg.results_folder, f"ccgan-{milestone}",
                               jax.device_get(dict(self.state)))
        self.state = jax.device_put(tree, replicated(self.mesh))
