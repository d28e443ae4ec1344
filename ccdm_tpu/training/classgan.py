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


# --------------------------------------------------------------- trainer


from dataclasses import dataclass  # noqa: E402
from typing import Optional  # noqa: E402

import numpy as np  # noqa: E402
import optax  # noqa: E402


@dataclass
class ClassGANConfig:
    """Round-4 CLI reach for the StudioGAN-family baselines (VERDICT r3
    'next' #8 — ref `StudioGAN/main.py:198-201` + `worker.py` train loop).
    Class conditioning is one-hot through the existing SNGAN projection
    machinery (cBN gamma/beta Dense + projection Dense learn per-class
    rows), plus the D2D-CE / ADC auxiliary head on the D features."""

    num_classes: int = 10
    niters: int = 10000
    batch_size: int = 64
    num_D_steps: int = 1
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    dim_z: int = 128
    cond_loss: str = "d2dce"  # d2dce | adc | none (pure projection cGAN)
    lambda_cond: float = 1.0
    d2dce_embed_dim: int = 128
    use_DiffAugment: bool = False
    policy: str = "color,translation,cutout"
    save_niters_freq: int = 5000
    visualize_freq: int = 2000
    results_folder: str = "./classgan_results"
    log_every: int = 20
    seed: int = 2021


class ClassGANTrainer:
    """Hinge-loss class-conditional GAN with an optional StudioGAN
    conditional head, fully jitted; BN stats are global under pjit (the
    SyncBN answer, see module docstring)."""

    def __init__(self, netG, netD, netG_variables, netD_variables,
                 train_images: np.ndarray,  # uint8 NHWC
                 train_classes: np.ndarray,  # [N] int class ids
                 config: ClassGANConfig, mesh=None):
        import os

        from ccdm_tpu.parallel.mesh import create_mesh, replicated

        cfg = config
        self.cfg = cfg
        self.netG, self.netD = netG, netD
        self.mesh = mesh if mesh is not None else create_mesh()
        rep = replicated(self.mesh)
        self.train_images = jax.device_put(np.asarray(train_images), rep)
        self.train_classes = jax.device_put(
            np.asarray(train_classes, np.int32), rep)
        self.n = len(train_images)

        # conditional head on the D features (initialized from a real phi)
        self.head = None
        head_params = {}
        if cfg.cond_loss == "d2dce":
            self.head = D2DCEHead(cfg.d2dce_embed_dim, cfg.num_classes)
        elif cfg.cond_loss == "adc":
            self.head = ADCHead(cfg.num_classes)
        if self.head is not None:
            x0 = jnp.zeros((2,) + train_images.shape[1:], jnp.float32)
            y0 = jnp.zeros((2, cfg.num_classes), jnp.float32)
            _, phi0 = netD.apply(netD_variables, x0, y0, train=False,
                                 return_features=True)
            head_params = self.head.init(
                jax.random.PRNGKey(cfg.seed + 5), phi0)["params"]

        adam = lambda lr: optax.adam(lr, b1=0.5, b2=0.999)
        self.tx_g, self.tx_d = adam(cfg.lr_g), adam(cfg.lr_d)
        d_all = {"d": netD_variables["params"], "head": head_params}
        self.state = jax.device_put({
            "step": jnp.zeros((), jnp.int32),
            "g_params": netG_variables["params"],
            "g_stats": netG_variables.get("batch_stats", {}),
            "d_params": d_all,
            "d_stats": netD_variables.get("batch_stats", {}),
            "g_opt": self.tx_g.init(netG_variables["params"]),
            "d_opt": self.tx_d.init(d_all),
        }, rep)
        os.makedirs(cfg.results_folder, exist_ok=True)
        self._steps = None

    # ------------------------------------------------------------ helpers

    def _onehot(self, classes: jax.Array) -> jax.Array:
        return jax.nn.one_hot(classes, self.cfg.num_classes)

    def _d_apply(self, d_params, d_stats, x, classes, train):
        variables = {"params": d_params["d"]}
        if d_stats:
            variables["batch_stats"] = d_stats
        y = self._onehot(classes)
        if train:
            (out, phi), upd = self.netD.apply(
                variables, x, y, train=True, return_features=True,
                mutable=["batch_stats"])
            return out, phi, upd.get("batch_stats", d_stats)
        out, phi = self.netD.apply(variables, x, y, train=False,
                                   return_features=True)
        return out, phi, d_stats

    def _head_apply(self, d_params, phi):
        return self.head.apply({"params": d_params["head"]}, phi)

    def _cond_losses(self, d_params, phi_real, phi_fake, cls_real, cls_fake):
        """(d_cond, g_cond) for the configured conditional loss."""
        cfg = self.cfg
        if cfg.cond_loss == "d2dce":
            emb_r, proxies = self._head_apply(d_params, phi_real)
            emb_f, _ = self._head_apply(d_params, phi_fake)
            return (d2d_ce_loss(emb_r, proxies, cls_real),
                    d2d_ce_loss(emb_f, proxies, cls_fake))
        if cfg.cond_loss == "adc":
            lr_ = self._head_apply(d_params, phi_real)
            lf_ = self._head_apply(d_params, phi_fake)
            return (adc_d_loss(lr_, lf_, cls_real, cls_fake, cfg.num_classes),
                    adc_g_loss(lf_, cls_fake, cfg.num_classes))
        zero = jnp.zeros(())
        return zero, zero

    # -------------------------------------------------------------- steps

    def _build_steps(self):
        from ccdm_tpu.ops.image import normalize_images
        from ccdm_tpu.parallel.mesh import constrain_batch
        from ccdm_tpu.training.diffaugment import diff_augment

        cfg = self.cfg

        maybe_aug = ((lambda k, v: diff_augment(k, v, cfg.policy))
                     if cfg.use_DiffAugment else (lambda k, v: v))

        def d_step(state, key, images_bank):
            # images_bank rides as a traced jit argument — a closure-captured
            # bank lowers as an HLO constant and overflows the relayed
            # compile RPC at SA-64 size (see Trainer._make_batch)
            k_idx, k_cf, k_z, k_a1, k_a2 = jax.random.split(key, 5)
            idx = jax.random.randint(k_idx, (cfg.batch_size,), 0, self.n)
            real = normalize_images(images_bank[idx], to_neg_one_to_one=True)
            cls_real = self.train_classes[idx]
            cls_fake = jax.random.randint(k_cf, (cfg.batch_size,), 0, cfg.num_classes)
            real, cls_real, cls_fake = constrain_batch(self.mesh, real, cls_real, cls_fake)
            z = constrain_batch(self.mesh,
                                jax.random.normal(k_z, (cfg.batch_size, cfg.dim_z)))
            # train-mode fakes for the D step (BN train/eval parity, same
            # rationale as ccgan.py d_step)
            variables = {"params": state["g_params"]}
            if state["g_stats"]:
                variables["batch_stats"] = state["g_stats"]
            fake, g_upd = self.netG.apply(variables, z, self._onehot(cls_fake),
                                          train=True, mutable=["batch_stats"])
            fake = jax.lax.stop_gradient(fake)
            g_stats_d = g_upd.get("batch_stats", state["g_stats"])

            def loss_fn(d_params):
                stats = state["d_stats"]
                out_r, phi_r, stats = self._d_apply(
                    d_params, stats, maybe_aug(k_a1, real), cls_real, True)
                out_f, phi_f, stats = self._d_apply(
                    d_params, stats, maybe_aug(k_a2, fake), cls_fake, True)
                adv = jnp.mean(jax.nn.relu(1.0 - out_r)) + jnp.mean(jax.nn.relu(1.0 + out_f))
                d_cond, _ = self._cond_losses(d_params, phi_r, phi_f, cls_real, cls_fake)
                return adv + cfg.lambda_cond * d_cond, stats

            (loss, d_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["d_params"])
            upd, d_opt = self.tx_d.update(grads, state["d_opt"], state["d_params"])
            state = dict(state)
            state["d_params"] = optax.apply_updates(state["d_params"], upd)
            state["d_stats"] = d_stats
            state["g_stats"] = g_stats_d
            state["d_opt"] = d_opt
            return state, loss

        def g_step(state, key):
            k_cf, k_z, k_a = jax.random.split(key, 3)
            cls_fake = constrain_batch(
                self.mesh,
                jax.random.randint(k_cf, (cfg.batch_size,), 0, cfg.num_classes))
            z = constrain_batch(self.mesh,
                                jax.random.normal(k_z, (cfg.batch_size, cfg.dim_z)))

            def loss_fn(g_params):
                variables = {"params": g_params}
                if state["g_stats"]:
                    variables["batch_stats"] = state["g_stats"]
                fake, upd = self.netG.apply(variables, z, self._onehot(cls_fake),
                                            train=True, mutable=["batch_stats"])
                out_f, phi_f, _ = self._d_apply(state["d_params"], state["d_stats"],
                                                maybe_aug(k_a, fake), cls_fake, False)
                _, g_cond = self._cond_losses(state["d_params"], phi_f, phi_f,
                                              cls_fake, cls_fake)
                return -jnp.mean(out_f) + cfg.lambda_cond * g_cond, \
                    upd.get("batch_stats", state["g_stats"])

            (loss, g_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["g_params"])
            upd, g_opt = self.tx_g.update(grads, state["g_opt"], state["g_params"])
            state = dict(state)
            state["g_params"] = optax.apply_updates(state["g_params"], upd)
            state["g_stats"] = g_stats
            state["g_opt"] = g_opt
            return state, loss

        jit_d = jax.jit(d_step, donate_argnums=(0,))
        return (lambda s, k: jit_d(s, k, self.train_images),
                jax.jit(g_step, donate_argnums=(0,)))

    # -------------------------------------------------------------- train

    def train(self, progress: bool = True):
        import os

        from ccdm_tpu.utils.logging import TrainLogger

        cfg = self.cfg
        if self._steps is None:
            self._steps = self._build_steps()
        d_step, g_step = self._steps
        logger = TrainLogger(cfg.results_folder, cfg.niters)
        base = jax.random.PRNGKey(cfg.seed)
        start = int(jax.device_get(self.state["step"]))
        for step in range(start + 1, cfg.niters + 1):
            k = jax.random.fold_in(base, step)
            d_losses = []
            for j in range(cfg.num_D_steps):
                self.state, d_loss = d_step(self.state, jax.random.fold_in(k, j))
                d_losses.append(float(d_loss))
            self.state, g_loss = g_step(self.state, jax.random.fold_in(k, 101))
            self.state["step"] = jnp.asarray(step, jnp.int32)
            if step % cfg.log_every == 0:
                logger.log_scalars({"step": step, "d_loss": float(np.mean(d_losses)),
                                    "g_loss": float(g_loss)})
                if progress:
                    print(f"classgan step {step}/{cfg.niters} "
                          f"d={np.mean(d_losses):.4f} g={float(g_loss):.4f}")
            if step % cfg.visualize_freq == 0:
                self._dump_visual_grid(step)
            if step % cfg.save_niters_freq == 0:
                self.save(step)
        if cfg.niters % cfg.save_niters_freq != 0:
            self.save(cfg.niters)

    def _dump_visual_grid(self, step: int):
        import os

        from ccdm_tpu.utils.viz import save_image_grid

        cfg = self.cfg
        ncls = min(cfg.num_classes, 8)
        classes = np.repeat(np.arange(ncls), 6)
        imgs = self.sample_given_classes(classes, batch_size=len(classes))
        if jax.process_index() == 0:
            save_image_grid(np.clip(imgs / 255.0, 0.0, 1.0),
                            os.path.join(cfg.results_folder, f"sample_{step}.png"),
                            nrow=6)

    # ----------------------------------------------------------- sampling

    def sample_given_classes(self, classes: np.ndarray, batch_size: int = 200,
                             to_numpy: bool = True):
        """Eval-mode G samples for integer class ids; returns uint8 NHWC."""
        cfg = self.cfg
        n = len(classes)
        batch_size = min(batch_size, n)
        if not hasattr(self, "_sample_fn"):
            def _sample(g_params, g_stats, z, y1h):
                variables = {"params": g_params}
                if g_stats:
                    variables["batch_stats"] = g_stats
                fake = self.netG.apply(variables, z, y1h, train=False)
                return jnp.clip(fake * 0.5 + 0.5, 0.0, 1.0) * 255.0
            self._sample_fn = jax.jit(_sample)
        out = []
        key = jax.random.PRNGKey(cfg.seed + 999)
        pad = (-n) % batch_size
        cls_pad = np.concatenate([classes, classes[:pad]]) if pad else classes
        for s in range(0, len(cls_pad), batch_size):
            k = jax.random.fold_in(key, s)
            z = jax.random.normal(k, (batch_size, cfg.dim_z))
            y1h = self._onehot(jnp.asarray(cls_pad[s:s + batch_size], jnp.int32))
            out.append(np.asarray(self._sample_fn(
                self.state["g_params"], self.state["g_stats"], z, y1h)))
        imgs = np.concatenate(out)[:n].astype(np.uint8)
        return imgs if to_numpy else jnp.asarray(imgs)

    # --------------------------------------------------------- checkpoint

    def save(self, milestone) -> str:
        from ccdm_tpu.utils.ckpt import save_checkpoint

        return save_checkpoint(self.cfg.results_folder, f"classgan-{milestone}",
                               jax.device_get(self.state))

    def load(self, milestone) -> None:
        from ccdm_tpu.utils.ckpt import load_checkpoint

        self.state = jax.device_put(
            load_checkpoint(self.cfg.results_folder, f"classgan-{milestone}",
                            target=jax.device_get(self.state)))
