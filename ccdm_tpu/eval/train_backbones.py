"""Training loops for the evaluation backbones (train-or-load).

The reference distributes its eval checkpoints by download only
(`README.md:130-131`); parity here means retraining from the specs
(SURVEY.md §7.3-7): an autoencoder whose encoder is the SFID feature
extractor, a ResNet34 classifier over binned labels (Diversity entropy), and
a ResNet34 regressor (Label Score). Same train-or-load checkpoint discovery
as the ILI pipeline.
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ccdm_tpu.eval.backbones import AEDecoder, AEEncoder, ResNetEval
from ccdm_tpu.ops.image import normalize_images
from ccdm_tpu.utils.ckpt import checkpoint_exists, load_checkpoint, save_checkpoint


def _train_loop(step_fn, params_and_state, n_steps: int, key, log_every=200, tag=""):
    state = params_and_state
    for i in range(n_steps):
        state, loss = step_fn(state, jax.random.fold_in(key, i))
        if log_every and (i + 1) % log_every == 0:
            print(f"\r [{tag}] step {i+1}/{n_steps} loss {float(loss):.5f}")
    return state


def train_autoencoder(
    images_u8: np.ndarray, dim_bottleneck: int = 512, ch: int = 64,
    epochs: int = 10, batch_size: int = 128, lr: float = 1e-4, seed: int = 0,
) -> dict:
    """AE for SFID features (vanilla models/autoencoder.py; trained with
    pixel MSE). Returns encoder variables."""
    n = len(images_u8)
    batch_size = min(batch_size, n)
    steps = max(n // batch_size, 1) * epochs
    enc = AEEncoder(dim_bottleneck, ch)
    dec = AEDecoder(ch, nc=images_u8.shape[-1], init_size=images_u8.shape[1] // 16)
    key = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((2,) + images_u8.shape[1:], jnp.float32)
    ev = enc.init(key, x0, train=False)
    dv = dec.init(key, enc.apply(ev, x0, train=False), train=False)
    tx = optax.adam(lr)
    imgs = jax.device_put(np.asarray(images_u8))

    @jax.jit
    def step(state, k):
        (ep, es, dp, ds, opt) = state
        idx = jax.random.randint(k, (batch_size,), 0, n)
        x = normalize_images(imgs[idx], to_neg_one_to_one=True)

        def loss_fn(params):
            ep_, dp_ = params
            f, eupd = enc.apply({"params": ep_, "batch_stats": es}, x, train=True,
                                mutable=["batch_stats"])
            xh, dupd = dec.apply({"params": dp_, "batch_stats": ds}, f, train=True,
                                 mutable=["batch_stats"])
            return jnp.mean((xh - x) ** 2), (eupd["batch_stats"], dupd["batch_stats"])

        (loss, (es2, ds2)), grads = jax.value_and_grad(loss_fn, has_aux=True)((ep, dp))
        upd, opt = tx.update(grads, opt, (ep, dp))
        ep, dp = optax.apply_updates((ep, dp), upd)
        return (ep, es2, dp, ds2, opt), loss

    state = (ev["params"], ev["batch_stats"], dv["params"], dv["batch_stats"],
             tx.init((ev["params"], dv["params"])))
    state = _train_loop(step, state, steps, key, tag="ae")
    return {"params": state[0], "batch_stats": state[1]}


def train_eval_resnet(
    images_u8: np.ndarray, targets: np.ndarray, mode: str,
    num_outputs: int, epochs: int = 20, batch_size: int = 128,
    lr: float = 0.01, seed: int = 0,
) -> dict:
    """ResNet34 eval net: mode='class' (int targets) or 'regre' ([0,1])."""
    n = len(images_u8)
    batch_size = min(batch_size, n)
    steps = max(n // batch_size, 1) * epochs
    net = ResNetEval(num_outputs, mode)
    key = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((2,) + images_u8.shape[1:], jnp.float32)
    variables = net.init(key, x0, train=False)
    if mode == "regre":
        # start the relu head LIVE at the target mean: a zero-bias init can
        # drive every pre-activation negative within the first SGD steps and
        # relu's zero gradient pins the net at predict-0 forever
        p = dict(variables["params"])
        head = dict(p["head"])
        head["bias"] = head["bias"] + jnp.float32(
            np.mean(np.asarray(targets, np.float32)))
        p["head"] = head
        variables = {"params": p, "batch_stats": variables["batch_stats"]}
    sched = optax.piecewise_constant_schedule(lr, {int(steps * 0.5): 0.1, int(steps * 0.75): 0.1})
    tx = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(sched, momentum=0.9))
    imgs = jax.device_put(np.asarray(images_u8))
    tgt = jax.device_put(
        np.asarray(targets, np.int32 if mode == "class" else np.float32)
    )

    @jax.jit
    def step(state, k):
        params, stats, opt = state
        idx = jax.random.randint(k, (batch_size,), 0, n)
        x = normalize_images(imgs[idx], to_neg_one_to_one=True)
        y = tgt[idx]

        def loss_fn(p):
            (out, _), upd = net.apply({"params": p, "batch_stats": stats}, x,
                                      train=True, mutable=["batch_stats"],
                                      leaky_head=(mode == "regre"))
            if mode == "class":
                loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(out, y))
            else:
                loss = jnp.mean((out.reshape(-1) - y.reshape(-1)) ** 2)
            return loss, upd["batch_stats"]

        (loss, stats2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), stats2, opt), loss

    state = (variables["params"], variables["batch_stats"], tx.init(variables["params"]))
    state = _train_loop(step, state, steps, key, tag=f"eval_{mode}")
    return {"params": state[0], "batch_stats": state[1]}


def train_noisy_classifier(
    images_u8: np.ndarray, class_targets: np.ndarray, num_classes: int,
    timesteps: int = 1000, beta_schedule: str = "cosine",
    epochs: int = 20, batch_size: int = 128, lr: float = 3e-4, seed: int = 0,
) -> dict:
    """Train the t-aware classifier on q_sample'd noisy images (ADM-G
    classifier_train.py semantics): x_t at t~U[0,T), cross-entropy on the
    class label. Returns variables for NoisyClassifier."""
    from ccdm_tpu.eval.backbones import NoisyClassifier
    from ccdm_tpu.ops.schedule import make_schedule, q_sample

    n = len(images_u8)
    batch_size = min(batch_size, n)
    steps = max(n // batch_size, 1) * epochs
    sched = make_schedule(timesteps, beta_schedule, "pred_noise")
    net = NoisyClassifier(num_classes)
    key = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((2,) + images_u8.shape[1:], jnp.float32)
    variables = net.init(key, x0, jnp.zeros((2,), jnp.int32), train=False)
    tx = optax.adamw(lr, weight_decay=0.05)
    imgs = jax.device_put(np.asarray(images_u8))
    tgt = jax.device_put(np.asarray(class_targets, np.int32))

    @jax.jit
    def step(state, k):
        params, stats, opt = state
        k_idx, k_t, k_noise = jax.random.split(k, 3)
        idx = jax.random.randint(k_idx, (batch_size,), 0, n)
        x = normalize_images(imgs[idx], to_neg_one_to_one=True)
        t = jax.random.randint(k_t, (batch_size,), 0, timesteps)
        noise = jax.random.normal(k_noise, x.shape)
        x_t = q_sample(sched, x, t, noise)
        y = tgt[idx]

        def loss_fn(p):
            logits, upd = net.apply({"params": p, "batch_stats": stats}, x_t, t,
                                    train=True, mutable=["batch_stats"])
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, y)), upd["batch_stats"]

        (loss, stats2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), stats2, opt), loss

    state = (variables["params"], variables["batch_stats"], tx.init(variables["params"]))
    state = _train_loop(step, state, steps, key, tag="noisy_cls")
    return {"params": state[0], "batch_stats": state[1]}


def bin_labels_to_classes(raw: np.ndarray, num_classes: int,
                          ref: np.ndarray = None) -> np.ndarray:
    """Bin raw continuous labels into num_classes equal-frequency classes
    (the CCGM analog of StudioGAN's discrete class ids).

    Boundaries come from `ref` (default: raw itself) so real and fake
    labels can share one binning — pass the real labels as ref when
    classifying fakes."""
    uniq = np.sort(np.unique(raw if ref is None else ref))
    chunks = np.array_split(uniq, num_classes)
    uppers = np.array([c[-1] for c in chunks[:-1] if len(c)])  # incl. upper edges
    return np.searchsorted(uppers, np.asarray(raw), side="left").astype(np.int64)


def get_eval_models(bundle, eval_ckpt_path: str, num_classes: int,
                    epochs_ae: int = 10, epochs_cnn: int = 20, seed: int = 0):
    """Train-or-load the three eval backbones for a dataset bundle.

    Returns dict with (module, variables) for 'fid' (AE encoder),
    'ls' (regre), 'div' (class)."""
    os.makedirs(eval_ckpt_path, exist_ok=True)
    img = bundle.eval_images if bundle.eval_images is not None else bundle.images
    raw = bundle.eval_labels_raw if bundle.eval_labels_raw is not None else bundle.labels_raw
    norm = bundle.fn_normalize(raw)

    tag = f"evalnets_{bundle.name}_{bundle.image_size}_seed{seed}"
    if checkpoint_exists(eval_ckpt_path, tag):
        stored = load_checkpoint(eval_ckpt_path, tag)
        print(f" eval backbones: LOADED pinned checkpoint '{tag}' from {eval_ckpt_path}")
    else:
        print(f" eval backbones: no pinned checkpoint '{tag}' in {eval_ckpt_path} — "
              "training now. SFID/LS/Diversity are only comparable across runs "
              "that share this checkpoint (it is persisted after training).")
        ae_vars = train_autoencoder(img, epochs=epochs_ae, seed=seed)
        cls_targets = bin_labels_to_classes(raw, num_classes)
        cls_vars = train_eval_resnet(img, cls_targets, "class", num_classes,
                                     epochs=epochs_cnn, seed=seed + 1)
        reg_vars = train_eval_resnet(img, norm, "regre", 1,
                                     epochs=epochs_cnn, seed=seed + 2)
        stored = {"ae": jax.device_get(ae_vars), "cls": jax.device_get(cls_vars),
                  "reg": jax.device_get(reg_vars)}
        save_checkpoint(eval_ckpt_path, tag, stored)

    enc = AEEncoder()
    cls = ResNetEval(num_classes, "class")
    reg = ResNetEval(1, "regre")
    return {
        "fid": (enc, stored["ae"]),
        "div": (cls, stored["cls"]),
        "ls": (reg, stored["reg"]),
        # identity stamp: any metric number is only comparable to numbers
        # produced under the same backbone fingerprint (VERDICT r1 weak-8)
        "fingerprint": f"{tag}:{backbone_fingerprint(stored)}",
    }


def backbone_fingerprint(stored: dict) -> str:
    """Short content hash of the backbone parameters."""
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(stored):
        h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()[:12]
