"""Auxiliary label-regressor training (reference `train_aux_net.py:53-175`).

Trains a VGG/ResNet regressor x -> y on CLEAN normalized images with MSE,
SGD momentum 0.9, weight decay 1e-4, lr 0.01 decayed 10x at the reference's
epochs — exactly the reference loop (which, despite its docstring, never
noises the inputs; the beta-schedule helpers at its top are dead code). The
trained net feeds the elastic aux loss (`GaussianDiffusion._elastic_aux`,
vanilla diffusion.py:444-471) where it IS applied to noisy x_t_hat — that
train/apply distribution gap is the reference's own semantics, kept.

`get_aux_net` is the train-or-load seam used by main.py when
`--lambda_aux > 0` (the reference keeps the equivalent block commented out
at vanilla main.py:287-308; here it is live and cached under
<setting_folder>/aux_models).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ccdm_tpu.models.aux_net import make_aux_net
from ccdm_tpu.ops.image import normalize_images
from ccdm_tpu.utils.ckpt import checkpoint_exists, load_checkpoint, save_checkpoint


def train_aux_net(
    images_u8: np.ndarray,
    labels_norm: np.ndarray,
    name: str = "ResNet34",
    epochs: int = 200,
    batch_size: int = 256,
    lr_base: float = 0.01,
    lr_decay_epochs=(50, 120),
    weight_decay: float = 1e-4,
    seed: int = 0,
    use_t_emb: bool = False,
    log_every: int = 20,
) -> dict:
    """Train the aux regressor; returns its flax variables."""
    assert images_u8.dtype == np.uint8 and images_u8.max() > 1
    labels = np.asarray(labels_norm, np.float32).reshape(-1)
    assert labels.min() >= 0 and labels.max() <= 1.0
    n = len(images_u8)
    batch_size = min(batch_size, n)
    steps_per_epoch = max(n // batch_size, 1)

    net = make_aux_net(name, use_t_emb=use_t_emb)
    key = jax.random.PRNGKey(seed)
    sample = jnp.zeros((2,) + images_u8.shape[1:], jnp.float32)
    variables = net.init(key, sample, jnp.zeros((2,), jnp.int32), train=False)

    boundaries = {int(e * steps_per_epoch): 0.1 for e in lr_decay_epochs}
    sched = optax.piecewise_constant_schedule(lr_base, boundaries)
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(sched, momentum=0.9),
    )
    opt_state = tx.init(variables["params"])

    images_dev = jax.device_put(images_u8)
    labels_dev = jax.device_put(labels)

    @jax.jit
    def step(params, batch_stats, opt_state, k):
        idx = jax.random.randint(k, (batch_size,), 0, n)
        # reference trains on [0,1] clean images (train_aux_net.py:124-127)
        x = normalize_images(images_dev[idx], to_neg_one_to_one=False)
        y = labels_dev[idx]

        def loss_fn(p):
            out, updates = net.apply(
                {"params": p, "batch_stats": batch_stats}, x, None, train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean((out.reshape(-1) - y) ** 2), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, updates["batch_stats"], opt_state, loss

    params, batch_stats = variables["params"], variables["batch_stats"]
    for epoch in range(epochs):
        for s in range(steps_per_epoch):
            k = jax.random.fold_in(key, epoch * steps_per_epoch + s)
            params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, k)
        if log_every and (epoch + 1) % log_every == 0:
            print(f"\r [aux {name}] epoch {epoch+1}/{epochs} loss {float(loss):.5f}")
    return {"params": params, "batch_stats": batch_stats}


def get_aux_net(bundle, setting_folder: str, name: str = "ResNet34",
                epochs: int = 200, batch_size: int = 256, seed: int = 0):
    """Train-or-load the aux net; returns (apply_fn(x_t_hat, t) -> [B,1]).

    The returned closure runs the net FROZEN in eval mode (the reference
    calls net_aux.eval() inside p_losses) — safe to close over in a jitted
    train step.
    """
    aux_dir = os.path.join(setting_folder, "aux_models")
    os.makedirs(aux_dir, exist_ok=True)
    tag = f"aux_{name}_e{epochs}_seed{seed}"
    if checkpoint_exists(aux_dir, tag):
        variables = load_checkpoint(aux_dir, tag)
        print(f" aux net: loaded cached '{tag}'")
    else:
        variables = train_aux_net(bundle.images, bundle.labels_norm, name=name,
                                  epochs=epochs, batch_size=batch_size, seed=seed)
        save_checkpoint(aux_dir, tag, jax.device_get(variables))
    net = make_aux_net(name)
    variables = jax.device_put(variables)

    def apply(x_t_hat, t):
        return net.apply(variables, x_t_hat, t, train=False)

    return apply


if __name__ == "__main__":  # standalone pretraining CLI (ref train_aux_net.py)
    import argparse

    from ccdm_tpu.data import load_dataset

    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="./")
    p.add_argument("--data_name", type=str, default="synthetic")
    p.add_argument("--data_path", type=str, default="./datasets")
    p.add_argument("--setting_name", type=str, default="Setup1")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--num_channels", type=int, default=3)
    p.add_argument("--min_label", type=float, default=0.0)
    p.add_argument("--max_label", type=float, default=90.0)
    p.add_argument("--net_aux", type=str, default="ResNet34")
    p.add_argument("--epoch_aux", type=int, default=200)
    p.add_argument("--batch_size_aux", type=int, default=256)
    p.add_argument("--seed", type=int, default=111)
    a = p.parse_args()

    kw = dict(image_size=a.image_size)
    if a.data_name == "synthetic":
        kw.update(channels=a.num_channels)
    else:
        kw.update(min_label=a.min_label, max_label=a.max_label)
    bundle = load_dataset(a.data_name, a.data_path, **kw)
    folder = os.path.join(a.root_path, "output",
                          f"{a.data_name}_{a.image_size}", a.setting_name)
    os.makedirs(folder, exist_ok=True)
    get_aux_net(bundle, folder, name=a.net_aux, epochs=a.epoch_aux,
                batch_size=a.batch_size_aux, seed=a.seed)
    print(" aux net ready")
