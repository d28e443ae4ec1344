"""Tests for the KV logger and the t-aware noisy classifier path."""

import csv
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.utils.kvlogger import KVLogger


def test_kvlogger_means_and_backends(tmp_path):
    lg = KVLogger(str(tmp_path), formats=("json", "csv"))
    lg.logkv("loss", 1.0)
    lg.logkv("loss", 3.0)
    lg.logkv("lr", 0.1)
    kvs = lg.dumpkvs()
    assert kvs["loss"] == pytest.approx(2.0)
    with open(tmp_path / "progress.jsonl") as f:
        row = json.loads(f.readline())
    assert row["loss"] == pytest.approx(2.0)
    # second dump with a new key rewrites the csv header
    lg.logkv("loss", 5.0)
    lg.logkv("grad_norm", 7.0)
    lg.dumpkvs()
    with open(tmp_path / "progress.csv") as f:
        rows = list(csv.DictReader(f))
    assert "grad_norm" in rows[-1]
    assert float(rows[-1]["loss"]) == pytest.approx(5.0)


@pytest.mark.slow
def test_noisy_classifier_trains_and_guides(tmp_path, rng):
    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.diffusion.guided import (
        classifier_grad_fn,
        classifier_guided_sample,
        make_fn_class_embed,
    )
    from ccdm_tpu.eval.backbones import NoisyClassifier
    from ccdm_tpu.eval.train_backbones import train_noisy_classifier
    from ccdm_tpu.models import Unet

    IMG, NC = 16, 1
    labels = rng.integers(0, 3, 48)
    images = np.clip(labels[:, None, None, None] * 100 + 20
                     + rng.normal(0, 10, (48, IMG, IMG, NC)), 0, 255).astype(np.uint8)
    cls_vars = train_noisy_classifier(images, labels, 3, timesteps=20,
                                      epochs=2, batch_size=16)
    cls = NoisyClassifier(3)
    logits = cls.apply(cls_vars, jnp.zeros((2, IMG, IMG, NC)), jnp.zeros((2,), jnp.int32),
                       train=False)
    assert logits.shape == (2, 3)

    m = Unet(dim=8, dim_mults=(1, 2), in_channels=NC, attn_heads=1, attn_dim_head=8)
    k = jax.random.PRNGKey(0)
    v = m.init(k, jnp.zeros((2, IMG, IMG, NC)), jnp.zeros((2,), jnp.int32),
               jnp.zeros((2, 128)), None, train=False)
    diff = GaussianDiffusion(m.apply, DiffusionConfig(image_size=IMG, channels=NC,
                                                      timesteps=20, sampling_timesteps=3))
    cond_fn = classifier_grad_fn(cls.apply, cls_vars, takes_t=True)
    classes = jnp.array([0, 2])
    out = classifier_guided_sample(diff, v, k, make_fn_class_embed(3, 128)(classes),
                                   classes, cond_fn, guidance_scale=1.0,
                                   sampling_timesteps=3)
    assert out.shape == (2, IMG, IMG, NC)
    assert np.all(np.isfinite(np.asarray(out)))


def test_kvlogger_tb_backend(tmp_path):
    """'tb' format writes TensorBoard event files (ADM-G logger parity)."""
    import glob
    import os

    from ccdm_tpu.utils.kvlogger import KVLogger

    lg = KVLogger(str(tmp_path), formats=("json", "tb"))
    lg.logkv("loss", 1.0)
    lg.logkv("step", 10)
    lg.dumpkvs()
    lg.logkv("loss", 0.5)
    lg.logkv("step", 20)
    lg.dumpkvs()
    events = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.*"))
    assert events, "no TensorBoard event files written"
    assert os.path.getsize(events[0]) > 0


def test_trainlogger_tb_backend(tmp_path):
    import glob
    import os

    from ccdm_tpu.utils.logging import TrainLogger

    lg = TrainLogger(str(tmp_path), 100, tb=True)
    lg.log_scalars({"step": 1, "loss": 2.0, "mfu_pct": 33.3})
    events = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.*"))
    assert events and os.path.getsize(events[0]) > 0
