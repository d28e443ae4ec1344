"""End-to-end trainer tests on a tiny synthetic dataset (CPU, 8 virtual devs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
from ccdm_tpu.embedding import make_fn_y2h
from ccdm_tpu.models import Unet
from ccdm_tpu.training import Trainer, TrainerConfig
from ccdm_tpu.training.hyperparams import compute_vicinal_hyperparams
from ccdm_tpu.training.vicinity import (
    sample_target_labels,
    select_vicinity_indices,
    select_vicinity_indices_sliced,
)

IMG = 16
NC = 1


def synthetic_dataset(n=128, seed=0):
    """Images whose mean brightness tracks the label."""
    rng = np.random.default_rng(seed)
    labels = rng.choice(np.linspace(0.1, 0.9, 16), size=n)
    base = (labels[:, None, None, None] * 255).astype(np.float32)
    noise = rng.normal(0, 20, (n, IMG, IMG, NC))
    images = np.clip(base + noise, 0, 255).astype(np.uint8)
    return images, labels.astype(np.float32)


def build_trainer(tmp_path, vicinity_type="hv", steps=8, **cfg_kw):
    images, labels = synthetic_dataset()
    model = Unet(dim=8, dim_mults=(1, 2), in_channels=NC, attn_heads=1, attn_dim_head=8)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, jnp.zeros((2, IMG, IMG, NC)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 128)), None, train=False,
    )
    dcfg = DiffusionConfig(
        image_size=IMG, channels=NC, timesteps=50, sampling_timesteps=4,
        objective="pred_x0", vicinity_type=vicinity_type,
    )
    diffusion = GaussianDiffusion(model.apply, dcfg)
    tcfg = TrainerConfig(
        data_name="synthetic", train_batch_size=16, train_num_steps=steps,
        results_folder=str(tmp_path), vicinity_type=vicinity_type,
        sample_every=10**9, save_every=10**9, log_every=1,
        ema_update_after_step=2, ema_update_every=1,
        **cfg_kw,
    )
    return Trainer(diffusion, variables, images, labels, tcfg), model


def test_vicinity_sampling_respects_kappa(rng):
    labels = jnp.asarray(rng.uniform(0, 1, (200, 1)).astype(np.float32))
    targets = jnp.asarray(rng.uniform(0.2, 0.8, (16, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    idx = select_vicinity_indices(key, targets, labels, 0.05, "hv")
    chosen = np.asarray(labels[idx])
    dist = np.abs(chosen - np.asarray(targets))
    # with 200 uniform labels, every 0.05-vicinity is almost surely non-empty
    assert np.all(dist <= 0.05 + 1e-6)


def test_vicinity_sampling_nn_fallback(rng):
    # labels far from targets: vicinity empty -> nearest neighbor
    labels = jnp.asarray(np.full((50, 1), 0.9, np.float32))
    targets = jnp.asarray(np.full((4, 1), 0.1, np.float32))
    idx = select_vicinity_indices(jax.random.PRNGKey(0), targets, labels, 0.01, "hv")
    assert np.all(np.asarray(idx) >= 0)
    np.testing.assert_allclose(np.asarray(labels[idx]), 0.9)


def test_sliced_vicinity_selects_from_top_voted(rng):
    """Chosen indices must carry vote counts no lower than the 10th-highest
    (the reference picks uniformly among the top-10 candidates,
    trainer.py:390-402 — closeness in full label space is NOT guaranteed)."""
    labels_np = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    labels = jnp.asarray(labels_np)
    targets = labels[:8]
    key = jax.random.PRNGKey(1)
    idx = np.asarray(select_vicinity_indices_sliced(key, targets, labels, 0.05, "gaussian", 4))
    # recompute votes with the same key-derived projections
    from ccdm_tpu.ops.vicinal import random_projection_vectors

    k_vec, _, _ = jax.random.split(key, 3)
    vecs = np.asarray(random_projection_vectors(k_vec, "gaussian", 3, 4))
    vn = np.linalg.norm(vecs, axis=-1)
    vu = vecs / (vn[:, None] + 1e-8)
    pt = labels_np @ vu.T  # [N, M]
    pq = labels_np[:8] @ vu.T  # [B, M]
    votes = (np.abs(pt[None] - pq[:, None]) <= (0.05 * vn)[None, None]).sum(-1)  # [B, N]
    kth = np.sort(votes, axis=1)[:, -10]
    for j in range(8):
        assert votes[j, idx[j]] >= max(kth[j], 1), (j, votes[j, idx[j]], kth[j])


def test_target_label_noise_scale():
    # single unique label -> residuals ARE the kernel noise
    uniq = jnp.asarray(np.array([[0.5]], dtype=np.float32))
    t = sample_target_labels(jax.random.PRNGKey(2), uniq, 4096, 0.05)
    assert t.shape == (4096, 1)
    resid = np.asarray(t) - 0.5
    assert abs(resid.mean()) < 0.01
    assert 0.045 < resid.std() < 0.055


def test_hyperparams_rule_of_thumb():
    labels = np.linspace(0, 1, 11)  # gaps of 0.1
    sigma, kappa = compute_vicinal_hyperparams(labels, "hv", kappa=-2.0)
    assert kappa == pytest.approx(0.2, rel=1e-6)  # |−2| * max gap 0.1
    want_sigma = 1.06 * np.std(labels) * 11 ** (-0.2)
    assert sigma == pytest.approx(want_sigma)
    # soft vicinity returns the same raw radius (single-convention kappa)
    _, kappa_soft = compute_vicinal_hyperparams(labels, "sv", kappa=-2.0)
    assert kappa_soft == pytest.approx(0.2, rel=1e-6)


def test_hyperparams_percentile():
    labels = np.random.default_rng(0).uniform(0, 1, 500)
    sigma, kappa = compute_vicinal_hyperparams(labels, "hv", hyperparameter="percentile", percentile=5.0)
    assert 0 < kappa < 0.2
    assert sigma == pytest.approx(kappa / 3)


@pytest.mark.parametrize("vicinity_type", [
    "hv",
    pytest.param("shv", marks=pytest.mark.slow),
    pytest.param("none", marks=pytest.mark.slow),
])
def test_train_loop_runs(tmp_path, vicinity_type):
    trainer, _ = build_trainer(tmp_path / vicinity_type, vicinity_type, steps=3)
    trainer.train(make_fn_y2h(128), progress=False)
    assert int(trainer.state.step) == 3
    assert os.path.exists(os.path.join(trainer.config.results_folder, "train_log.jsonl"))


@pytest.mark.slow  # convergence check is nightly material (~34s compile-heavy)
def test_train_loss_decreases(tmp_path):
    trainer, _ = build_trainer(tmp_path, "hv", steps=30)
    fn_y2h = make_fn_y2h(128)
    step_fn = trainer._build_train_step(fn_y2h)
    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(30):
        trainer.state, loss = step_fn(trainer.state, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), f"loss did not decrease: {losses}"


@pytest.mark.slow  # vanilla-mode semantics also pinned by unit vicinal tests
def test_vanilla_target_mode(tmp_path):
    trainer, _ = build_trainer(
        tmp_path, "sv", steps=3, condition_on_target=True, vicinal_mode="target",
    )
    trainer.train(make_fn_y2h(128), progress=False)
    assert int(trainer.state.step) == 3


def test_save_load_roundtrip(tmp_path):
    trainer, _ = build_trainer(tmp_path, "hv", steps=2)
    trainer.train(make_fn_y2h(128), progress=False)
    path = trainer.save(2)
    assert path
    params_before = jax.device_get(trainer.state.params)
    # perturb then reload
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(lambda p: p * 0, trainer.state.params)
    )
    trainer.load(2)
    params_after = jax.device_get(trainer.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(params_before), jax.tree_util.tree_leaves(params_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(trainer.state.step) == 2


def test_sample_given_labels(tmp_path):
    trainer, _ = build_trainer(tmp_path, "hv", steps=1)
    trainer.train(make_fn_y2h(128), progress=False)
    labels = np.linspace(0.1, 0.9, 4).astype(np.float32)
    imgs, ret = trainer.sample_given_labels(
        labels, make_fn_y2h(128), batch_size=4, sampler="ddim",
        cond_scale=1.5, sample_timesteps=3,
    )
    assert imgs.shape == (4, IMG, IMG, NC)
    assert imgs.dtype == np.uint8


def test_train_step_does_not_embed_dataset_as_constant(tmp_path):
    """Regression (r5 SA-64 incident): the jitted train step must take the
    (images, labels, uniques) bank as ARGUMENTS. Closure-captured device
    arrays lower as HLO constants, and on relayed-TPU setups the compile
    RPC then ships the whole dataset (SteeringAngle's 123 MB bank ->
    HTTP 413). Proxy assertion: with an 8 MB bank and a tiny model, the
    lowered HLO text must stay far below the bank size — an embedded
    constant would dominate it."""
    rng = np.random.default_rng(0)
    n = 2048  # 2048 x 32x32x4 u8 = 8 MB
    labels = rng.uniform(0.05, 0.95, n).astype(np.float32)
    images = rng.integers(2, 255, (n, 32, 32, 4), dtype=np.uint8)
    model = Unet(dim=8, dim_mults=(1, 2), in_channels=4, attn_heads=1,
                 attn_dim_head=8)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 4)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 128)), None, train=False,
    )
    dcfg = DiffusionConfig(image_size=32, channels=4, timesteps=50,
                           objective="pred_x0", vicinity_type="hv")
    diffusion = GaussianDiffusion(model.apply, dcfg)
    tcfg = TrainerConfig(data_name="synthetic", train_batch_size=8,
                         train_num_steps=1, results_folder=str(tmp_path),
                         vicinity_type="hv", sample_every=10**9,
                         save_every=10**9)
    trainer = Trainer(diffusion, variables, images, labels, tcfg)
    step_fn = trainer._build_train_step(make_fn_y2h(128))
    txt = step_fn.lower(trainer.state, jax.random.PRNGKey(1)).as_text()
    bank_bytes = images.nbytes
    assert len(txt) < bank_bytes // 2, \
        f"HLO text {len(txt)}B vs bank {bank_bytes}B — dataset embedded?"
    # and the bank arrives as a u8 parameter of the entry computation
    # (StableHLO/MLIR prints tensor<...xui8>, classic HLO u8[...])
    assert "2048x32x32x4xui8" in txt or "u8[2048,32,32,4]" in txt


def test_sample_precast_bf16_is_pure_bytes_optimization(tmp_path):
    """`--samp_precast_bf16` (r5 sampler lever): one DDIM step without CFG
    is a single forward pass, so the precast may differ from f32-weight
    compute only by bf16 weight rounding inside the fused blocks — a few
    uint8 counts, not a different image. (Multi-step CFG sampling on an
    UNTRAINED net chaotically amplifies any rounding, so the bound is
    asserted at the single-forward level where it is meaningful.)"""
    from ccdm_tpu.training.state import precast_sampling_params

    images, labels = synthetic_dataset()
    model = Unet(dim=8, dim_mults=(1, 2), in_channels=NC, attn_heads=1,
                 attn_dim_head=8, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, IMG, IMG, NC)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 128)), None, train=False,
    )
    dcfg = DiffusionConfig(image_size=IMG, channels=NC, timesteps=50,
                           sampling_timesteps=4, objective="pred_x0",
                           vicinity_type="hv")
    diffusion = GaussianDiffusion(model.apply, dcfg)
    tcfg = TrainerConfig(data_name="synthetic", train_batch_size=16,
                         train_num_steps=1, results_folder=str(tmp_path),
                         vicinity_type="hv", sample_every=10**9,
                         save_every=10**9, ema_update_after_step=0,
                         ema_update_every=1)
    trainer = Trainer(diffusion, variables, images, labels, tcfg)

    ys = np.linspace(0.1, 0.9, 2).astype(np.float32)
    a, _ = trainer.sample_given_labels(ys, make_fn_y2h(128), batch_size=2,
                                       cond_scale=1.0, sample_timesteps=1)
    trainer.config.sample_precast_bf16 = True
    b, _ = trainer.sample_given_labels(ys, make_fn_y2h(128), batch_size=2,
                                       cond_scale=1.0, sample_timesteps=1)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 8

    # only f32 KERNEL leaves are cast; 1-D f32 (norm scales/biases),
    # ints and bf16 leaves pass through untouched
    cast = precast_sampling_params(
        {"params": {"w": jnp.ones((2, 2), jnp.float32),
                    "s": jnp.ones((2,), jnp.float32),
                    "n": jnp.ones((2,), jnp.int32),
                    "h": jnp.ones((2, 2), jnp.bfloat16)}})
    assert cast["params"]["w"].dtype == jnp.bfloat16
    assert cast["params"]["s"].dtype == jnp.float32
    assert cast["params"]["n"].dtype == jnp.int32
    assert cast["params"]["h"].dtype == jnp.bfloat16


@pytest.mark.slow
def test_rng_streams_batch_vs_loss_distinct(tmp_path, monkeypatch):
    """Regression (round-1 VERDICT): loss_fn must pass DISTINCT keys to
    _make_batch and diffusion.loss — with threefry, split(key,3) equals
    split(key,6)[:3], so reusing the step key makes the CFG drop mask
    bit-identical to the vicinity-selection uniforms."""
    trainer, _ = build_trainer(tmp_path, vicinity_type="hv", steps=1)
    seen = {}
    orig_batch = trainer._make_batch
    orig_loss = trainer.diffusion.loss

    def spy_batch(key, fn_y2h, *a, **kw):
        seen["batch"] = key
        return orig_batch(key, fn_y2h, *a, **kw)

    def spy_loss(variables, key, *a, **kw):
        seen["loss"] = key
        return orig_loss(variables, key, *a, **kw)

    monkeypatch.setattr(trainer, "_make_batch", spy_batch)
    monkeypatch.setattr(trainer.diffusion, "loss", spy_loss)
    from ccdm_tpu.embedding import make_fn_y2h
    step_fn = trainer._build_train_step(make_fn_y2h(128))
    with jax.disable_jit():
        step_fn(trainer.state, jax.random.PRNGKey(7))
    k_batch, k_loss = np.asarray(seen["batch"]), np.asarray(seen["loss"])
    assert not np.array_equal(k_batch, k_loss)
    # and the derived sub-streams must not overlap either
    sub_batch = np.asarray(jax.random.split(jnp.asarray(k_batch), 3))
    sub_loss = np.asarray(jax.random.split(jnp.asarray(k_loss), 6))
    for kb in sub_batch:
        for kl in sub_loss:
            assert not np.array_equal(kb, kl)


@pytest.mark.slow
def test_trainer_seed_changes_stream(tmp_path):
    """--seed must govern the training PRNG stream (round-1 VERDICT weak #2)."""
    t0, _ = build_trainer(tmp_path / "a", steps=1, seed=0)
    t1, _ = build_trainer(tmp_path / "b", steps=1, seed=123)
    from ccdm_tpu.embedding import make_fn_y2h
    fn = make_fn_y2h(128)
    t0.train(fn, progress=False)
    t1.train(fn, progress=False)
    p0 = np.asarray(jax.tree_util.tree_leaves(t0.state.params)[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(t1.state.params)[0])
    assert not np.allclose(p0, p1)
