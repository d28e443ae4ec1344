"""Tests for analytic + ILI label embeddings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.data import make_synthetic
from ccdm_tpu.embedding import make_fn_y2h, make_fn_y2cov
from ccdm_tpu.models.resnet_embed import ModelY2Cov, ModelY2H, ResNetEmbed


def test_sinusoidal_y2h_range():
    fn = make_fn_y2h(128, "sinusoidal")
    e = fn(jnp.linspace(0, 1, 8))
    assert e.shape == (8, 128)
    assert float(e.min()) >= 0.0 and float(e.max()) <= 1.0


def test_sinusoidal_y2cov_nonneg():
    fn = make_fn_y2cov(64, "sinusoidal")
    e = fn(jnp.linspace(0, 1, 8))
    assert e.shape == (8, 64)
    assert float(e.min()) >= 0.0


def test_gaussian_deterministic():
    """The reference draws a fresh random projection per call
    (label_embedding.py:1023 defect); ours must be deterministic."""
    fn = make_fn_y2h(128, "gaussian")
    a = fn(jnp.ones(4))
    b = fn(jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multidim_mean_combination():
    fn = make_fn_y2h(64, "sinusoidal", label_dim=3)
    e = fn(jnp.ones((4, 3)) * 0.5)
    # equal dims -> mean equals single-dim embedding
    fn1 = make_fn_y2h(64, "sinusoidal", label_dim=1)
    e1 = fn1(jnp.full((4,), 0.5))
    np.testing.assert_allclose(np.asarray(e), np.asarray(e1), atol=1e-6)


def test_highdim_subsampling():
    fn = make_fn_y2h(32, "sinusoidal", label_dim=50)
    e = fn(jnp.ones((2, 50)))
    assert e.shape == (2, 32)


@pytest.mark.parametrize("kind", ["weighted", "attention", "cross", "cross_attention"])
def test_multidim_combiners(kind):
    """Each learned combiner (ref label_embedding.py:875-1005) produces the
    right shape, is deterministic, and (except softmax-uniform 'weighted',
    which starts at mean) differs from the mean combination."""
    y = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (4, 3)), jnp.float32)
    fn = make_fn_y2h(64, "sinusoidal", label_dim=3, dim_combination=kind)
    e = fn(y)
    assert e.shape == (4, 64)
    np.testing.assert_array_equal(np.asarray(fn(y)), np.asarray(e))  # deterministic
    e_mean = make_fn_y2h(64, "sinusoidal", label_dim=3)(y)
    if kind not in ("weighted",):  # uniform-softmax init == mean
        assert float(jnp.abs(e - e_mean).max()) > 1e-4


def test_label_embed_flag_drives_behavior():
    """--label_embed must map onto pipeline behavior (VERDICT weak-6):
    random forces the gaussian y2h; ccdm1/random + use_Hy is rejected."""
    from ccdm_tpu.main import resolve_label_embed
    from ccdm_tpu.opts import parse_opts

    args = parse_opts(["--label_embed", "random"])
    resolve_label_embed(args)
    assert args.y2h_embed_type == "gaussian"

    args = parse_opts(["--label_embed", "ccdm1", "--use_Hy"])
    with pytest.raises(SystemExit):
        resolve_label_embed(args)

    args = parse_opts(["--label_embed", "ccdm2", "--use_Hy"])
    resolve_label_embed(args)  # ok


def test_embedding_distinguishes_labels():
    fn = make_fn_y2h(128)
    e = np.asarray(fn(jnp.array([0.1, 0.9])))
    assert np.linalg.norm(e[0] - e[1]) > 0.1


@pytest.mark.slow  # compile-heavy; parity pinned elsewhere
def test_resnet_embed_shapes():
    net = ResNetEmbed(dim_embed=32, label_dim=1, num_blocks=(1, 1, 1, 1))
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    v = net.init(k, x, train=False)
    (y_hat, h), _ = net.apply(v, x, train=True, mutable=["batch_stats"])
    assert y_hat.shape == (2, 1)
    assert h.shape == (2, 32)
    assert float(y_hat.min()) >= 0  # ReLU head


def test_label_mlps():
    k = jax.random.PRNGKey(0)
    m = ModelY2H(32)
    v = m.init(k, jnp.zeros((4,)))
    out = m.apply(v, jnp.linspace(0, 1, 4))
    assert out.shape == (4, 32) and float(out.min()) >= 0
    mc = ModelY2Cov(48)
    vc = mc.init(k, jnp.zeros((4,)))
    outc = mc.apply(vc, jnp.linspace(0, 1, 4))
    assert outc.shape == (4, 48) and float(outc.min()) >= 0


@pytest.mark.slow
def test_ili_multidim_combiner(tmp_path):
    """The trained-ILI fn_y2h must route multi-dim labels through the
    requested combiner (VERDICT missing-5; ref label_embedding.py:875-1005)."""
    from ccdm_tpu.data.datasets import DatasetBundle
    from ccdm_tpu.embedding.ili import LabelEmbed

    rng = np.random.default_rng(0)
    labels = rng.uniform(0.1, 0.9, (48, 2)).astype(np.float64)
    images = np.clip(labels.mean(1)[:, None, None, None] * 255
                     + rng.normal(0, 25, (48, 16, 16, 3)), 0, 255).astype(np.uint8)
    fn_id = lambda y: np.asarray(y, float)
    ds = DatasetBundle("synthetic", images, labels, labels, fn_id, fn_id)

    le_cross = LabelEmbed(ds, str(tmp_path / "c"), dim_embed=16, epochs_cnn=1,
                          epochs_mlp=1, batch_size=32, dim_combination="cross")
    le_mean = LabelEmbed(ds, str(tmp_path / "m"), dim_embed=16, epochs_cnn=1,
                         epochs_mlp=1, batch_size=32)
    y = jnp.asarray(labels[:4], jnp.float32)
    e_cross, e_mean = le_cross.fn_y2h(y), le_mean.fn_y2h(y)
    assert e_cross.shape == (4, 16)
    assert float(jnp.abs(e_cross - e_mean).max()) > 1e-5


@pytest.mark.slow
def test_ili_pipeline_trains_and_reloads(tmp_path):
    from ccdm_tpu.embedding.ili import LabelEmbed

    ds = make_synthetic(n=64, image_size=16, channels=3, n_labels=8)
    le = LabelEmbed(ds, str(tmp_path), dim_embed=16, epochs_cnn=2, epochs_mlp=2,
                    batch_size=32)
    e = le.fn_y2h(jnp.linspace(0.1, 0.9, 4))
    assert e.shape == (4, 16)
    le2 = LabelEmbed(ds, str(tmp_path), dim_embed=16, epochs_cnn=2, epochs_mlp=2,
                     batch_size=32)
    np.testing.assert_allclose(
        np.asarray(le2.fn_y2h(jnp.linspace(0.1, 0.9, 4))), np.asarray(e)
    )


def test_label_mlp_escapes_dead_relu_with_feat_mean():
    """Round-3 regression (observed live on the Cell-200 fixture): a frozen
    h2y head whose operating point sits at large-positive features leaves
    the cold-initialized MLP entirely in the head's dead-ReLU region —
    relu(h@W+b)==0 for every label, zero gradients, loss pinned at E[y^2].
    Seeding the MLP output bias at the stage-1 feature mean
    (train_label_mlp(feat_mean=...)) must restore a working inversion."""
    from ccdm_tpu.embedding.ili import train_label_mlp

    dim = 32
    rng = np.random.default_rng(0)
    # frozen head fit to features with mean ~8 (post-BN-ReLU scale):
    # y ~= relu(h @ k + b) with b strongly negative, as stage 1 produces
    feat_mean = np.full((dim,), 8.0, np.float32)
    kernel = np.asarray(np.abs(rng.normal(0, 0.05, (dim, 1))) + 0.02,
                        np.float32)
    # alive at the feature mean (rec=0.5, as a trained head is), dead at
    # h~=0 (bias ~ -15): exactly the observed stage-1 geometry
    bias = (0.5 - feat_mean @ kernel).astype(np.float32)
    assert bias[0] < -1.0
    head = {"params": {"h2y": {"kernel": jnp.asarray(kernel),
                               "bias": jnp.asarray(bias)}}}
    labels = np.linspace(0.05, 0.95, 50).astype(np.float32)

    def final_rec(mlp_vars):
        h = ModelY2H(dim).apply(mlp_vars, jnp.asarray(labels))
        return np.asarray(jax.nn.relu(h @ kernel + bias))[:, 0]

    cold = train_label_mlp(labels, head, ModelY2H(dim), dim, epochs=40,
                           lr_decay_epochs=(20, 30), log_every=0)
    warm = train_label_mlp(labels, head, ModelY2H(dim), dim, epochs=40,
                           lr_decay_epochs=(20, 30), log_every=0,
                           feat_mean=feat_mean)
    rec_cold, rec_warm = final_rec(cold), final_rec(warm)
    # the cold init is dead for this head (documents the failure mode)
    assert rec_cold.max() <= 1e-6
    # the data-informed init must keep the frozen head LIVE (nonzero output,
    # gradients flowing, reconstruction pulled to the label scale); inversion
    # QUALITY with a real stage-1 head is asserted by the slow-lane
    # test_ili_roundtrip_quality
    assert rec_warm.min() > 0.1


@pytest.mark.slow
def test_ili_roundtrip_quality():
    """End-to-end ILI inversion quality in EVAL mode (the reference's sanity
    roundtrip, vanilla main.py:245-275): train the real stage-1 ResNet +
    stage-2 MLP on a brightness-coded fixture, then assert y -> h -> y_hat
    through the frozen h2y head actually TRACKS y. This is the regression
    gate for the round-3 BN-momentum fix (flax default 0.99 left running
    stats ~1/3 init-biased after a fixture-scale run, collapsing eval-mode
    y_hat to ~0 for every label -> LS pinned at full scale)."""
    from ccdm_tpu.embedding.ili import (mean_feature, per_label_mean_features,
                                        train_label_mlp, train_resnet_embed)

    rng = np.random.default_rng(7)
    n, img, dim = 256, 16, 32
    labels = rng.choice(np.linspace(0.05, 0.95, 24), size=n).astype(np.float32)
    images = np.clip(labels[:, None, None, None] * 255
                     + rng.normal(0, 12, (n, img, img, 3)), 0, 255).astype(np.uint8)

    resnet_vars = train_resnet_embed(images, labels, dim, epochs=15,
                                     batch_size=64, lr_decay_epochs=(8, 12),
                                     seed=3, log_every=0)
    uniq = np.unique(labels)
    mlp_vars = train_label_mlp(uniq, resnet_vars, ModelY2H(dim), dim,
                               epochs=120, lr_decay_epochs=(60, 90), seed=4,
                               log_every=0,
                               feat_mean=mean_feature(resnet_vars, images, dim),
                               feat_targets=per_label_mean_features(
                                   resnet_vars, images, labels, uniq, dim))

    h2y_k = resnet_vars["params"]["h2y"]["kernel"]
    h2y_b = resnet_vars["params"]["h2y"]["bias"]
    probe = jnp.asarray(np.linspace(0.1, 0.9, 9), jnp.float32)
    h = ModelY2H(dim).apply(mlp_vars, probe)
    y_rec = np.asarray(jax.nn.relu(h @ h2y_k + h2y_b))[:, 0]

    # dead-embedding failure mode: y_rec ~= const (spread 0), MAE ~= E[y]
    spread = float(y_rec.max() - y_rec.min())
    mae = float(np.mean(np.abs(y_rec - np.asarray(probe))))
    corr = float(np.corrcoef(np.asarray(probe), y_rec)[0, 1])
    assert spread > 0.3, f"inversion collapsed: spread={spread:.4f}"
    assert corr > 0.9, f"y_hat does not track y: corr={corr:.3f}"
    assert mae < 0.15, f"roundtrip MAE too high: {mae:.3f}"


def test_label_mlp_feature_phase_rescues_small_kernel_head():
    """Round-3 regression #2 (observed live on the Cell-200 fixture run):
    with a SMALL-magnitude frozen head kernel the inversion objective's
    gradient (which reaches the MLP only through that kernel) is too weak
    for the reference's SGD budget — the MLP stays at the constant-output
    optimum y_hat ~= E[y], loss pinned at Var(y), zero label information
    even though the head is LIVE (so the dead-ReLU guard cannot fire).
    The feature-matching first phase (train_label_mlp(feat_targets=...))
    must restore a label-tracking inversion."""
    from ccdm_tpu.embedding.ili import train_label_mlp

    dim = 32
    rng = np.random.default_rng(0)
    feat_mean = np.full((dim,), 8.0, np.float32)
    kernel = np.asarray(rng.normal(0, 0.004, (dim, 1)), np.float32)
    bias = (0.5 - feat_mean @ kernel).astype(np.float32)
    head = {"params": {"h2y": {"kernel": jnp.asarray(kernel),
                               "bias": jnp.asarray(bias)}}}
    labels = np.linspace(0.05, 0.95, 50).astype(np.float32)
    # per-label features consistent with the head: h(y) = mean + dir*(y-1/2)
    # with dir the least-norm direction the head decodes back to y
    dirv = kernel[:, 0] / (kernel[:, 0] @ kernel[:, 0])
    feat_targets = feat_mean[None] + (labels - 0.5)[:, None] * dirv[None]

    def rec(v):
        h = ModelY2H(dim).apply(v, jnp.asarray(labels))
        return np.asarray(jax.nn.relu(h @ kernel + bias))[:, 0]

    inv_only = train_label_mlp(labels, head, ModelY2H(dim), dim, epochs=500,
                               log_every=0, feat_mean=feat_mean)
    with_feat = train_label_mlp(labels, head, ModelY2H(dim), dim, epochs=500,
                                log_every=0, feat_mean=feat_mean,
                                feat_targets=feat_targets)
    r_inv, r_feat = rec(inv_only), rec(with_feat)
    # inversion-only collapses to ~constant (documents the failure mode)
    assert float(r_inv.max() - r_inv.min()) < 0.05
    # the feature phase restores a label-tracking embedding
    assert float(r_feat.max() - r_feat.min()) > 0.3
    assert float(np.corrcoef(labels, r_feat)[0, 1]) > 0.9


@pytest.mark.slow
def test_ili_cache_rejects_different_dataset(tmp_path):
    """An embed cache fit on dataset A must not silently load for dataset B
    (the cache tag carries dim/epochs/seed but not data identity — the
    round-4 fixture-swap hazard). Fresh saves carry a data fingerprint;
    a mismatch is a hard error naming the remedy."""
    from ccdm_tpu.embedding.ili import LabelEmbed

    ds_a = make_synthetic(n=64, image_size=16, channels=3, n_labels=8)
    LabelEmbed(ds_a, str(tmp_path), dim_embed=16, epochs_cnn=1, epochs_mlp=1,
               batch_size=32)
    ds_b = make_synthetic(n=64, image_size=16, channels=3, n_labels=8, seed=9)
    assert (np.asarray(ds_b.images) != np.asarray(ds_a.images)).any()
    with pytest.raises(SystemExit, match="DIFFERENT dataset"):
        LabelEmbed(ds_b, str(tmp_path), dim_embed=16, epochs_cnn=1,
                   epochs_mlp=1, batch_size=32)
    # same data still reloads fine
    LabelEmbed(ds_a, str(tmp_path), dim_embed=16, epochs_cnn=1, epochs_mlp=1,
               batch_size=32)


def test_partial_embed_cache_reads_as_miss(tmp_path):
    """Round-4b regression (observed live on the Cell-200 teacher restart):
    the embed-resume feature writes per-epoch stage-1 checkpoints
    ("<tag>_cnn_epochN", CNN state only, no stage-2 "mlp"), and
    find_cached_embedding's relaxed fallback picked one up as the newest
    complete embedding -> KeyError('mlp') in every consumer after any
    interrupted pretrain. In-train stage-1 checkpoints must be invisible to
    cache discovery, and a partial full-tag entry must read as a miss."""
    from ccdm_tpu.embedding.ili import LabelEmbed, find_cached_embedding
    from ccdm_tpu.utils.ckpt import save_checkpoint

    embed_dir = tmp_path / "embed_models"
    embed_dir.mkdir()
    # an in-train stage-1 resume checkpoint (what an interrupted run leaves)
    save_checkpoint(str(embed_dir), "y2h_d16_e2_m2_seed2023_cnn_epoch1",
                    {"epoch": 1})
    assert find_cached_embedding(str(embed_dir), "y2h_d16",
                                 "y2h_d16_e2_m2_seed2023") is None
    # require_cached consumers (dmd_main, serve) get a clean miss, not a crash
    with pytest.raises(FileNotFoundError):
        LabelEmbed(None, str(tmp_path), dim_embed=16, require_cached=True)
    # a full-tag entry that is nonetheless partial (no "mlp") also misses
    save_checkpoint(str(embed_dir), "y2h_d16_e9_m9_seed2023", {"epoch": 9})
    with pytest.raises(FileNotFoundError):
        LabelEmbed(None, str(tmp_path), dim_embed=16, require_cached=True)
    # and a fresh trainable LabelEmbed retrains through the partial entries
    ds = make_synthetic(n=64, image_size=16, channels=3, n_labels=8)
    le = LabelEmbed(ds, str(tmp_path), dim_embed=16, epochs_cnn=1,
                    epochs_mlp=1, batch_size=32)
    assert le.fn_y2h(jnp.asarray([0.5])).shape == (1, 16)

    # Advisor r4: a NEWER partial full-tag entry must not shadow an OLDER
    # complete cache — discovery retries past partials instead of reporting
    # a total miss (which made require_cached consumers raise despite a
    # valid cached embedding sitting right there).
    import os
    import time

    complete = [d for d in os.listdir(tmp_path / "embed_models")
                if d.startswith("model-y2h") and "_cnn" not in d
                and "e9_m9" not in d]
    assert complete, "training above should have written a complete cache"
    time.sleep(0.05)
    save_checkpoint(str(embed_dir), "y2h_d16_e7_m7_seed2023", {"epoch": 7})
    os.utime(embed_dir / "model-y2h_d16_e7_m7_seed2023")  # newest mtime
    le2 = LabelEmbed(None, str(tmp_path), dim_embed=16, require_cached=True)
    assert le2.fn_y2h(jnp.asarray([0.5])).shape == (1, 16)
