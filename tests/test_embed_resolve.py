"""The shared label-embedding seam (`embedding/resolve.py`).

Round-2 VERDICT missing #1: DMD and serving must condition through the SAME
trained resnet-ILI embedding space as the teacher (ref dmd.py:104-146), and
`--y2h_embed_type resnet` must work everywhere it is advertised. These tests
pin (a) teacher/consumer embedding-space identity via the cache, (b) the
strict load-only contract for serving, and (c) the serve no-recompile
contract for per-request cond_scale.
"""

import argparse

import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.data import load_dataset
from ccdm_tpu.embedding.resolve import build_label_embedding

TINY_EMBED = dict(epoch_cnn_embed=1, epoch_net_y2h=2, epoch_cnn_embed_y2cov=1,
                  epoch_net_y2cov=2, batch_size_embed=32)


def _args(**over):
    base = dict(dim_embed=16, y2h_embed_type="resnet", y2cov_embed_type="resnet",
                use_Hy=False, image_size=16, num_channels=1, seed=3,
                dim_combination="mean", **TINY_EMBED)
    base.update(over)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def bundle():
    return load_dataset("synthetic", n=48, image_size=16, channels=1)


def test_resnet_train_then_load_identical(bundle, tmp_path_factory):
    """A consumer (dmd_main / serve) loading from the teacher's setting
    folder gets numerically identical fn_y2h outputs — the embedding-space
    identity the distillation correctness depends on."""
    folder = str(tmp_path_factory.mktemp("setting"))
    args = _args()
    fn_teacher, _ = build_label_embedding(args, folder, bundle=bundle)
    probe = jnp.linspace(0.05, 0.95, 7)
    ref = np.asarray(fn_teacher(probe))
    assert ref.shape == (7, 16)

    # load-only consumer, no dataset available (serving)
    fn_served, cov = build_label_embedding(args, folder, bundle=None,
                                           require_cached=True)
    np.testing.assert_array_equal(np.asarray(fn_served(probe)), ref)
    assert cov is None

    # consumer with DIFFERENT epoch defaults still discovers the cache
    # (relaxed-tag fallback) and lands in the same space
    args2 = _args(epoch_cnn_embed=200, epoch_net_y2h=500)
    fn_dmd, _ = build_label_embedding(args2, folder, bundle=bundle,
                                      require_cached=True)
    np.testing.assert_array_equal(np.asarray(fn_dmd(probe)), ref)


def test_resnet_with_y2cov_roundtrip(bundle, tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("setting_hy"))
    args = _args(use_Hy=True)
    fn_y2h, fn_y2cov = build_label_embedding(args, folder, bundle=bundle)
    assert fn_y2cov is not None
    probe = jnp.array([0.2, 0.8])
    cov = np.asarray(fn_y2cov(probe))
    assert cov.shape == (2, 16 * 16) and cov.min() >= 0
    # load-only gets both heads back, bit-identical
    fn2, cov2 = build_label_embedding(args, folder, bundle=None,
                                      require_cached=True)
    np.testing.assert_array_equal(np.asarray(fn2(probe)), np.asarray(fn_y2h(probe)))
    np.testing.assert_array_equal(np.asarray(cov2(probe)), cov)


def test_require_cached_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="y2h"):
        build_label_embedding(_args(), str(tmp_path), bundle=None,
                              require_cached=True)


def test_cov_resnet_without_y2h_resnet_rejected(tmp_path, bundle):
    args = _args(y2h_embed_type="sinusoidal", use_Hy=True)
    with pytest.raises(SystemExit, match="y2h_embed_type resnet"):
        build_label_embedding(args, str(tmp_path), bundle=bundle)


def test_analytic_path_ignores_cache(tmp_path):
    args = _args(y2h_embed_type="sinusoidal", use_Hy=False)
    fn, cov = build_label_embedding(args, str(tmp_path), bundle=None,
                                    require_cached=True)
    out = np.asarray(fn(jnp.array([0.5])))
    assert out.shape == (1, 16) and cov is None


@pytest.mark.slow
def test_dmd_main_resnet_end_to_end(tmp_path, monkeypatch):
    """`dmd_main --y2h_embed_type resnet` runs end-to-end on fixture data:
    trains the tiny ILI into the teacher setting folder, then distills and
    one-step-samples through it (VERDICT round-2 'done' criterion)."""
    from ccdm_tpu import dmd_main

    monkeypatch.chdir(tmp_path)
    dmd_main.main([
        "--data_name", "synthetic", "--image_size", "64", "--num_channels", "3",
        "--root_path", str(tmp_path),
        "--model_channels", "8", "--channel_mult", "1_2",
        "--y2h_embed_type", "resnet",
        "--epoch_cnn_embed", "1", "--epoch_net_y2h", "2", "--batch_size_embed", "32",
        "--dim_embed", "16",
        "--gene_ch", "4", "--disc_ch", "4", "--dim_z", "16",
        "--niters", "2", "--train_batch_size", "8", "--num_D_steps", "1",
        "--train_timesteps", "50",
        "--sample_every", "1000000", "--save_every", "1000000",
        "--nfake_per_label", "4", "--samp_batch_size", "4", "--eval_mode", "1",
        "--interpolation", "--sefa",
    ])
    # the ILI cache must now exist under the (teacher==own) setting folder
    import glob
    import os
    hits = glob.glob(os.path.join(
        str(tmp_path), "output", "synthetic_64", "Setup1", "embed_models", "model-y2h_*"))
    assert hits, "dmd_main did not train/load the resnet ILI embedding"
    # --interpolation / --sefa artifacts over the one-step generator
    fig_dir = os.path.join(str(tmp_path), "output", "synthetic_64", "Setup1",
                           "dmd_results", "analysis")
    assert os.path.isfile(os.path.join(fig_dir, "interpolation.png"))
    assert os.path.isfile(os.path.join(fig_dir, "sefa.png"))


def test_sampler_cond_scale_no_recompile(tmp_path):
    """Distinct non-unit cond_scales share ONE compiled sampler (the serve
    contract); unit scale adds at most one cheaper single-pass variant."""
    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.embedding import make_fn_y2h
    from ccdm_tpu.models import Unet
    from ccdm_tpu.training import Trainer, TrainerConfig
    import jax

    unet = Unet(dim=8, dim_mults=(1, 2), in_channels=1, attn_heads=1, attn_dim_head=8)
    k = jax.random.PRNGKey(0)
    v = unet.init(k, jnp.zeros((2, 16, 16, 1)), jnp.zeros((2,), jnp.int32),
                  jnp.zeros((2, 128)), None, train=False)
    dcfg = DiffusionConfig(image_size=16, channels=1, timesteps=20,
                           sampling_timesteps=2)
    diff = GaussianDiffusion(unet.apply, dcfg)
    images = np.full((4, 16, 16, 1), 128, np.uint8)
    labels = np.array([0.2, 0.4, 0.6, 0.8], np.float32)
    tcfg = TrainerConfig(train_batch_size=2, train_num_steps=1,
                         results_folder=str(tmp_path),
                         sample_every=10**9, save_every=10**9)
    tr = Trainer(diff, v, images, labels, tcfg)
    fn_y2h = make_fn_y2h(128)
    outs = {}
    for cs in (1.5, 2.0, 7.25):
        outs[cs], _ = tr.sample_given_labels(labels, fn_y2h, batch_size=4,
                                             cond_scale=cs, sample_timesteps=2)
    assert len(tr._sample_fns) == 1, "non-unit cond_scales must share one jit"
    # scale actually reaches the computation
    assert not np.array_equal(outs[1.5], outs[7.25])
    tr.sample_given_labels(labels, fn_y2h, batch_size=4, cond_scale=1.0,
                           sample_timesteps=2)
    assert len(tr._sample_fns) == 2
