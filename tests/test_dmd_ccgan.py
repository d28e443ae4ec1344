"""Smoke tests for the DMD2 and CcGAN trainers and the ADM UNet (tiny)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.embedding import make_fn_y2h
from ccdm_tpu.models import Unet
from ccdm_tpu.models.aux_net import make_aux_net
from ccdm_tpu.models.sngan import SNGANDiscriminator, SNGANGenerator
from ccdm_tpu.models.unet_adm import ADMUnet

IMG, NC = 64, 3  # GANs require img_size in {64,128,192}


def tiny_data(n=64, img=IMG, nc=NC):
    rng = np.random.default_rng(0)
    labels = rng.choice(np.linspace(0.1, 0.9, 8), size=n).astype(np.float32)
    images = np.clip(labels[:, None, None, None] * 255 + rng.normal(0, 20, (n, img, img, nc)),
                     0, 255).astype(np.uint8)
    return images, labels


@pytest.mark.slow  # compile-heavy (~43s); ADM params pinned by torch-parity suite
def test_adm_unet_shapes_and_cfg():
    m = ADMUnet(model_channels=16, channel_mult=(1, 2), num_groups=8,
                attention_resolutions=(2,), num_heads=2)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 16, 16, 3))
    t = jnp.array([3, 7])
    e = jax.random.normal(k, (2, 128))
    v = m.init(k, x, t, e, None, train=False)
    out = m.apply(v, x, t, e, jnp.array([True, True]), train=False)
    assert out.shape == (2, 16, 16, 3)
    out_null = m.apply(v, x, t, e, jnp.array([False, False]), train=False)
    assert not np.allclose(np.asarray(out), np.asarray(out_null))
    # frozen null embedding: grads w.r.t. it must be zero
    def loss(params):
        return jnp.sum(m.apply({**v, "params": params}, x, t, e,
                               jnp.array([False, False]), train=False) ** 2)
    g = jax.grad(loss)(v["params"])
    np.testing.assert_allclose(np.asarray(g["null_classes_emb"]), 0.0)


@pytest.mark.slow  # compile-heavy (~19s)
def test_aux_nets():
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.zeros((2,), jnp.int32)
    for name in ("VGG11", "ResNet18"):
        net = make_aux_net(name)
        v = net.init(k, x, t, train=False)
        out = net.apply(v, x, t, train=False)
        assert out.shape == (2, 1) and float(out.min()) >= 0


@pytest.mark.slow
def test_dmd2_trainer_smoke(tmp_path):
    from ccdm_tpu.training.dmd import DMD2Trainer, DMDConfig

    images, labels = tiny_data()
    unet = Unet(dim=8, dim_mults=(1, 2), in_channels=NC, attn_heads=1, attn_dim_head=8)
    k = jax.random.PRNGKey(0)
    uv = unet.init(k, jnp.zeros((2, IMG, IMG, NC)), jnp.zeros((2,), jnp.int32),
                   jnp.zeros((2, 128)), None, train=False)
    G = SNGANGenerator(dim_z=16, dim_embed=128, nc=NC, img_size=IMG, gene_ch=4)
    D = SNGANDiscriminator(dim_embed=128, nc=NC, img_size=IMG, disc_ch=4)
    gv = G.init(k, jnp.zeros((2, 16)), jnp.zeros((2, 128)), train=False)
    dv = D.init(k, jnp.zeros((2, IMG, IMG, NC)), jnp.zeros((2, 128)), train=False)
    cfg = DMDConfig(train_batch_size=8, niters=2, z_dim=16, num_D_steps=1,
                    train_timesteps=50, results_folder=str(tmp_path),
                    sample_every=2, save_every=10**9, log_every=10**9)
    tr = DMD2Trainer(unet.apply, uv, unet.apply,
                     jax.tree_util.tree_map(lambda v: v.copy(), uv),
                     G, D, gv, dv, images, labels, make_fn_y2h(128), cfg)
    tr.train(progress=False)
    # sample_every fired at step 2: the eval-mode y_visual grid exists
    # (ref dmd.py saves sample_{step}.png at sample_every)
    assert (tmp_path / "sample_2.png").exists()
    imgs, _ = tr.sample_given_labels(np.linspace(0.1, 0.9, 4), batch_size=4)
    assert imgs.shape == (4, IMG, IMG, NC) and imgs.dtype == np.uint8

    # the D step must generate its fakes with netG in TRAIN mode (batch
    # statistics) and advance the generator running stats, exactly like the
    # reference's always-train()-mode netG (dmd.py:691 onward) — an eval-mode
    # generator here lets the train/eval BN gap grow unchecked and the final
    # eval-mode sampling collapse.
    s0 = jax.device_get(tr.state["gen_stats"])
    tr.state, _ = tr._d_step(tr.state, jax.random.PRNGKey(123))
    s1 = jax.device_get(tr.state["gen_stats"])
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(s0), jax.tree_util.tree_leaves(s1))
    )
    assert changed, "d_step left generator batch_stats untouched (eval-mode fakes)"


@pytest.mark.slow
def test_ccgan_trainer_smoke(tmp_path):
    from ccdm_tpu.training.ccgan import CcGANConfig, CcGANTrainer

    images, labels = tiny_data()
    G = SNGANGenerator(dim_z=16, dim_embed=128, nc=NC, img_size=IMG, gene_ch=4)
    D = SNGANDiscriminator(dim_embed=128, nc=NC, img_size=IMG, disc_ch=4)
    k = jax.random.PRNGKey(0)
    gv = G.init(k, jnp.zeros((2, 16)), jnp.zeros((2, 128)), train=False)
    dv = D.init(k, jnp.zeros((2, IMG, IMG, NC)), jnp.zeros((2, 128)), train=False)
    cfg = CcGANConfig(niters=2, batch_size_disc=8, batch_size_gene=8, num_D_steps=1,
                      dim_gan=16, results_folder=str(tmp_path), log_every=10**9,
                      save_niters_freq=10**9, nda_b=0.1, nda_c=0.1, nda_a=0.8)
    tr = CcGANTrainer(G, D, gv, dv, images, labels, make_fn_y2h(128), cfg)
    tr.train(progress=False)
    imgs, _ = tr.sample_given_labels(np.linspace(0.1, 0.9, 4), batch_size=4)
    assert imgs.shape == (4, IMG, IMG, NC) and imgs.dtype == np.uint8

    # D-step fakes come from a TRAIN-mode netG (ref train_ccgan.py:639 keeps
    # netG in train() through the D updates) — its running stats must advance
    s0 = jax.device_get(tr.state["g_stats"])
    d_plain = tr._steps[0]
    tr.state, _ = d_plain(tr.state, jax.random.PRNGKey(123))
    s1 = jax.device_get(tr.state["g_stats"])
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(s0), jax.tree_util.tree_leaves(s1))
    )
    assert changed, "CcGAN d_step left generator batch_stats untouched"


def test_conditional_bn_momentum_parity():
    """torch BatchNorm2d default momentum 0.1 == flax momentum 0.9: after one
    train-mode forward from zero-init stats, running_mean must be
    0.1 * batch_mean (ref sngan.py:23 uses the torch default; a flax-default
    0.99 momentum makes running stats lag 10x and opens a train/eval gap)."""
    from ccdm_tpu.models.sngan import ConditionalBatchNorm

    m = ConditionalBatchNorm(4)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (8, 4, 4, 4)) * 3.0 + 1.0
    y = jnp.zeros((8, 128))
    v = m.init(k, x, y, train=True)
    _, upd = m.apply(v, x, y, train=True, mutable=["batch_stats"])
    rm = np.asarray(upd["batch_stats"]["bn"]["mean"])
    batch_mean = np.asarray(x.mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(rm, 0.1 * batch_mean, rtol=1e-4, atol=1e-6)
    # SAGAN overrides to 0.999 (ref sagan.py:93 momentum=0.001)
    m2 = ConditionalBatchNorm(4, momentum=0.999)
    v2 = m2.init(k, x, y, train=True)
    _, upd2 = m2.apply(v2, x, y, train=True, mutable=["batch_stats"])
    rm2 = np.asarray(upd2["batch_stats"]["bn"]["mean"])
    np.testing.assert_allclose(rm2, 0.001 * batch_mean, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_dmd_main_comp_fid_eval(tmp_path):
    """dmd_main --comp_FID scores the one-step student through the shared
    CCGM protocol (eval/protocol.py) — eval_results file + per-center npz
    land in the DMD setting folder."""
    import glob
    import os

    from ccdm_tpu import dmd_main

    dmd_main.main([
        "--root_path", str(tmp_path), "--data_name", "synthetic",
        "--image_size", "64", "--num_channels", "1",
        "--model_channels", "8", "--channel_mult", "1_2",
        "--niters", "2", "--train_batch_size", "8", "--num_D_steps", "1",
        "--train_timesteps", "20", "--gene_ch", "4", "--disc_ch", "4",
        "--dim_z", "16", "--nfake_per_label", "6", "--samp_batch_size", "6",
        "--kappa", "0", "--eval_mode", "1",
        "--comp_FID", "--FID_radius", "0.1", "--FID_num_centers", "3",
        "--comp_prdc", "--comp_niqe", "--niqe_patch", "32",
        "--epochs_eval_ae", "1", "--epochs_eval_cnn", "1",
        "--eval_ckpt_path", str(tmp_path),
    ])
    setting = os.path.join(str(tmp_path), "output", "synthetic_64", "Setup1")
    res = glob.glob(os.path.join(setting, "eval_results_niters2.txt"))
    assert res, "DMD eval wrote no eval_results file"
    text = open(res[0]).read()
    for key in ("SFID:", "LS:", "PRDC", "NIQE"):
        assert key in text, f"missing {key} in DMD eval results"
    assert glob.glob(os.path.join(setting, "fid_ls_entropy_over_centers_*.npz"))


@pytest.mark.slow
def test_ccgan_main_cli_e2e(tmp_path):
    """ccgan_main end-to-end: train (with a visualize_freq grid), per-label
    sampling with --dump_fake_data, and the shared CCGM eval — the CLI reach
    of the B1/B2 baselines (each reference dataset copy has its own
    CcGAN/Dual-NDA main.py; this is the single TPU-framework equivalent)."""
    import glob
    import os

    from ccdm_tpu import ccgan_main

    ccgan_main.main([
        "--root_path", str(tmp_path), "--data_name", "synthetic",
        "--image_size", "64", "--num_channels", "1",
        "--y2h_embed_type", "sinusoidal",
        "--niters", "2", "--batch_size_disc", "8", "--batch_size_gene", "8",
        "--num_D_steps", "1", "--gene_ch", "4", "--disc_ch", "4",
        "--dim_gan", "16", "--nda_b", "0.1", "--nda_c", "0.1", "--nda_a", "0.8",
        "--nfake_per_label", "6", "--samp_batch_size", "6",
        "--eval_mode", "1", "--visualize_freq", "2", "--dump_fake_data",
        "--comp_FID", "--FID_radius", "0.1", "--FID_num_centers", "3",
        "--epochs_eval_ae", "1", "--epochs_eval_cnn", "1",
        "--eval_ckpt_path", str(tmp_path),
    ])
    setting = os.path.join(str(tmp_path), "output", "synthetic_64", "Setup_CcGAN")
    results = os.path.join(setting, "ccgan_results")
    assert os.path.isfile(os.path.join(results, "sample_2.png")), "visualize_freq grid missing"
    assert glob.glob(os.path.join(results, "fake_data_niters2", "*.h5")), "no fake h5 dumps"
    res = glob.glob(os.path.join(setting, "eval_results_niters2.txt"))
    assert res, "CcGAN eval wrote no eval_results file"
    assert "SFID:" in open(res[0]).read()
