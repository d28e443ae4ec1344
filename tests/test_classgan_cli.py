"""E2E fixture tests for the class-conditional baseline CLI (VERDICT r3
'next' #8): every method family — StudioGAN-loss GAN, ADM-G classifier
guidance, CFG — must produce fakes through the real entry point
(`ccdm_tpu.classgan_main`), mirroring the reference's per-family entry
scripts (`class-conditional/{StudioGAN,ADM_G,CFG}`)."""

import glob
import os

import numpy as np
import pytest


def _run(tmp_path, *extra):
    from ccdm_tpu import classgan_main as cli

    cli.main([
        "--root_path", str(tmp_path), "--data_name", "synthetic",
        "--data_path", str(tmp_path),
        "--image_size", "64", "--num_channels", "1",
        "--num_classes", "3", "--niters", "2", "--train_batch_size", "8",
        "--nfake_per_class", "2", "--samp_batch_size", "6",
        "--dump_fake_data", "--log_every", "1",
        "--visualize_freq", "1000000", "--save_niters_freq", "1000000",
        *extra,
    ])
    return os.path.join(str(tmp_path), "output", "synthetic_64",
                        "Setup_ClassCond")


def _check_fakes(setting, method, num=6):
    import h5py

    files = glob.glob(os.path.join(setting, f"{method}_results",
                                   f"fake_data_{method}_*.h5"))
    assert files, f"no fakes dumped for {method}"
    with h5py.File(files[0], "r") as f:
        fakes = f["fake_images"][:]
        flabels = f["fake_labels"][:]
    assert fakes.shape == (num, 64, 64, 1) and fakes.dtype == np.uint8
    assert len(np.unique(flabels)) == 3  # one center per class
    assert os.path.exists(os.path.join(setting, f"{method}_results",
                                       f"sample_{method}.png"))


def test_studiogan_d2dce_e2e(tmp_path):
    setting = _run(tmp_path, "--method", "studiogan", "--cond_loss", "d2dce",
                   "--gene_ch", "4", "--disc_ch", "4", "--dim_z", "16",
                   "--num_D_steps", "1")
    _check_fakes(setting, "studiogan")


@pytest.mark.slow  # compile-heavy; d2dce covers the default lane
def test_studiogan_adc_e2e(tmp_path):
    setting = _run(tmp_path, "--method", "studiogan", "--cond_loss", "adc",
                   "--gene_ch", "4", "--disc_ch", "4", "--dim_z", "16",
                   "--num_D_steps", "1")
    _check_fakes(setting, "studiogan")


@pytest.mark.slow  # compile-heavy; d2dce covers the default lane
def test_admg_e2e(tmp_path):
    setting = _run(tmp_path, "--method", "admg",
                   "--model_channels", "8", "--channel_mult", "1_2",
                   "--train_timesteps", "20", "--classifier_epochs", "1",
                   "--sample_timesteps", "4", "--classifier_scale", "1.0")
    _check_fakes(setting, "admg")


@pytest.mark.slow  # compile-heavy; d2dce covers the default lane
def test_cfg_e2e(tmp_path):
    setting = _run(tmp_path, "--method", "cfg",
                   "--model_channels", "8", "--channel_mult", "1_2",
                   "--train_timesteps", "20", "--sample_timesteps", "4",
                   "--sample_cond_scale", "2.0")
    _check_fakes(setting, "cfg")
