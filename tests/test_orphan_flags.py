"""Round-3 orphan-flag wiring: --lambda_aux, --gif_trajectory,
--interpolation, --dump_fake_data (VERDICT round-2 'Next round' #5).

Each flag must produce its artifact through the real CLI entry point, and
--dump_fake_data must gate the h5 persistence exactly like ref main.py:541.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _main_args(tmp_path, *extra):
    return [
        "--root_path", str(tmp_path), "--data_name", "synthetic",
        "--image_size", "16", "--num_channels", "1",
        "--min_label", "0", "--max_label", "1",
        "--model_channels", "8", "--channel_mult", "1_2",
        "--train_timesteps", "20", "--niters", "2", "--train_batch_size", "8",
        "--sample_every", "1000000", "--save_every", "1000000",
        "--sampler", "ddim", "--sample_timesteps", "2",
        "--eval_mode", "4", "--FID_num_centers", "2",
        "--nfake_per_label", "4", "--samp_batch_size", "4",
        *extra,
    ]


def _run_main(tmp_path, *extra):
    from ccdm_tpu import main as cli
    cli.main(_main_args(tmp_path, *extra))
    return os.path.join(str(tmp_path), "output", "synthetic_16", "Setup1")


def test_dump_fake_data_gates_h5(tmp_path):
    setting = _run_main(tmp_path / "nodump")
    assert not glob.glob(os.path.join(setting, "results", "fake_data_*", "*.h5")), \
        "h5 dumped without --dump_fake_data"
    # PNG grids still produced (sampling ran)
    assert glob.glob(os.path.join(setting, "results", "fake_data_*", "sample_*.png"))

    setting2 = _run_main(tmp_path / "dump", "--dump_fake_data")
    assert glob.glob(os.path.join(setting2, "results", "fake_data_*", "*.h5"))


def test_gif_and_interpolation_artifacts(tmp_path):
    setting = _run_main(tmp_path, "--gif_trajectory", "--interpolation")
    assert glob.glob(os.path.join(setting, "results", "trajectory_niters*.gif"))
    assert glob.glob(os.path.join(setting, "results", "interpolation_niters*.png"))


def test_lambda_aux_trains_and_applies(tmp_path):
    """--lambda_aux > 0 trains/caches the aux regressor and the elastic term
    reaches the loss (pred_noise only, ref vanilla diffusion.py:444)."""
    setting = _run_main(
        tmp_path, "--lambda_aux", "0.5", "--net_aux", "VGG11",
        "--epoch_aux", "1", "--batch_size_aux", "16",
        "--pred_objective", "pred_noise",
    )
    assert glob.glob(os.path.join(setting, "aux_models", "model-aux_VGG11_*")), \
        "aux net was not trained/cached"


def test_elastic_aux_term_math():
    """_elastic_aux: null rows and in-vicinity rows excluded; start-step gate."""
    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion

    cfg = DiffusionConfig(image_size=4, channels=1, timesteps=10,
                          objective="pred_noise")
    diff = GaussianDiffusion(lambda *a, **k: None, cfg)
    b = 4
    x_start = jnp.zeros((b, 4, 4, 1))
    t = jnp.zeros((b,), jnp.int32)
    model_out = jnp.zeros((b, 4, 4, 1))
    keep = jnp.array([True, True, True, False])
    labels = jnp.array([0.0, 0.0, 0.0, 0.0])
    # predictor returns fixed errors 0.3, 0.05, 0.2, 0.9
    preds = jnp.array([0.3, 0.05, 0.2, 0.9])
    info = {"apply": lambda x, tt: preds, "vicinity_radius": 0.1,
            "lambda_aux": 2.0}
    term = diff._elastic_aux(x_start, t, model_out, keep, labels, info)
    # rows counted: err 0.3 and 0.2 (0.05 inside radius, 0.9 is a null row)
    np.testing.assert_allclose(float(term), 2.0 * (0.3 + 0.2) / 2, rtol=1e-5)
    # start-step gate
    info2 = dict(info, current_step=jnp.asarray(3), aux_start_step=5)
    assert float(diff._elastic_aux(x_start, t, model_out, keep, labels, info2)) == 0.0
    info3 = dict(info, current_step=jnp.asarray(7), aux_start_step=5)
    assert float(diff._elastic_aux(x_start, t, model_out, keep, labels, info3)) > 0.0
