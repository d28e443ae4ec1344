"""Checkpoint helpers (utils/ckpt.py)."""

import numpy as np
import pytest

from ccdm_tpu.utils.ckpt import checkpoint_exists, load_checkpoint, save_checkpoint


def test_roundtrip_and_exists(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "nested": {"b": np.float32(3.5)}}
    assert not checkpoint_exists(str(tmp_path), 10)
    save_checkpoint(str(tmp_path), 10, tree)
    assert checkpoint_exists(str(tmp_path), 10)
    out = load_checkpoint(str(tmp_path), 10)
    np.testing.assert_array_equal(out["a"], tree["a"])


def test_incompatible_tree_raises_clear_error(tmp_path):
    """Restoring into a target with a DIFFERENT parameter tree (e.g. a
    checkpoint from before a model refactor) must raise a readable error —
    orbax's own structure-diff formatter crashes with an unrelated
    array-truth-value ValueError while trying to REPORT the mismatch."""
    save_checkpoint(str(tmp_path), 5, {"old_name": np.zeros((4, 4), np.float32)})
    target = {"new_name": np.zeros((4, 4), np.float32),
              "extra": {"w": np.zeros((2,), np.float32)}}
    with pytest.raises(ValueError, match="older/incompatible model version"):
        load_checkpoint(str(tmp_path), 5, target=target)


def test_legacy_fused_migration_roundtrip():
    """legacy_to_fused(fused_to_legacy(x)) is the identity on a fused tree
    (values preserved through the conv-kernel reshapes)."""
    from ccdm_tpu.utils.ckpt import fused_to_legacy, legacy_to_fused

    rng = np.random.default_rng(0)
    fused = {
        "down_0_block1": {
            "tc_mlp": {"kernel": rng.normal(size=(8, 16)).astype(np.float32),
                       "bias": np.zeros(16, np.float32)},
            "conv1_kernel": rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
            "conv1_bias": np.zeros(8, np.float32),
            "norm1_g": np.ones(8, np.float32),
            "conv2_kernel": rng.normal(size=(3, 3, 8, 8)).astype(np.float32),
            "conv2_bias": np.zeros(8, np.float32),
            "norm2_g": np.ones(8, np.float32),
            "res_kernel": rng.normal(size=(4, 8)).astype(np.float32),
            "res_bias": np.zeros(8, np.float32),
        },
        "down_0_attn": {
            "norm_g": np.ones(8, np.float32),
            "qkv_kernel": rng.normal(size=(8, 24)).astype(np.float32),
            "out_kernel": rng.normal(size=(8, 8)).astype(np.float32),
            "out_bias": np.zeros(8, np.float32),
            "out_norm_g": np.ones(8, np.float32),
        },
        # full-attention PreNormResidual must pass through UNmigrated
        "mid_attn": {"norm": {"g": np.ones(8, np.float32)},
                     "mid_attn_inner": {
                         "to_qkv": {"kernel": rng.normal(size=(1, 1, 8, 24)).astype(np.float32)},
                         "to_out": {"kernel": rng.normal(size=(1, 1, 8, 8)).astype(np.float32),
                                    "bias": np.zeros(8, np.float32)}}},
    }
    legacy = fused_to_legacy(fused)
    assert "block1" in legacy["down_0_block1"]
    assert "down_0_attn_inner" in legacy["down_0_attn"]
    assert legacy["down_0_attn"]["down_0_attn_inner"]["to_qkv"]["kernel"].shape == (1, 1, 8, 24)
    back = legacy_to_fused(legacy)

    def assert_equal(a, b, path=""):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            if isinstance(a[k], dict):
                assert_equal(a[k], b[k], path + "/" + str(k))
            else:
                np.testing.assert_array_equal(a[k], b[k], err_msg=path + "/" + str(k))

    assert_equal(back, fused)


def test_legacy_checkpoint_restores_into_fused_trainer(tmp_path):
    """A milestone written in the PRE-fused module layout (round 1) restores
    into today's fused Trainer via the key-remap shim — same forward outputs
    (ADVICE round-2 medium #2)."""
    import jax
    import jax.numpy as jnp

    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.models import Unet
    from ccdm_tpu.training import Trainer, TrainerConfig
    from ccdm_tpu.utils.ckpt import fused_to_legacy

    unet = Unet(dim=8, dim_mults=(1, 2), in_channels=1, attn_heads=1, attn_dim_head=8)
    k = jax.random.PRNGKey(42)
    v = unet.init(k, jnp.zeros((2, 16, 16, 1)), jnp.zeros((2,), jnp.int32),
                  jnp.zeros((2, 128)), None, train=False)
    dcfg = DiffusionConfig(image_size=16, channels=1, timesteps=20, sampling_timesteps=2)
    images = np.full((4, 16, 16, 1), 128, np.uint8)
    labels = np.array([0.2, 0.4, 0.6, 0.8], np.float32)
    tcfg = TrainerConfig(train_batch_size=2, train_num_steps=1,
                         results_folder=str(tmp_path), sample_every=10**9,
                         save_every=10**9)
    tr = Trainer(GaussianDiffusion(unet.apply, dcfg), v, images, labels, tcfg)
    tr.save(7)

    # rewrite milestone 7 as a LEGACY-layout checkpoint (what round 1 wrote)
    raw = load_checkpoint(str(tmp_path), 7)
    legacy = fused_to_legacy(raw)
    import shutil
    shutil.rmtree(str(tmp_path / "model-7"))
    save_checkpoint(str(tmp_path), 7, legacy)

    tr2 = Trainer(GaussianDiffusion(unet.apply, dcfg), v, images, labels, tcfg)
    tr2.load(7)
    p_ref = jax.device_get(tr.state.params)
    p_new = jax.device_get(tr2.state.params)
    for pa, pb in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_new)):
        np.testing.assert_array_equal(pa, pb)
