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
