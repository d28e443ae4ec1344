"""Milestone checkpointing (orbax) with the reference's resume semantics.

Mirrors `CCDM_unified/trainer.py:488-535`: one milestone checkpoint holds
{step, model params+stats, optimizer state, EMA shadow}; `load(milestone)`
restores everything; `load(..., return_unet=True)`'s teacher-extraction use
case is served by `ema/online_variables` on the restored state.
Checkpoints live at <results_folder>/model-<milestone> (a directory per
milestone, matching the reference's model-{milestone}.pt naming).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import numpy as np
import orbax.checkpoint as ocp


def _path(results_folder: str, milestone: int | str) -> str:
    return os.path.abspath(os.path.join(results_folder, f"model-{milestone}"))


# --------------------------------------------------------------- migration
#
# Round 2 replaced ResnetBlock / PreNormResidual(LinearAttention) in the
# UNet with the Pallas-fused FusedResnetBlock / FusedLinearAttentionBlock.
# Parameter counts, shapes (module reshaping aside) and initializers are
# unchanged, but the parameter TREE renamed (block1/proj/kernel ->
# conv1_kernel, ...), so pre-fused milestone checkpoints stopped restoring.
# These structural remaps migrate such checkpoints on load — both the
# params/ema_params subtrees and the matching Adam mu/nu subtrees inside
# opt_state (the walk is purely structural, so it applies anywhere the
# pattern occurs).


def _walk(node: Any, name: str, fn: Callable[[dict, str], Optional[dict]]) -> Any:
    """Recursively apply fn to every dict node (children first); fn returns a
    replacement dict or None. Tuples/namedtuples/lists (optax states) are
    traversed and rebuilt."""
    if isinstance(node, dict):
        node = {k: _walk(v, k, fn) for k, v in node.items()}
        rep = fn(node, name)
        return node if rep is None else rep
    if isinstance(node, tuple):
        vals = [_walk(v, name, fn) for v in node]
        return type(node)(*vals) if hasattr(node, "_fields") else tuple(vals)
    if isinstance(node, list):
        return [_walk(v, name, fn) for v in node]
    return node


def _is_legacy_resnet(d: dict) -> bool:
    return {"block1", "block2", "tc_mlp"} <= set(d) and isinstance(d["block1"], dict)


def _is_legacy_linattn(d: dict) -> bool:
    if set(d) - {"norm"} == set(d) or len(d) != 2 or "norm" not in d:
        return False
    inner = next(v for k, v in d.items() if k != "norm")
    return isinstance(inner, dict) and "to_qkv" in inner and "out_norm" in inner


def legacy_to_fused(tree: Any) -> Any:
    """Pre-round-2 (unfused) checkpoint tree -> fused parameter names."""

    def fn(d: dict, name: str) -> Optional[dict]:
        if _is_legacy_resnet(d):
            b1, b2 = d["block1"], d["block2"]
            out = {
                "tc_mlp": d["tc_mlp"],
                "conv1_kernel": b1["proj"]["kernel"], "conv1_bias": b1["proj"]["bias"],
                "norm1_g": b1["norm"]["g"],
                "conv2_kernel": b2["proj"]["kernel"], "conv2_bias": b2["proj"]["bias"],
                "norm2_g": b2["norm"]["g"],
            }
            if "res_conv" in d:
                k = d["res_conv"]["kernel"]  # (1,1,Cin,Cout) -> (Cin,Cout)
                out["res_kernel"] = np.asarray(k).reshape(k.shape[-2], k.shape[-1])
                out["res_bias"] = d["res_conv"]["bias"]
            return out
        if _is_legacy_linattn(d):
            inner = next(v for kk, v in d.items() if kk != "norm")
            qkv = np.asarray(inner["to_qkv"]["kernel"])  # (1,1,C,3F)
            outk = np.asarray(inner["to_out"]["kernel"])  # (1,1,F,C)
            return {
                "norm_g": d["norm"]["g"],
                "qkv_kernel": qkv.reshape(qkv.shape[-2], qkv.shape[-1]),
                "out_kernel": outk.reshape(outk.shape[-2], outk.shape[-1]),
                "out_bias": inner["to_out"]["bias"],
                "out_norm_g": inner["out_norm"]["g"],
            }
        return None

    return _walk(tree, "", fn)


def fused_to_legacy(tree: Any) -> Any:
    """Fused parameter tree -> the pre-round-2 module layout (value
    preserving). Used to build the restore template for legacy checkpoints
    (and to synthesize legacy trees in tests)."""

    def fn(d: dict, name: str) -> Optional[dict]:
        if {"conv1_kernel", "norm1_g", "tc_mlp"} <= set(d):
            out = {
                "tc_mlp": d["tc_mlp"],
                "block1": {"proj": {"kernel": d["conv1_kernel"], "bias": d["conv1_bias"]},
                           "norm": {"g": d["norm1_g"]}},
                "block2": {"proj": {"kernel": d["conv2_kernel"], "bias": d["conv2_bias"]},
                           "norm": {"g": d["norm2_g"]}},
            }
            if "res_kernel" in d:
                k = np.asarray(d["res_kernel"])  # (Cin,Cout) -> (1,1,Cin,Cout)
                out["res_conv"] = {"kernel": k.reshape(1, 1, *k.shape),
                                   "bias": d["res_bias"]}
            return out
        if {"qkv_kernel", "out_norm_g"} <= set(d):
            qkv = np.asarray(d["qkv_kernel"])  # (C,3F) -> (1,1,C,3F)
            outk = np.asarray(d["out_kernel"])  # (F,C) -> (1,1,F,C)
            return {
                "norm": {"g": d["norm_g"]},
                f"{name}_inner": {
                    "to_qkv": {"kernel": qkv.reshape(1, 1, *qkv.shape)},
                    "to_out": {"kernel": outk.reshape(1, 1, *outk.shape),
                               "bias": d["out_bias"]},
                    "out_norm": {"g": d["out_norm_g"]},
                },
            }
        return None

    return _walk(tree, "", fn)


def save_checkpoint(results_folder: str, milestone: int | str, tree: Any) -> str:
    path = _path(results_folder, milestone)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
    return path


def load_checkpoint(results_folder: str, milestone: int | str, target: Any = None) -> Any:
    path = _path(results_folder, milestone)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        if target is not None:
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(item=target))
        return ckptr.restore(path)
    except ValueError as e:
        # Tree mismatch. If the target uses the fused layer names, try the
        # pre-round-2 layout: restore against a legacy-shaped template and
        # remap onto the fused names (pure rename+reshape, values intact).
        if target is not None:
            legacy_target = fused_to_legacy(target)
            if _tree_shapes(legacy_target) != _tree_shapes(target):
                try:
                    restored = ocp.PyTreeCheckpointer().restore(
                        path, args=ocp.args.PyTreeRestore(item=legacy_target))
                    migrated = legacy_to_fused(restored)
                    if _tree_shapes(migrated) == _tree_shapes(target):
                        print(f" restored legacy (pre-fused) checkpoint "
                              f"{os.path.basename(path)} via key-remap migration")
                        return migrated
                except Exception:
                    pass
        # orbax's structure-diff formatter itself can crash (array truth
        # value) while REPORTING a tree mismatch — surface the real cause:
        # the checkpoint predates a change in the model's parameter tree
        raise ValueError(
            f"checkpoint at {path} does not match the current model's "
            "parameter tree (it was written by an older/incompatible model "
            "version); retrain or point --resume_niter at a compatible run"
        ) from e


def _tree_shapes(tree: Any) -> list:
    """Flattened (path, shape) signature for structural comparison."""
    out = []

    def rec(node, path):
        if isinstance(node, dict):
            for k in sorted(node):
                rec(node[k], path + (k,))
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                rec(v, path + (i,))
        else:
            out.append((path, tuple(getattr(node, "shape", ()))))

    rec(tree, ())
    return out


def checkpoint_exists(results_folder: str, milestone: int | str) -> bool:
    return os.path.isdir(_path(results_folder, milestone))
