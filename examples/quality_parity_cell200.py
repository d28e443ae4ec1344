"""Torch-vs-JAX QUALITY parity on the Cell-200 fixture (VERDICT r3 'next' #3).

The north star has two halves; speed was anchored in round 2
(`bench_reference_cpu.py`), but SFID/LS parity with the reference had never
been measured — in particular the teacher's anomalous PRDC recall (0.015 vs
the 0.233 split-half control, round-3 eval) had no torch column to compare
against. This script trains BOTH stacks at an IDENTICAL reduced config on
the SAME fixture h5, samples both with the same schedule, and scores both
fake sets through the SAME `eval/protocol.py` pass with the same pinned
backbones. If torch shows the same coverage collapse at equal steps, the
framework is vindicated; if not, there is a deviation to hunt.

The reference is imported and RUN from /root/reference at runtime — no code
is copied. Its vanilla Cell-200 `main.py` executes at module level and
hard-codes `.cuda()`; `_install_stubs()` makes that runnable on this
CPU-only box (torchvision/moviepy import stubs + `.cuda()` as identity),
exactly the pattern of `bench_reference_cpu.py`.

Identical reduced config (both stacks; canonical values from the reference
script `CCDM_vanilla/Cell-200/.../CCDM/scripts/run_train.sh` except where
the 1-core CPU budget forces the reduction):
  niters 1200 (ref 20000; was 2000 in the r4 design — the first torch
  attempt died at iter 214 when the session clock ran out, and at the
  measured contended rate of 4.5-6.5 s/it on this 1-core box 2000 iters
  cannot complete inside a session; BOTH stacks get the same 1200),
  batch 16 (ref 128), lr 1e-4, T=1000, pred_x0,
  hard vicinity, sigma/kappa rule-of-thumb (-1), embed CNN 5 epochs
  (ref 200; one ResNet34 epoch costs ~9 min on the 1-core box, so the embed
  budget is the binding constraint — both stacks get the SAME 5), y2h 60
  epochs (ref 500), DDIM-25 @ cond_scale 1.5 (ref 250), 5 fakes x 200 labels.

Phases (run separately — torch takes hours on 1 core):
  python examples/quality_parity_cell200.py --phase torch [--resume_niter N]
  python examples/quality_parity_cell200.py --phase jax
  python examples/quality_parity_cell200.py --phase score
"""

from __future__ import annotations

import argparse
import os
import runpy
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_DIR = "/root/reference/CCDM_vanilla/Cell-200/Cell-200_64x64/CCGM/CCDM"
RUNS = os.path.join(REPO, "runs", "parity_cell200")
DATA = os.path.join(REPO, "runs", "datasets_fixture")

# ---- the identical config (see module docstring for ref provenance)
NITERS = 1200
BATCH = 16
LR = "1e-4"
EPOCH_CNN = 5
EPOCH_Y2H = 60
SAMPLE_T = 25
COND_SCALE = 1.5
NFAKE_PER_LABEL = 5
SAMP_BS = 50
SEED = 111


def _install_stubs() -> None:
    """Import stubs for packages the reference needs but this image lacks
    (torchvision, moviepy), plus `.cuda()` as identity on a CPU-only torch."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.ModuleType("torchvision.datasets")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tvu = types.ModuleType("torchvision.utils")

        def save_image(tensor, fp, nrow=8, normalize=False, **_):
            from PIL import Image
            arr = tensor.detach().cpu().numpy()
            n, c, h, w = arr.shape
            rows = (n + nrow - 1) // nrow
            grid = np.zeros((c, rows * h, nrow * w), arr.dtype)
            for i in range(n):
                r, co = divmod(i, nrow)
                grid[:, r * h:(r + 1) * h, co * w:(co + 1) * w] = arr[i]
            g = np.clip(grid * 255.0 if grid.max() <= 1.0 else grid, 0, 255)
            g = g.astype(np.uint8).transpose(1, 2, 0)
            Image.fromarray(g[..., 0] if c == 1 else g).save(fp)

        tvu.save_image = save_image
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.datasets"] = tv.datasets
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.utils"] = tvu
    if "moviepy" not in sys.modules:
        mp = types.ModuleType("moviepy")
        mpe = types.ModuleType("moviepy.editor")
        mpe.ImageSequenceClip = object  # only used by generate_intermediate_gifs
        mp.editor = mpe
        sys.modules["moviepy"] = mp
        sys.modules["moviepy.editor"] = mpe

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]


def phase_torch(resume_niter: int) -> None:
    _install_stubs()
    root = os.path.join(RUNS, "torch")
    os.makedirs(root, exist_ok=True)
    sys.path.insert(0, REF_DIR)
    sys.argv = [
        "main.py",
        "--root_path", root, "--data_path", DATA, "--eval_ckpt_path", root,
        "--seed", str(SEED), "--setting_name", "parity",
        "--image_size", "64", "--pred_objective", "pred_x0",
        "--model_channels", "32", "--num_res_blocks", "2", "--num_groups", "8",
        "--cond_drop_prob", "0.1", "--attention_resolutions", "16_32",
        "--channel_mult", "1_2_2_4",
        "--niters", str(NITERS), "--resume_niter", str(resume_niter),
        "--train_lr", LR, "--train_timesteps", "1000",
        "--train_batch_size", str(BATCH), "--gradient_accumulate_every", "1",
        "--kernel_sigma", "-1.0", "--threshold_type", "hard", "--kappa", "-1.0",
        "--epoch_cnn_embed", str(EPOCH_CNN), "--epoch_net_y2h", str(EPOCH_Y2H),
        # in-train sampling/eval off: sampling happens below, scoring in
        # --phase score through the shared protocol
        "--sample_every", "1000000", "--save_every", "500",
        "--sample_timesteps", str(SAMPLE_T),
        "--sample_cond_scale", str(COND_SCALE), "--sampler", "ddim",
    ]
    t0 = time.time()
    g = runpy.run_path(os.path.join(REF_DIR, "main.py"), run_name="parity_ref")
    print(f"[parity torch] reference train done in {time.time() - t0:.0f}s")

    trainer, net_y2h = g["trainer"], g["net_y2h"]
    fn_norm = g["fn_norm_labels"]
    eval_labels = np.arange(1, 201).astype(float)
    fake_labels = np.repeat(eval_labels, NFAKE_PER_LABEL)
    t0 = time.time()
    fakes, _ = trainer.sample_given_labels(
        given_labels=fn_norm(fake_labels), net_y2h=net_y2h,
        batch_size=SAMP_BS, denorm=True, to_numpy=True, verbose=True,
        sampler="ddim", cond_scale=COND_SCALE, sample_timesteps=SAMPLE_T,
        ddim_eta=0,
    )
    sample_time = time.time() - t0
    import h5py

    out = os.path.join(RUNS, "torch_fakes.h5")
    with h5py.File(out, "w") as f:
        f.create_dataset("fake_images", data=fakes, dtype="uint8",
                         compression="gzip", compression_opts=6)
        f.create_dataset("fake_labels", data=fake_labels)
        f.create_dataset("sample_time", data=np.array([sample_time]))
    print(f"[parity torch] wrote {out}: {fakes.shape}, sampled in {sample_time:.0f}s")


def phase_jax() -> None:
    from ccdm_tpu import main as cli

    root = os.path.join(RUNS, "jax")
    cli.main([
        "--root_path", root, "--data_name", "Cell200", "--data_path", DATA,
        "--eval_ckpt_path", root, "--seed", str(SEED),
        "--setting_name", "parity",
        "--image_size", "64", "--min_label", "1", "--max_label", "200",
        "--num_channels", "1", "--pred_objective", "pred_x0",
        "--model_channels", "32", "--channel_mult", "1_2_2_4",
        "--cond_drop_prob", "0.1",
        "--y2h_embed_type", "resnet",  # label_embed=ccdm1: y2h only, like the vanilla ref
        "--epoch_cnn_embed", str(EPOCH_CNN), "--epoch_net_y2h", str(EPOCH_Y2H),
        "--niters", str(NITERS), "--train_lr", LR, "--train_timesteps", "1000",
        "--train_batch_size", str(BATCH),
        "--kernel_sigma", "-1.0", "--threshold_type", "hard", "--kappa", "-1.0",
        "--sample_every", "1000000", "--save_every", str(NITERS),
        "--sampler", "ddim", "--sample_timesteps", str(SAMPLE_T),
        "--sample_cond_scale", str(COND_SCALE),
        "--nfake_per_label", str(NFAKE_PER_LABEL),
        "--samp_batch_size", str(SAMP_BS), "--dump_fake_data",
    ])
    print("[parity jax] done; fakes under", root)


def _load_jax_fakes():
    import glob

    import h5py

    pattern = os.path.join(RUNS, "jax", "output", "Cell200_64", "parity",
                           "results", "fake_data_*", "*.h5")
    files = sorted(glob.glob(pattern))
    assert files, f"no jax fakes under {pattern}; run --phase jax first"
    imgs, labels = [], []
    for fp in files:
        with h5py.File(fp, "r") as f:
            imgs.append(f["fake_images_i"][:])
            labels.append(f["fake_labels_i"][:])
    return np.concatenate(imgs), np.concatenate(labels).astype(float)


def phase_score() -> None:
    import h5py

    from ccdm_tpu.data import load_dataset
    from ccdm_tpu.eval.protocol import run_ccgm_eval
    from ccdm_tpu.opts import parse_opts

    args = parse_opts([
        "--data_name", "Cell200", "--data_path", DATA,
        "--eval_ckpt_path", os.path.join(RUNS, "shared_eval"),
        "--seed", str(SEED), "--image_size", "64",
        "--min_label", "1", "--max_label", "200", "--num_channels", "1",
        "--niters", str(NITERS),
        "--comp_FID", "--eval_mode", "2", "--comp_prdc", "--comp_intra_fid",
        "--comp_niqe", "--epochs_eval_ae", "10", "--epochs_eval_cnn", "20",
    ])
    bundle = load_dataset("Cell200", DATA, image_size=64, min_label=1,
                          max_label=200)

    with h5py.File(os.path.join(RUNS, "torch_fakes.h5"), "r") as f:
        torch_fakes = f["fake_images"][:]
        torch_labels = f["fake_labels"][:]
        torch_time = float(f["sample_time"][0])
    if torch_fakes.shape[1] in (1, 3) and torch_fakes.shape[1] != torch_fakes.shape[-1]:
        torch_fakes = torch_fakes.transpose(0, 2, 3, 1)  # NCHW -> NHWC

    jax_fakes, jax_labels = _load_jax_fakes()

    import json

    results = {}
    for name, fk, fl, tt in (("torch", torch_fakes, torch_labels, torch_time),
                             ("jax", jax_fakes, jax_labels, 0.0)):
        folder = os.path.join(RUNS, f"score_{name}")
        os.makedirs(folder, exist_ok=True)
        cache = os.path.join(RUNS, f"score_{name}.json")
        if os.path.exists(cache):  # resume: column already scored
            with open(cache) as f:
                results[name] = json.load(f)
            print(f"[parity score] {name}: cached column loaded")
            continue
        print(f"[parity score] scoring {name}: {fk.shape}")
        results[name] = run_ccgm_eval(args, bundle, fk, fl.astype(np.float32),
                                      folder, total_time=tt)
        with open(cache, "w") as f:  # survive a session death per-column
            json.dump({k: v for k, v in results[name].items()
                       if isinstance(v, (int, float, str))}, f)

    lines = ["# Torch-vs-JAX quality parity — Cell-200 fixture, identical reduced config",
             "",
             f"config: niters={NITERS} batch={BATCH} lr={LR} pred_x0 hard "
             f"sigma/kappa=-1 embed {EPOCH_CNN}/{EPOCH_Y2H}ep "
             f"DDIM-{SAMPLE_T}@{COND_SCALE} {NFAKE_PER_LABEL}x200 fakes "
             f"seed {SEED}; shared pinned backbones under runs/parity_cell200/shared_eval",
             "",
             "| metric | torch (reference) | jax (this framework) |",
             "|---|---|---|"]
    keys = sorted(set(results["torch"]) | set(results["jax"]))
    for k in keys:
        tv = results["torch"].get(k, "-")
        jv = results["jax"].get(k, "-")
        fmt = lambda v: f"{v:.4f}" if isinstance(v, (int, float)) else str(v)
        lines.append(f"| {k} | {fmt(tv)} | {fmt(jv)} |")
    out = os.path.join(RUNS, "PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"[parity score] wrote {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--phase", choices=["torch", "jax", "score"], required=True)
    p.add_argument("--resume_niter", type=int, default=0)
    a = p.parse_args()
    os.makedirs(RUNS, exist_ok=True)
    if a.phase == "torch":
        phase_torch(a.resume_niter)
    elif a.phase == "jax":
        phase_jax()
    else:
        phase_score()
