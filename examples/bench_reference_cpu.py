"""Anchor the software-efficiency ratio: reference PyTorch sampler vs this
framework's JAX sampler, SAME machine, SAME config, both on CPU.

Round-2 VERDICT missing #4: BASELINE.json's ">5x vs PyTorch-CUDA" target had
no measured reference number anywhere, and bench.py's `vs_baseline` compares
against our own round-0 JAX number. This script RUNS the reference's actual
torch model + DDIM sampler (imported from /root/reference at runtime — no
code copied) with the reference's own timing convention
(`CCDM_unified/main.py:525-552`: timeit around sample batches), then times
our jitted sampler at the identical config on the CPU backend.

CPU-vs-CPU isolates the SOFTWARE stack (graph capture, fusion, scheduling)
from the accelerator: it is NOT a TPU-vs-GPU claim. Results go to
BASELINE.md.

Run:  JAX_PLATFORM_NAME=cpu python examples/bench_reference_cpu.py [--steps 25]
(JAX_PLATFORM_NAME, not JAX_PLATFORMS — the axon plugin ignores the latter.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import timeit

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/CCDM_unified"

CFG = dict(img=64, nc=3, dim=32, mults=(1, 2, 2, 4), batch=8,
           timesteps=1000, cond_scale=1.5, objective="pred_x0")


def bench_torch(steps: int, reps: int) -> float:
    sys.path.insert(0, REF)
    import types

    import torch

    # the reference's unet.py imports torchvision (unused by the model);
    # torchvision isn't in this image — satisfy the import with a stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.ModuleType("torchvision.datasets")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
    from models.unet import Unet as TorchUnet
    from diffusion import GaussianDiffusion as TorchDiffusion

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    model = TorchUnet(dim=CFG["dim"], dim_mults=CFG["mults"],
                      in_channels=CFG["nc"], cond_drop_prob=0.1)
    model = torch.nn.DataParallel(model)  # diffusion.py uses model.module
    diffusion = TorchDiffusion(
        model, image_size=CFG["img"], timesteps=CFG["timesteps"],
        sampling_timesteps=steps, objective=CFG["objective"],
        beta_schedule="cosine", ddim_sampling_eta=0.0,
    )
    diffusion.eval()
    b = CFG["batch"]
    labels = torch.linspace(0.1, 0.9, b)
    emb = torch.rand(b, 128)  # conditioning vector; content is irrelevant to cost
    shape = (b, CFG["nc"], CFG["img"], CFG["img"])

    with torch.inference_mode():
        diffusion.ddim_sample(emb, labels, shape, cond_scale=CFG["cond_scale"])  # warmup
        start = timeit.default_timer()  # the reference's convention (main.py:525)
        for _ in range(reps):
            diffusion.ddim_sample(emb, labels, shape, cond_scale=CFG["cond_scale"])
        dt = (timeit.default_timer() - start) / reps
    return b / dt


def bench_jax(steps: int, reps: int) -> float:
    import jax
    import jax.numpy as jnp

    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.models import Unet

    assert jax.devices()[0].platform == "cpu", \
        "run with JAX_PLATFORM_NAME=cpu for an apples-to-apples CPU ratio"
    model = Unet(dim=CFG["dim"], dim_mults=CFG["mults"], in_channels=CFG["nc"])
    b = CFG["batch"]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, CFG["img"], CFG["img"], CFG["nc"])),
                           jnp.zeros((2,), jnp.int32), jnp.zeros((2, 128)),
                           None, train=False)
    dcfg = DiffusionConfig(image_size=CFG["img"], channels=CFG["nc"],
                           timesteps=CFG["timesteps"], sampling_timesteps=steps,
                           objective=CFG["objective"])
    diffusion = GaussianDiffusion(model.apply, dcfg)
    emb = jax.random.uniform(jax.random.PRNGKey(1), (b, 128))
    sample = jax.jit(lambda v, k, e: diffusion.ddim_sample(
        v, k, e, cond_scale=CFG["cond_scale"]))
    np.asarray(sample(variables, jax.random.PRNGKey(2), emb))  # compile+warmup
    start = timeit.default_timer()
    for i in range(reps):
        out = sample(variables, jax.random.PRNGKey(3 + i), emb)
    np.asarray(out)
    dt = (timeit.default_timer() - start) / reps
    return b / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=25,
                   help="DDIM steps (250 is the protocol; 25 keeps CPU "
                        "wall time sane — the ratio is step-count invariant)")
    p.add_argument("--reps", type=int, default=2)
    args = p.parse_args()

    if not os.path.isdir(REF):
        print(json.dumps({"error": f"reference not found at {REF}"}))
        return

    jax_ips = bench_jax(args.steps, args.reps)
    torch_ips = bench_torch(args.steps, args.reps)
    print(json.dumps({
        "config": {**CFG, "steps": args.steps, "device": "cpu"},
        "torch_reference_img_s": round(torch_ips, 4),
        "jax_ccdm_tpu_img_s": round(jax_ips, 4),
        "jax_over_torch": round(jax_ips / torch_ips, 3),
    }))


if __name__ == "__main__":
    main()
