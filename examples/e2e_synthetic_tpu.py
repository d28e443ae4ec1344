"""End-to-end validation: train CCDM on synthetic 64^2 data, sample, score.

The SURVEY.md §7.2 minimum slice at realistic scale, runnable on one chip
without the benchmark h5 datasets: brightness-tracks-label images, hard
vicinal loss, EMA DDIM sampling, then a label-consistency check — the mean
brightness of samples must track the requested label.

Run:  python -u examples/e2e_synthetic_tpu.py [steps]
"""

import sys
import time

sys.path.insert(0, ".")

from ccdm_tpu.utils.compilation_cache import enable

enable()

import jax
import jax.numpy as jnp
import numpy as np

from ccdm_tpu.data import make_synthetic
from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
from ccdm_tpu.embedding import make_fn_y2h
from ccdm_tpu.models import Unet
from ccdm_tpu.training import Trainer, TrainerConfig


def main(steps: int = 800, mode: str = "full"):
    ds = make_synthetic(n=2000, image_size=64, channels=1, n_labels=100, seed=3)
    model = Unet(dim=32, dim_mults=(1, 2, 2, 4), in_channels=1, dtype=jnp.bfloat16)
    k = jax.random.PRNGKey(0)
    variables = model.init(k, jnp.zeros((2, 64, 64, 1)), jnp.zeros((2,), jnp.int32),
                           jnp.zeros((2, 128)), None, train=False)
    # pred_noise: uniform SNR loss weighting learns the conditioning signal
    # at high-noise steps far faster than pred_x0's SNR(t)->0 weighting (the
    # reference's 50K-300K-step budgets absorb that; this demo can't)
    dcfg = DiffusionConfig(image_size=64, channels=1, timesteps=1000,
                           sampling_timesteps=250, objective="pred_noise",
                           vicinity_type="hv", cond_drop_prob=0.1)
    diff = GaussianDiffusion(model.apply, dcfg)
    tcfg = TrainerConfig(data_name="synthetic", train_batch_size=128,
                         train_num_steps=steps, train_lr=1e-4,
                         results_folder="/tmp/e2e_tpu2", vicinity_type="hv",
                         sample_every=10**9, save_every=1000, log_every=100)
    tr = Trainer(diff, variables, ds.images, ds.labels_norm, tcfg)
    fn_y2h = make_fn_y2h(128)

    def latest_milestone():
        import glob, os, re

        best = None
        for d in glob.glob("/tmp/e2e_tpu2/model-*"):
            m = re.match(r".*model-(\w+)$", d)
            tag = m.group(1)
            try:
                step_no = int(tag)
            except ValueError:
                step_no = -1 if tag != "e2e" else 0
            if best is None or step_no > best[0]:
                best = (step_no, tag)
        return best[1] if best else None

    if mode in ("full", "train"):
        tag = latest_milestone()
        if tag is not None:
            tr.load(tag)
            print(f"resumed from model-{tag} at step {int(tr.state.step)}", flush=True)
        t0 = time.time()
        tr.train(fn_y2h, progress=True)
        dt = time.time() - t0
        done = steps - 0
        print(f"trained to {steps} steps in {dt:.0f}s "
              f"({128/max(dt/max(done,1),1e-9):.0f} imgs/s if uninterrupted)", flush=True)
        tr.save("e2e")
        if mode == "train":
            return
    else:
        tr.load(latest_milestone())
        print(f"loaded checkpoint at step {int(tr.state.step)}", flush=True)

    # label-consistency check: brightness must track the requested label
    probe = np.array([0.2, 0.5, 0.8], np.float32)
    imgs, _ = tr.sample_given_labels(np.repeat(probe, 16), fn_y2h, batch_size=48,
                                     sampler="ddim", cond_scale=1.5,
                                     sample_timesteps=250)
    bright = imgs.reshape(3, 16, -1).mean(axis=(1, 2)) / 255.0
    print("requested labels:", probe.tolist(), flush=True)
    print("sample mean brightness:", np.round(bright, 3).tolist(), flush=True)
    corr = np.corrcoef(probe, bright)[0, 1]
    print(f"label-brightness correlation: {corr:.3f}", flush=True)
    assert corr > 0.9, "conditioning failed to track labels"
    print("E2E OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 800,
         sys.argv[2] if len(sys.argv) > 2 else "full")
