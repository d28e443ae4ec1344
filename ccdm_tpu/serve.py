"""Batched inference serving for trained CCDM samplers.

The reference repo stops at offline h5 dumps (`CCDM_unified/main.py:483-594`);
this module adds the production-serving surface the TPU framework is meant
for: load an EMA milestone once, keep ONE jitted DDIM sampler warm at a
fixed batch shape (XLA recompiles on shape change — the service pads every
request to the compiled batch), and serve label→image requests over HTTP
with pure-stdlib plumbing (no extra dependencies).

    python -m ccdm_tpu.serve --root_path <run root> --data_name RC-49 \
        --serve_milestone 50000 --image_size 64 --model_channels 64 \
        --channel_mult 1_2_2_4_8 --serve_port 8600

API:
    GET  /healthz             -> {"status": "ok", "warm": true}
    POST /generate            body {"labels": [...in [0,1]...],
                                    "cond_scale": 1.5?, "seed": 0?}
                              -> {"images_b64": <base64 npz of uint8
                                  [N,H,W,C] under key 'images'>,
                                  "labels": [...], "time_s": ...}

Labels are NORMALIZED (the model's conditioning space, [0,1]); divide raw
labels by the dataset's max first, exactly as training does.

Operational contract:
- binds 127.0.0.1 by default (--serve_host 0.0.0.0 is an explicit opt-in:
  every /generate holds the accelerator for a full DDIM run);
- per-request label count capped (--serve_max_labels, 400 on violation);
- cond_scale is a TRACED argument of the one warm sampler — arbitrary
  per-request scales do NOT recompile (at most one extra compile if a
  client requests exactly 1.0, which uses the cheaper single-pass variant);
- resnet-ILI models load their trained y2h embedding from the run's
  embed_models cache; a missing cache fails at startup, never silently
  swaps embedding spaces.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from typing import Optional

import numpy as np


class SamplerService:
    """Owns the model, EMA weights, and the warm jitted sampler."""

    def __init__(self, args, max_batch: int = 64, warm: bool = True,
                 max_labels: int = 1024):
        import os

        import jax.numpy as jnp

        from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
        from ccdm_tpu.embedding.resolve import build_label_embedding
        from ccdm_tpu.main import build_model, resolve_label_embed
        from ccdm_tpu.training import Trainer, TrainerConfig
        from ccdm_tpu.utils.ckpt import checkpoint_exists

        resolve_label_embed(args)
        channels = args.num_channels
        model = build_model(args, args.image_size, channels)
        variables = model.init(
            __import__("jax").random.PRNGKey(args.seed),
            jnp.zeros((2, args.image_size, args.image_size, channels)),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2, args.dim_embed)),
            None, train=False,
        )
        setting_folder = os.path.dirname(os.path.abspath(args.results_folder))
        fn_y2h, fn_y2cov = build_label_embedding(
            args, setting_folder, bundle=None, require_cached=True)
        dcfg = DiffusionConfig(
            image_size=args.image_size, channels=channels,
            timesteps=args.train_timesteps,
            sampling_timesteps=args.sample_timesteps,
            objective=args.pred_objective, beta_schedule=args.beta_schedule,
            use_Hy=args.use_Hy,
            hy_max_log=getattr(args, "hy_max_log", 4.0),
        )
        diffusion = GaussianDiffusion(model.apply, dcfg, fn_y2cov=fn_y2cov)
        # serving needs no data: the Trainer is used purely as the EMA
        # state container + sampler cache (sample_given_labels)
        dummy = np.full((2, args.image_size, args.image_size, channels), 128,
                        np.uint8)  # trainer contract: raw uint8 with max>1
        tcfg = TrainerConfig(data_name=args.data_name, train_batch_size=2,
                             train_num_steps=1, results_folder=args.results_folder,
                             sample_every=10**9, save_every=10**9,
                             seed=args.seed,
                             sample_precast_bf16=args.samp_precast_bf16)
        self.trainer = Trainer(diffusion, variables, dummy,
                               np.array([0.25, 0.75], np.float32), tcfg)
        self.loaded_milestone: Optional[int] = None
        if args.serve_milestone > 0:
            if not checkpoint_exists(args.results_folder, args.serve_milestone):
                raise FileNotFoundError(
                    f"milestone {args.serve_milestone} not found under "
                    f"{args.results_folder}")
            self.trainer.load(args.serve_milestone)
            self.loaded_milestone = args.serve_milestone
        # Serving never trains: a resnet-ILI model loads its cached
        # embed_models from the run's setting folder (the parent of
        # results_folder) or fails fast with a clear FileNotFoundError —
        # NOT a silent fall-back to a different embedding space.
        self.fn_y2h = fn_y2h
        self.max_batch = max_batch
        self.max_labels = max_labels
        self.cond_scale = args.sample_cond_scale
        self.sample_timesteps = args.sample_timesteps
        self.sampler = args.sampler
        self._lock = threading.Lock()  # one accelerator, one sampler at a time
        self.warm = False
        if warm:  # compile the one (max_batch-shaped) sampler up front
            self.generate(np.full((max_batch,), 0.5, np.float32))
            self.warm = True

    def generate(self, labels01: np.ndarray, cond_scale: Optional[float] = None,
                 seed: Optional[int] = None) -> np.ndarray:
        """labels01 [N] in [0,1] -> uint8 images [N,H,W,C]. Thread-safe;
        pads to the compiled batch internally (sample_given_labels)."""
        labels01 = np.asarray(labels01, np.float32)
        if labels01.ndim != 1 or len(labels01) == 0:
            raise ValueError("labels must be a non-empty 1-D list")
        if len(labels01) > self.max_labels:
            raise ValueError(
                f"request too large: {len(labels01)} labels "
                f"(cap {self.max_labels}); split into smaller requests")
        if labels01.min() < 0.0 or labels01.max() > 1.0:
            raise ValueError("labels must be normalized to [0,1]")
        n = len(labels01)
        # pad to the ONE compiled batch shape: sample_given_labels caps its
        # batch at the request size, which would recompile per request length
        pad = (-n) % self.max_batch
        padded = np.concatenate([labels01, np.repeat(labels01[-1:], pad)])
        with self._lock:
            images, _ = self.trainer.sample_given_labels(
                padded, self.fn_y2h, batch_size=self.max_batch,
                denorm=True, to_numpy=True, sampler=self.sampler,
                cond_scale=self.cond_scale if cond_scale is None else cond_scale,
                sample_timesteps=self.sample_timesteps,
                key_base=1 if seed is None else int(seed),
            )
        return np.asarray(images[:n], np.uint8)


class GeneratorService:
    """One-step DMD2-M student serving: netG(z, y2h(y)) per request.

    This is the production-latency path the distillation exists for
    (ref dmd.py:900-940 one-step sampling): a /generate costs ONE generator
    forward instead of a 250-step scan — measured 15 451 img/s/chip at 64²
    on the v5e vs 16.6 for the DDIM-250 teacher. Same HTTP surface and
    operational contract as SamplerService; cond_scale is rejected
    (classifier-free guidance does not exist for the one-step student).
    """

    def __init__(self, args, max_batch: int = 64, warm: bool = True,
                 max_labels: int = 1024):
        import os

        import jax
        import jax.numpy as jnp

        from ccdm_tpu.embedding.resolve import build_label_embedding
        from ccdm_tpu.utils.ckpt import checkpoint_exists, load_checkpoint

        if args.gan_arch == "sngan":
            from ccdm_tpu.models.sngan import SNGANGenerator as Gen
        else:
            from ccdm_tpu.models.sagan import SAGANGenerator as Gen
        self.netG = Gen(dim_z=args.dim_z, dim_embed=args.dim_embed,
                        nc=args.num_channels, img_size=args.image_size,
                        gene_ch=args.gene_ch)

        name = f"dmd-{args.serve_milestone}"
        if not checkpoint_exists(args.results_folder, name):
            raise FileNotFoundError(
                f"DMD milestone {args.serve_milestone} not found under "
                f"{args.results_folder}")
        tree = load_checkpoint(args.results_folder, name)
        self.gvars = {"params": tree["gen_params"]}
        if tree.get("gen_stats"):
            self.gvars["batch_stats"] = tree["gen_stats"]
        self.loaded_milestone = args.serve_milestone

        # the student conditions through the TEACHER's embedding space
        # (embedding/resolve.py contract); load-only — never trains here
        setting_folder = os.path.dirname(os.path.abspath(args.results_folder))
        self.fn_y2h, _ = build_label_embedding(
            args, setting_folder, bundle=None, require_cached=True)

        dim_z = args.dim_z
        netG_apply, fn_y2h = self.netG.apply, self.fn_y2h

        @jax.jit
        def _gen(gv, key, y):
            z = jax.random.normal(key, (y.shape[0], dim_z))
            x = netG_apply(gv, z, fn_y2h(y), train=False)
            return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)

        self._gen = _gen
        self._jnp = jnp
        self._jax = jax
        self.max_batch = max_batch
        self.max_labels = max_labels
        self._lock = threading.Lock()
        self.warm = False
        if warm:
            self.generate(np.full((max_batch,), 0.5, np.float32))
            self.warm = True

    def generate(self, labels01: np.ndarray, cond_scale: Optional[float] = None,
                 seed: Optional[int] = None) -> np.ndarray:
        """labels01 [N] in [0,1] -> uint8 images [N,H,W,C] in ONE forward."""
        if cond_scale is not None:
            raise ValueError(
                "cond_scale is not applicable to the one-step DMD student "
                "(no classifier-free guidance pass exists)")
        labels01 = np.asarray(labels01, np.float32)
        if labels01.ndim != 1 or len(labels01) == 0:
            raise ValueError("labels must be a non-empty 1-D list")
        if len(labels01) > self.max_labels:
            raise ValueError(
                f"request too large: {len(labels01)} labels "
                f"(cap {self.max_labels}); split into smaller requests")
        if labels01.min() < 0.0 or labels01.max() > 1.0:
            raise ValueError("labels must be normalized to [0,1]")
        n = len(labels01)
        pad = (-n) % self.max_batch
        padded = np.concatenate([labels01, np.repeat(labels01[-1:], pad)])
        key = self._jax.random.PRNGKey(1 if seed is None else int(seed))
        out = []
        with self._lock:
            for i in range(0, len(padded), self.max_batch):
                imgs = self._gen(self.gvars, self._jax.random.fold_in(key, i),
                                 self._jnp.asarray(padded[i:i + self.max_batch]))
                out.append(np.asarray(imgs))
        images = np.concatenate(out, axis=0)[:n]
        return (images * 255.0 + 0.5).astype(np.uint8)


def _encode_images(images: np.ndarray) -> str:
    buf = io.BytesIO()
    np.savez_compressed(buf, images=images)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_handler(service: SamplerService):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", "warm": service.warm,
                                  "milestone": service.loaded_milestone})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                t0 = time.perf_counter()
                images = service.generate(
                    np.asarray(req["labels"], np.float32),
                    cond_scale=req.get("cond_scale"),
                    seed=req.get("seed"),
                )
                self._reply(200, {
                    "images_b64": _encode_images(images),
                    "labels": list(map(float, req["labels"])),
                    "time_s": round(time.perf_counter() - t0, 4),
                })
            except (KeyError, ValueError, TypeError) as e:
                self._reply(400, {"error": str(e)})

        def log_message(self, fmt, *a):  # quiet by default
            pass

    return Handler


def serve(service: SamplerService, port: int, host: str = "127.0.0.1"):
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print(f" serving on {host}:{port} (milestone={service.loaded_milestone})")
    httpd.serve_forever()


def main(argv=None):
    from ccdm_tpu.opts import parse_opts
    from ccdm_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    args = parse_opts(argv)
    import os

    args.results_folder = os.path.join(
        args.root_path, "output", f"{args.data_name}_{args.image_size}",
        args.setting_name, "results")
    service = SamplerService(args, max_batch=args.samp_batch_size,
                             max_labels=args.serve_max_labels)
    # binds loopback by default; every /generate costs a full accelerator
    # run, so external exposure (--serve_host 0.0.0.0) is an explicit opt-in
    serve(service, args.serve_port, host=args.serve_host)


if __name__ == "__main__":
    main()
