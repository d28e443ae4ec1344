"""Training + sampling entry point (reference `CCDM_unified/main.py` parity).

Flow (ref main.py:47-594): parse flags -> output dirs + setting_info.txt ->
load dataset -> vicinal hyperparams (inside Trainer) -> label embedding ->
build denoiser -> GaussianDiffusion -> Trainer (+resume) -> train ->
per-eval-label sampling with restartable gzip-6 h5 dumps incl. sample_time_i
(ref main.py:483-594) and 36-image PNG grids.

Run:  python -m ccdm_tpu.main --data_name RC-49 --data_path ... --niters 50000 ...
"""

from __future__ import annotations

import gc
import os
import timeit

import numpy as np

from ccdm_tpu.opts import parse_opts, parse_channel_mult


def get_eval_labels(bundle, args) -> np.ndarray:
    """Eval label grid by eval_mode (vanilla opts.py:74-88 semantics):
    1: unique train labels; 2: unique labels of the full raw set;
    3: unseen (raw-set labels not in the train subset); 4: linspace grid.

    Multi-dim labels (power_vector): unique ROWS of the eval/train label
    matrix — the reference's own sampling loop would shape-error here
    (`curr_label * np.ones(nfake)` with a vector curr_label,
    CCDM_unified/main.py:525); we return [N,D] and tile downstream."""
    if getattr(bundle, "label_dim", 1) > 1:
        rows = (bundle.eval_labels_raw
                if bundle.eval_labels_raw is not None else bundle.labels_raw)
        if args.eval_mode == 1:
            rows = bundle.labels_raw
        return np.unique(np.asarray(rows, np.float64), axis=0)
    train_unique = np.sort(np.unique(bundle.labels_raw))
    if args.eval_mode == 1:
        return train_unique
    all_unique = (
        np.sort(np.unique(bundle.eval_labels_raw))
        if bundle.eval_labels_raw is not None else train_unique
    )
    if args.eval_mode == 2:
        return all_unique
    if args.eval_mode == 3:
        unseen = np.setdiff1d(all_unique, train_unique)
        return unseen if len(unseen) else all_unique
    num = args.FID_num_centers if args.FID_num_centers > 0 else len(all_unique)
    return np.linspace(all_unique.min(), all_unique.max(), num)


def resolve_label_embed(args) -> None:
    """--label_embed picks the embedding pipeline family (ref main.py:303-338):
    ccdm1 -> y2h only; ccdm2 -> y2h + y2cov (the Hy covariance source);
    random -> Gaussian-Fourier y2h, no training. Mutates args in place."""
    if args.label_embed == "random":
        args.y2h_embed_type = "gaussian"
    if args.use_Hy and args.label_embed != "ccdm2":
        raise SystemExit(
            f"--use_Hy needs the y2cov pipeline: --label_embed ccdm2 "
            f"(got {args.label_embed})"
        )


def build_model(args, image_size: int, channels: int):
    from ccdm_tpu.models import Unet, ViT
    from ccdm_tpu.models.unet_adm import ADMUnet
    import jax.numpy as jnp

    mults = parse_channel_mult(args.channel_mult)
    dtype = jnp.bfloat16 if args.train_amp else jnp.float32
    if args.architecture == "vit":
        return ViT(dim=args.model_channels, dim_mults=mults, in_channels=channels,
                   attn_heads=args.num_heads, dtype=dtype)
    if args.architecture == "adm":
        attn_res = tuple(int(s) for s in args.attention_resolutions.split("_"))
        return ADMUnet(model_channels=args.model_channels, channel_mult=mults,
                       in_channels=channels, num_res_blocks=args.num_res_blocks,
                       attention_resolutions=attn_res, num_heads=args.num_heads,
                       num_groups=args.num_groups, dtype=dtype)
    return Unet(dim=args.model_channels, dim_mults=mults, in_channels=channels,
                attn_heads=args.num_heads, attn_dim_head=args.attn_dim_head, dtype=dtype)


def main(argv=None):
    import h5py
    import jax
    import jax.numpy as jnp

    from ccdm_tpu.data import load_dataset
    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.training import Trainer, TrainerConfig
    from ccdm_tpu.utils.ckpt import checkpoint_exists
    from ccdm_tpu.utils.viz import save_image_grid

    from ccdm_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    # multi-host (DCN) bootstrap BEFORE any device query; no-op unless the
    # CCDM_COORD_ADDR/CCDM_NUM_PROCS/CCDM_PROC_ID env triplet is set
    from ccdm_tpu.parallel.mesh import init_distributed

    if init_distributed():
        print(f" jax.distributed: process {jax.process_index()}"
              f"/{jax.process_count()}, {jax.local_device_count()} local"
              f" / {jax.device_count()} global devices")
    args = parse_opts(argv)
    np.random.seed(args.seed)

    # output dirs + args dump (ref main.py:78-86)
    setting_folder = os.path.join(
        args.root_path, "output", f"{args.data_name}_{args.image_size}", args.setting_name
    )
    os.makedirs(setting_folder, exist_ok=True)
    results_folder = os.path.join(setting_folder, "results")
    os.makedirs(results_folder, exist_ok=True)
    with open(os.path.join(setting_folder, "setting_info.txt"), "a") as f:
        f.write("\n" + "=" * 99 + "\n")
        print(args, file=f)

    # dataset
    ds_kwargs = dict(image_size=args.image_size)
    if args.data_name == "RC-49":
        ds_kwargs.update(min_label=args.min_label, max_label=args.max_label,
                         max_num_img_per_label=args.max_num_img_per_label,
                         data_split=args.data_split)
    elif args.data_name == "UTKFace":
        ds_kwargs.update(min_label=args.min_label, max_label=args.max_label,
                         max_num_img_per_label=args.max_num_img_per_label,
                         num_img_per_label_after_replica=args.num_img_per_label_after_replica)
    elif args.data_name == "SteeringAngle":
        ds_kwargs.update(min_label=args.min_label, max_label=args.max_label,
                         max_num_img_per_label=args.max_num_img_per_label)
    elif args.data_name == "Cell200":
        ds_kwargs.update(min_label=args.min_label, max_label=args.max_label,
                         stepsize=args.stepsize, num_imgs_per_label=args.num_imgs_per_label)
    elif args.data_name == "power_vector":
        # Sliced-CCDM multi-dim-label dataset (ref main.py:96-110); the
        # reference constructs-but-disables the PowerTransformer — ours is
        # an opt-in flag
        ds_kwargs = {}
        if args.design_folder != "None":
            ds_kwargs["design_folder"] = args.design_folder
        if args.power_data_path != "None":
            ds_kwargs["power_path"] = args.power_data_path
        if args.use_power_transformer:
            from ccdm_tpu.data.power import PowerTransformer

            pp = ds_kwargs.get("power_path",
                               os.path.join(args.data_path, "power.csv"))
            ds_kwargs["power_transformer"] = PowerTransformer().fit(
                np.loadtxt(pp, delimiter=",", skiprows=1))
    elif args.data_name == "synthetic_power":
        ds_kwargs.update(label_dim=args.label_dim, seed=args.seed)
        if args.synthetic_n > 0:
            ds_kwargs["n"] = args.synthetic_n
    else:  # synthetic
        ds_kwargs.update(channels=args.num_channels)
        if args.synthetic_n > 0:
            ds_kwargs["n"] = args.synthetic_n
    bundle = load_dataset(args.data_name, args.data_path, **ds_kwargs)
    print(f"\n {args.data_name}: {len(bundle.images)} train images, "
          f"{bundle.image_size}^2 x{bundle.channels}, label_dim={bundle.label_dim}")

    # auto num_projections by label dim (ref main.py:260-274)
    if args.vicinity_type in ("shv", "ssv") and args.num_projections <= 0:
        d = bundle.label_dim
        args.num_projections = 10 if d > 20 else 5 if d > 10 else 3 if d > 5 else 1
        print(f"\r Auto-set num_projections={args.num_projections} for label_dim={d}")

    # label embedding (shared construction seam — also used by dmd_main/serve)
    resolve_label_embed(args)
    from ccdm_tpu.embedding.resolve import build_label_embedding

    fn_y2h, fn_y2cov = build_label_embedding(args, setting_folder, bundle=bundle)

    # denoiser + diffusion
    model = build_model(args, bundle.image_size, bundle.channels)
    key = jax.random.PRNGKey(args.seed)
    variables = model.init(
        key,
        jnp.zeros((2, bundle.image_size, bundle.image_size, bundle.channels)),
        jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, args.dim_embed)),
        None,
        train=False,
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    print(f" model params: {n_params/1e6:.2f}M")

    dcfg = DiffusionConfig(
        image_size=bundle.image_size,
        channels=bundle.channels,
        timesteps=args.train_timesteps,
        sampling_timesteps=args.sample_timesteps,
        objective=args.pred_objective,
        beta_schedule=args.beta_schedule,
        ddim_sampling_eta=args.ddim_eta,
        cond_drop_prob=args.cond_drop_prob,
        use_Hy=args.use_Hy,
        hy_max_log=args.hy_max_log,
        vicinity_type=args.vicinity_type,
        distance=args.distance,
        vector_type=args.vector_type,
        num_projections=args.num_projections,
    )
    diffusion = GaussianDiffusion(model.apply, dcfg, fn_y2cov=fn_y2cov)

    # visual grid labels: 9 quantiles x nrow repeats (ref main.py:418-424 spirit)
    uniq = np.sort(np.unique(bundle.labels_norm.reshape(len(bundle.labels_norm), -1)[:, 0]))
    y_visual = np.repeat(np.quantile(uniq, np.linspace(0.05, 0.95, 6)), 6).astype(np.float32)

    tcfg = TrainerConfig(
        data_name=bundle.name,
        train_batch_size=args.train_batch_size,
        gradient_accumulate_every=args.gradient_accumulate_every,
        train_lr=args.train_lr,
        train_num_steps=args.niters,
        sample_every=args.sample_every,
        save_every=args.save_every,
        results_folder=results_folder,
        vicinity_type=args.vicinity_type,
        kappa=args.kappa,
        kernel_sigma=args.kernel_sigma,
        nonzero_soft_weight_threshold=args.nonzero_soft_weight_threshold,
        vector_type=args.vector_type,
        num_projections=args.num_projections,
        distance=args.distance,
        hyperparameter=args.hyperparameter,
        percentile=args.percentile,
        adaptive_slicing=args.adaptive_slicing,
        y_visual=y_visual,
        cond_scale_visual=args.sample_cond_scale,
        sample_timesteps_visual=min(args.sample_timesteps, 250),
        sample_precast_bf16=args.samp_precast_bf16,
        log_every=args.log_every,
        tb_log=args.tb_log,
        seed=args.seed,
    )
    # optional elastic aux loss: train-or-load the label regressor
    # (the reference keeps this block commented at vanilla main.py:287-308)
    aux_info = None
    if args.lambda_aux > 0:
        from ccdm_tpu.training.train_aux import get_aux_net

        aux_apply = get_aux_net(bundle, setting_folder, name=args.net_aux,
                                epochs=args.epoch_aux,
                                batch_size=args.batch_size_aux, seed=args.seed)
        aux_info = {"apply": aux_apply, "lambda_aux": args.lambda_aux,
                    "aux_start_step": args.aux_start_step}

    trainer = Trainer(diffusion, variables, bundle.images, bundle.labels_norm, tcfg,
                      aux_info=aux_info)
    print(f" sigma_delta={trainer.sigma_delta}, kappa={trainer.kappa}")

    if args.resume_niter > 0 and checkpoint_exists(results_folder, args.resume_niter):
        trainer.load(args.resume_niter)
        print(f" resumed from milestone {args.resume_niter}")

    trainer.train(fn_y2h)
    trainer.save(args.niters)

    from ccdm_tpu.training.state import ema_variables

    if args.gif_trajectory:
        # denoising-trajectory GIF for the visual label grid (vanilla
        # trainer.py:421-458 generate_intermediate_gifs)
        from ccdm_tpu.utils.viz import save_gif

        y = jnp.asarray(y_visual.reshape(len(y_visual), -1))
        frames = diffusion.ddim_sample(
            ema_variables(trainer.state), jax.random.PRNGKey(args.seed),
            fn_y2h(y), labels=y, cond_scale=args.sample_cond_scale,
            sampling_timesteps=min(args.sample_timesteps, 50),
            save_intermediate=True,
        )
        gif_path = os.path.join(results_folder, f"trajectory_niters{args.niters}.gif")
        save_gif(np.asarray(frames), gif_path, nrow=6)
        print(f" trajectory GIF -> {gif_path}")

    if args.interpolation:
        # latent blending between two real eval images at the median label
        # (vanilla diffusion.py:369-383 interpolate)
        from ccdm_tpu.ops.image import to_uint8
        from ccdm_tpu.utils.viz import save_image_grid

        order = np.argsort(bundle.labels_norm.reshape(len(bundle.labels_norm), -1)[:, 0])
        i0, i1 = order[len(order) // 4], order[3 * len(order) // 4]
        x_pair = bundle.images[[i0, i1]].astype(np.float32) / 255.0 * 2.0 - 1.0
        y_mid = np.median(bundle.labels_norm.reshape(len(bundle.labels_norm), -1)[:, 0])
        lams = np.linspace(0.0, 1.0, 8)
        rows = []
        for lam in lams:
            img = diffusion.interpolate(
                ema_variables(trainer.state), jax.random.PRNGKey(args.seed),
                jnp.asarray(x_pair[:1]), jnp.asarray(x_pair[1:]),
                fn_y2h(jnp.full((1, max(bundle.label_dim, 1)), y_mid)),
                t=min(args.train_timesteps // 4, 250), lam=float(lam),
            )
            rows.append(np.asarray(to_uint8((img + 1.0) / 2.0))[0])
        itp_path = os.path.join(results_folder, f"interpolation_niters{args.niters}.png")
        save_image_grid(np.stack(rows).astype(np.float32) / 255.0, itp_path,
                        nrow=len(lams))
        print(f" interpolation grid -> {itp_path}")

    # ---------------- per-eval-label sampling + h5 dump (main.py:483-594)
    eval_labels = get_eval_labels(bundle, args)
    num_eval = len(eval_labels)
    print(f"\n Start sampling {args.nfake_per_label} fakes/label for {num_eval} labels >>>")

    dump_folder = os.path.join(
        results_folder,
        f"fake_data_niters{args.niters}_nfake{int(args.nfake_per_label*num_eval)}"
        f"_{args.sampler}_sampstep{args.sample_timesteps}",
    )
    os.makedirs(dump_folder, exist_ok=True)

    total_time = 0.0
    multi_dim = eval_labels.ndim > 1
    all_fake_images, all_fake_labels = [], []
    for i, curr_label in enumerate(eval_labels):
        # vector labels get index-keyed files (a [D] vector is no filename);
        # scalar labels keep the reference's `{label}.h5` convention
        fp = os.path.join(dump_folder,
                          f"label_{i:05d}.h5" if multi_dim else f"{curr_label}.h5")
        if not os.path.isfile(fp):
            fake_labels_i = (np.tile(curr_label, (args.nfake_per_label, 1))
                             if multi_dim
                             else curr_label * np.ones(args.nfake_per_label))
            start = timeit.default_timer()
            fake_images_i, _ = trainer.sample_given_labels(
                given_labels=bundle.fn_normalize(fake_labels_i),
                fn_y2h=fn_y2h,
                batch_size=args.samp_batch_size,
                denorm=True, to_numpy=True,
                sampler=args.sampler,
                cond_scale=args.sample_cond_scale,
                sample_timesteps=args.sample_timesteps,
                ddim_eta=args.ddim_eta,
            )
            sample_time_i = timeit.default_timer() - start
            if args.dump_fake_data:
                # h5 persistence is opt-in (ref main.py:541); sampling and
                # the in-memory eval path run either way
                with h5py.File(fp, "w") as f:
                    f.create_dataset("fake_images_i", data=fake_images_i, dtype="uint8",
                                     compression="gzip", compression_opts=6)
                    f.create_dataset("fake_labels_i", data=fake_labels_i, dtype="float")
                    f.create_dataset("sample_time_i", data=np.array([sample_time_i]), dtype="float")
            grid_name = f"sample_{i:05d}.png" if multi_dim else f"sample_{curr_label}.png"
            save_image_grid(fake_images_i[:36].astype(np.float32) / 255.0,
                            os.path.join(dump_folder, grid_name), nrow=6)
        else:
            with h5py.File(fp, "r") as f:
                sample_time_i = float(f["sample_time_i"][0])
                if args.comp_FID or args.dump_fake_for_NIQE:
                    fake_images_i = f["fake_images_i"][:]
                    fake_labels_i = f["fake_labels_i"][:]
        total_time += sample_time_i
        if args.comp_FID or args.dump_fake_for_NIQE:
            all_fake_images.append(fake_images_i)
            all_fake_labels.append(fake_labels_i)
        print(f"\r [{i+1}/{num_eval}] label {curr_label}: {sample_time_i:.2f}s "
              f"(total {total_time:.2f}s)")
        gc.collect()

    print(f"Sampling finished; Time elapses: {total_time}s")

    if args.dump_fake_for_NIQE:
        # PNG dump for external MATLAB NIQE (vanilla main.py:498-513), then exit
        from PIL import Image

        niqe_dir = (args.niqe_dump_path if args.niqe_dump_path != "None"
                    else os.path.join(results_folder, "saved_images", "fake_images"))
        os.makedirs(niqe_dir, exist_ok=True)
        fakes = np.concatenate(all_fake_images, axis=0)
        flabels = np.concatenate(all_fake_labels)
        for i, (img, lab) in enumerate(zip(fakes, flabels)):
            arr = img[..., 0] if img.shape[-1] == 1 else img
            Image.fromarray(arr).save(os.path.join(niqe_dir, f"{i}_{lab}.png"))
        print(f"NIQE dump complete: {len(fakes)} PNGs -> {niqe_dir}")
        return

    if args.comp_FID and multi_dim:
        # the sliding-window SFID/LS protocol is scalar-label by construction
        # (vanilla main.py:562-643 slides over a 1-D label range); the
        # reference has NO eval path for power_vector at all — we stop with
        # the dumps rather than emit meaningless windows
        print(" comp_FID skipped: the SFID/LS sliding-window protocol is "
              "scalar-label; multi-dim runs produce sample dumps only.")
        return

    if args.comp_FID:
        from ccdm_tpu.eval.protocol import run_ccgm_eval

        # the full CCGM protocol (sliding-window SFID/LS/Diversity, FID,
        # PRDC + control, iFID, native NIQE, analysis passes) — shared with
        # dmd_main so teacher and one-step student score through the same
        # pinned backbones (eval/protocol.py)
        run_ccgm_eval(args, bundle,
                      np.concatenate(all_fake_images, axis=0),
                      np.concatenate(all_fake_labels),
                      setting_folder, total_time)


if __name__ == "__main__":
    main()
    # The axon PJRT client can hang interpreter teardown after all work is
    # complete (observed on-TPU: the CLI prints its final line, the process
    # never exits, and the chip stays held). All artifacts are on disk when
    # main() returns — flush and exit without running backend teardown.
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
