"""DMD2-M distillation entry point (reference `CCDM_unified/dmd.py` parity).

The reference's dmd.py is unrunnable in the fork (imports `parse_opts_dmd2`
and `LoadDataSet` that exist nowhere — SURVEY.md §2.1 defects); the flag
surface here is reconstructed from `scripts/*/linux/run_dmd.sh` and the
upstream semantics: load a trained CCDM teacher from a Trainer milestone,
deep-copy into a trainable fake_unet, build SNGAN/SAGAN G/D, run the
three-loss DMD2 loop, then one-step-sample per eval label.

Run:  python -m ccdm_tpu.dmd_main --data_name RC-49 --teacher_milestone 50000 ...
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_opts_dmd(argv=None):
    p = argparse.ArgumentParser()
    # data / paths (shared surface with main.py)
    p.add_argument("--root_path", type=str, default="./")
    p.add_argument("--data_name", type=str, default="synthetic",
                   choices=["UTKFace", "RC-49", "Cell200", "SteeringAngle", "synthetic"])
    p.add_argument("--data_path", type=str, default="./datasets")
    p.add_argument("--setting_name", type=str, default="Setup1")
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--min_label", type=float, default=0.0)
    p.add_argument("--max_label", type=float, default=90.0)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--num_channels", type=int, default=3)
    p.add_argument("--max_num_img_per_label", type=int, default=int(1e30))
    # teacher
    p.add_argument("--teacher_setting_name", type=str, default=None,
                   help="setting dir of the trained CCDM teacher (default: setting_name)")
    p.add_argument("--teacher_milestone", type=int, required=False, default=0)
    p.add_argument("--model_channels", type=int, default=64)
    p.add_argument("--channel_mult", type=str, default="1_2_2_4_8")
    p.add_argument("--dim_embed", type=int, default=128)
    p.add_argument("--train_timesteps", type=int, default=1000)
    p.add_argument("--beta_schedule", type=str, default="cosine")
    p.add_argument("--use_Hy", action="store_true", default=False)
    p.add_argument("--hy_max_log", type=float, default=4.0,
                   help="cap on the y2cov log-scale h in Hy=exp(-h); "
                        "<=0 disables (exact reference semantics)")
    p.add_argument("--y2h_embed_type", type=str, default="sinusoidal",
                   choices=["resnet", "sinusoidal", "gaussian"])
    p.add_argument("--y2cov_embed_type", type=str, default="sinusoidal")
    # ILI embed-training hyperparameters (must match the teacher's so the
    # cached embed_models checkpoints are discovered; ref dmd.py:104-146
    # rebuilds the SAME LabelEmbed the teacher trained with)
    p.add_argument("--epoch_cnn_embed", type=int, default=200)
    p.add_argument("--epoch_net_y2h", type=int, default=500)
    p.add_argument("--epoch_cnn_embed_y2cov", type=int, default=10)
    p.add_argument("--epoch_net_y2cov", type=int, default=500)
    p.add_argument("--batch_size_embed", type=int, default=256)
    p.add_argument("--dim_combination", type=str, default="mean")
    # GAN
    p.add_argument("--gan_arch", type=str, default="sngan", choices=["sngan", "sagan"])
    p.add_argument("--gene_ch", type=int, default=64)
    p.add_argument("--disc_ch", type=int, default=64)
    p.add_argument("--dim_z", type=int, default=256)
    # DMD training
    p.add_argument("--niters", type=int, default=50000)
    p.add_argument("--resume_niter", type=int, default=0)
    p.add_argument("--train_batch_size", type=int, default=128)
    p.add_argument("--gradient_accumulate_every", type=int, default=1)
    p.add_argument("--train_lr_generator", type=float, default=1e-4)
    p.add_argument("--train_lr_guidance", type=float, default=1e-4)
    p.add_argument("--num_D_steps", type=int, default=2)
    p.add_argument("--weight_guidance_adv", type=float, default=10.0)
    p.add_argument("--weight_generator_adv", type=float, default=1.0)
    p.add_argument("--adv_loss_type", type=str, default="hinge", choices=["hinge", "vanilla"])
    p.add_argument("--gan_DiffAugment", action="store_true", default=False)
    p.add_argument("--gan_DiffAugment_policy", type=str, default="color,translation,cutout")
    p.add_argument("--min_step_percent", type=float, default=0.02)
    p.add_argument("--max_step_percent", type=float, default=0.98)
    p.add_argument("--kappa", type=float, default=-1.0)
    p.add_argument("--kernel_sigma", type=float, default=-1.0)
    p.add_argument("--sample_every", type=int, default=1000)
    p.add_argument("--save_every", type=int, default=5000)
    # sampling
    p.add_argument("--nfake_per_label", type=int, default=200)
    p.add_argument("--samp_batch_size", type=int, default=200)
    p.add_argument("--eval_mode", type=int, default=2)
    # analysis artifacts (StudioGAN -itp / -sefa parity over the one-step G)
    p.add_argument("--interpolation", action="store_true", default=False,
                   help="fix_z (label sweep) + fix_y (latent sweep) grids "
                        "(StudioGAN worker.py:1164-1218)")
    p.add_argument("--sefa", action="store_true", default=False,
                   help="closed-form semantic latent axes of netG's first "
                        "dense layer (StudioGAN utils/sefa.py:12-30)")
    # evaluation (the full CCGM protocol shared with main.py via
    # eval/protocol.py — point --eval_ckpt_path at the TEACHER's run dir so
    # the pinned backbones make teacher/student numbers comparable)
    p.add_argument("--comp_FID", action="store_true", default=False)
    p.add_argument("--FID_radius", type=float, default=0)
    p.add_argument("--FID_num_centers", type=int, default=-1)
    p.add_argument("--comp_prdc", action="store_true", default=False)
    p.add_argument("--prdc_nearest_k", type=int, default=5)
    p.add_argument("--comp_intra_fid", action="store_true", default=False)
    p.add_argument("--comp_niqe", action="store_true", default=False)
    p.add_argument("--niqe_patch", type=int, default=0)
    p.add_argument("--epochs_eval_ae", type=int, default=10)
    p.add_argument("--epochs_eval_cnn", type=int, default=20)
    p.add_argument("--eval_ckpt_path", type=str, default="./")
    # one-step student serving (python -m ccdm_tpu.serve_dmd)
    p.add_argument("--serve_port", type=int, default=8600)
    p.add_argument("--serve_host", type=str, default="127.0.0.1")
    p.add_argument("--serve_max_labels", type=int, default=4096)
    p.add_argument("--serve_milestone", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    import h5py
    import jax
    import jax.numpy as jnp

    from ccdm_tpu.data import load_dataset
    from ccdm_tpu.embedding.resolve import build_label_embedding
    from ccdm_tpu.main import get_eval_labels
    from ccdm_tpu.models import Unet
    from ccdm_tpu.models.sngan import SNGANDiscriminator, SNGANGenerator
    from ccdm_tpu.models.sagan import SAGANDiscriminator, SAGANGenerator
    from ccdm_tpu.opts import parse_channel_mult
    from ccdm_tpu.training.dmd import DMD2Trainer, DMDConfig
    from ccdm_tpu.utils.ckpt import checkpoint_exists, load_checkpoint
    from ccdm_tpu.utils.viz import save_image_grid

    args = parse_opts_dmd(argv)
    np.random.seed(args.seed)

    setting_folder = os.path.join(
        args.root_path, "output", f"{args.data_name}_{args.image_size}", args.setting_name
    )
    results_folder = os.path.join(setting_folder, "dmd_results")
    os.makedirs(results_folder, exist_ok=True)

    ds_kwargs = dict(image_size=args.image_size)
    if args.data_name == "synthetic":
        ds_kwargs.update(channels=args.num_channels)
    else:
        ds_kwargs.update(min_label=args.min_label, max_label=args.max_label)
    bundle = load_dataset(args.data_name, args.data_path, **ds_kwargs)

    # embeddings come from the TEACHER's setting folder so distillation
    # conditions through the exact space the teacher was trained in
    # (ref dmd.py:104-146; round-2 VERDICT missing #1)
    teacher_setting = args.teacher_setting_name or args.setting_name
    teacher_setting_folder = os.path.join(
        args.root_path, "output", f"{args.data_name}_{args.image_size}",
        teacher_setting,
    )
    fn_y2h, fn_y2cov = build_label_embedding(
        args, teacher_setting_folder, bundle=bundle)

    # teacher UNet + trainable copy
    mults = parse_channel_mult(args.channel_mult)
    unet = Unet(dim=args.model_channels, dim_mults=mults, in_channels=bundle.channels)
    key = jax.random.PRNGKey(args.seed)
    init_vars = unet.init(
        key,
        jnp.zeros((2, bundle.image_size, bundle.image_size, bundle.channels)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, args.dim_embed)), None, train=False,
    )

    teacher_results = os.path.join(teacher_setting_folder, "results")
    if args.teacher_milestone > 0 and checkpoint_exists(teacher_results, args.teacher_milestone):
        # EMA weights of the trained CCDM (Trainer.load(..., return_unet=True)
        # analog, trainer.py:534-535)
        ckpt = load_checkpoint(teacher_results, args.teacher_milestone)
        teacher_vars = {"params": ckpt["ema_params"]}
        if ckpt.get("ema_batch_stats"):
            teacher_vars["batch_stats"] = ckpt["ema_batch_stats"]
        print(f" loaded teacher from milestone {args.teacher_milestone}")
    else:
        teacher_vars = init_vars
        print(" WARNING: no teacher checkpoint found; using random init (smoke mode)")
    fake_vars = jax.tree_util.tree_map(lambda x: x.copy(), teacher_vars)

    # GAN nets
    if args.gan_arch == "sngan":
        netG = SNGANGenerator(dim_z=args.dim_z, dim_embed=args.dim_embed,
                              nc=bundle.channels, img_size=bundle.image_size,
                              gene_ch=args.gene_ch)
        netD = SNGANDiscriminator(dim_embed=args.dim_embed, nc=bundle.channels,
                                  img_size=bundle.image_size, disc_ch=args.disc_ch)
    else:
        netG = SAGANGenerator(dim_z=args.dim_z, dim_embed=args.dim_embed,
                              nc=bundle.channels, img_size=bundle.image_size,
                              gene_ch=args.gene_ch)
        netD = SAGANDiscriminator(dim_embed=args.dim_embed, nc=bundle.channels,
                                  img_size=bundle.image_size, disc_ch=args.disc_ch)
    z0 = jnp.zeros((2, args.dim_z))
    e0 = jnp.zeros((2, args.dim_embed))
    gv = netG.init(key, z0, e0, train=False)
    dv = netD.init(key, jnp.zeros((2, bundle.image_size, bundle.image_size, bundle.channels)), e0, train=False)

    cfg = DMDConfig(
        data_name=bundle.name,
        train_batch_size=args.train_batch_size,
        gradient_accumulate_every=args.gradient_accumulate_every,
        niters=args.niters,
        train_lr_generator=args.train_lr_generator,
        train_lr_guidance=args.train_lr_guidance,
        num_D_steps=args.num_D_steps,
        weight_generator_adv=args.weight_generator_adv,
        weight_guidance_adv=args.weight_guidance_adv,
        adv_loss_type=args.adv_loss_type,
        gan_DiffAugment=args.gan_DiffAugment,
        gan_DiffAugment_policy=args.gan_DiffAugment_policy,
        min_step_percent=args.min_step_percent,
        max_step_percent=args.max_step_percent,
        train_timesteps=args.train_timesteps,
        beta_schedule=args.beta_schedule,
        use_Hy=args.use_Hy,
        hy_max_log=args.hy_max_log,
        kappa=None if args.kappa < 0 else args.kappa,
        kernel_sigma=None if args.kernel_sigma < 0 else args.kernel_sigma,
        z_dim=args.dim_z,
        sample_every=args.sample_every,
        save_every=args.save_every,
        results_folder=results_folder,
        seed=args.seed,
    )
    trainer = DMD2Trainer(
        unet.apply, teacher_vars, unet.apply, fake_vars,
        netG, netD, gv, dv, bundle.images, bundle.labels_norm, fn_y2h, cfg,
        fn_y2cov=fn_y2cov,
    )
    if args.resume_niter > 0:
        trainer.load(args.resume_niter)
    trainer.train()
    trainer.save(args.niters)

    # one-step sampling per eval label
    eval_labels = get_eval_labels(bundle, args)
    dump_folder = os.path.join(results_folder, f"fake_data_onestep_niters{args.niters}")
    os.makedirs(dump_folder, exist_ok=True)
    all_fake_images, all_fake_labels = [], []
    for curr_label in eval_labels:
        fp = os.path.join(dump_folder, f"{curr_label}.h5")
        if os.path.isfile(fp):
            if args.comp_FID:
                with h5py.File(fp, "r") as f:
                    all_fake_images.append(f["fake_images_i"][:])
                    all_fake_labels.append(f["fake_labels_i"][:])
            continue
        fake_labels_i = curr_label * np.ones(args.nfake_per_label)
        imgs, _ = trainer.sample_given_labels(
            bundle.fn_normalize(fake_labels_i), batch_size=args.samp_batch_size,
        )
        with h5py.File(fp, "w") as f:
            f.create_dataset("fake_images_i", data=imgs, dtype="uint8",
                             compression="gzip", compression_opts=6)
            f.create_dataset("fake_labels_i", data=fake_labels_i, dtype="float")
        save_image_grid(imgs[:36].astype(np.float32) / 255.0,
                        os.path.join(dump_folder, f"sample_{curr_label}.png"), nrow=6)
        if args.comp_FID:
            all_fake_images.append(imgs)
            all_fake_labels.append(fake_labels_i)
    print("DMD sampling complete")

    if args.comp_FID:
        # score the ONE-STEP student with the same protocol + backbones as
        # the teacher (eval/protocol.py; the unified reference has no DMD
        # eval at all — the paper's DMD2-M numbers use the vanilla protocol)
        from ccdm_tpu.eval.protocol import run_ccgm_eval

        run_ccgm_eval(args, bundle,
                      np.concatenate(all_fake_images, axis=0),
                      np.concatenate(all_fake_labels),
                      setting_folder, total_time=0.0)

    if args.interpolation or args.sefa:
        from ccdm_tpu.eval import analysis

        fig_dir = os.path.join(results_folder, "analysis")
        os.makedirs(fig_dir, exist_ok=True)
        gvars = {"params": trainer.state["gen_params"]}
        if trainer.state["gen_stats"]:
            gvars["batch_stats"] = trainer.state["gen_stats"]

        def gen_fn(z, y):  # y = normalized scalar labels [B]
            x = netG.apply(gvars, z, fn_y2h(jnp.asarray(y).reshape(-1)), train=False)
            return (jnp.clip(x, -1.0, 1.0) + 1.0) * 0.5

        key = jax.random.PRNGKey(args.seed + 101)
        uniq = np.unique(bundle.labels_norm.reshape(len(bundle.labels_norm), -1)[:, 0])
        y_lo, y_hi = float(np.quantile(uniq, 0.1)), float(np.quantile(uniq, 0.9))
        z0, z1 = jax.random.normal(key, (2, args.dim_z))

        if args.interpolation:
            # fix_z: one latent, label sweep; fix_y: latent sweep at one label
            # (the reference's two -itp modes, worker.py:1164-1218)
            fix_z = analysis.linear_interpolation(
                gen_fn, z0, z0, jnp.array(y_lo), jnp.array(y_hi), steps=8)
            fix_y = analysis.linear_interpolation(
                gen_fn, z0, z1, jnp.array(y_lo), jnp.array(y_lo), steps=8)
            save_image_grid(np.concatenate([fix_z, fix_y], 0),
                            os.path.join(fig_dir, "interpolation.png"), nrow=8)
            print(f" interpolation grids -> {fig_dir}/interpolation.png")

        if args.sefa:
            gp = trainer.state["gen_params"]
            if args.gan_arch == "sngan":
                first_kernel = gp["dense"]["kernel"]
            else:  # sagan: spectral-norm-wrapped dense (snlinear0)
                sn = gp["snlinear0"]
                first_kernel = (sn["dense"]["kernel"] if "dense" in sn
                                else next(iter(sn.values()))["kernel"])
            canvas = analysis.semantic_factorization(
                gen_fn, jnp.asarray(first_kernel), z0,
                jnp.array(y_lo), num_axes=4, num_cols=8)
            a, ncol = canvas.shape[:2]
            save_image_grid(canvas.reshape(a * ncol, *canvas.shape[2:]),
                            os.path.join(fig_dir, "sefa.png"), nrow=ncol)
            print(f" SeFa canvas -> {fig_dir}/sefa.png")


if __name__ == "__main__":
    main()
    # see ccdm_tpu/main.py: avoid the axon PJRT teardown hang after all
    # work is complete
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
