"""CcGAN / Dual-NDA training + sampling entry point.

CLI reach for the B1/B2 baseline family (previously trainer-only): the
reference ships one `main.py` per dataset copy under
`CCDM_vanilla/*/CCGM/{CcGAN,Dual-NDA}/main.py` (flag surface) driving
`train_ccgan.py:53-686`; this entry reproduces that surface once, re-using
the shared pieces of the TPU framework — the dataset loaders, the
`build_label_embedding` resolver (reference CcGAN conditions through the
trained net_y2h, `train_ccgan.py:306`), the CcGAN/Dual-NDA trainer, and the
shared CCGM eval protocol (`eval/protocol.py`), which the per-dataset
reference copies inline in their `main.py:562-643` eval blocks.

Run:  python -m ccdm_tpu.ccgan_main --data_name Cell200 --gan_arch sngan \
          --niters 30000 --threshold_type hard --comp_FID ...
Dual-NDA: add --nda_a/.../--nda_e (+ optional --badfake_niqe_path /
          --badfake_mae_path h5 dumps for the Type-I negatives).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_opts_ccgan(argv=None):
    p = argparse.ArgumentParser()
    # data / paths (shared surface with main.py / dmd_main.py)
    p.add_argument("--root_path", type=str, default="./")
    p.add_argument("--data_name", type=str, default="synthetic",
                   choices=["UTKFace", "RC-49", "Cell200", "SteeringAngle", "synthetic"])
    p.add_argument("--data_path", type=str, default="./datasets")
    p.add_argument("--setting_name", type=str, default="Setup_CcGAN")
    p.add_argument("--seed", type=int, default=2021)
    p.add_argument("--min_label", type=float, default=0.0)
    p.add_argument("--max_label", type=float, default=90.0)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--num_channels", type=int, default=3)
    # label embedding (reference CcGAN conditions through the trained
    # net_y2h, train_ccgan.py:306; sinusoidal is the cheap smoke-mode choice)
    p.add_argument("--dim_embed", type=int, default=128)
    p.add_argument("--y2h_embed_type", type=str, default="resnet",
                   choices=["resnet", "sinusoidal", "gaussian"])
    p.add_argument("--y2cov_embed_type", type=str, default="sinusoidal")
    p.add_argument("--epoch_cnn_embed", type=int, default=200)
    p.add_argument("--epoch_net_y2h", type=int, default=500)
    p.add_argument("--batch_size_embed", type=int, default=256)
    p.add_argument("--dim_combination", type=str, default="mean")
    # GAN
    p.add_argument("--gan_arch", type=str, default="sngan", choices=["sngan", "sagan"])
    p.add_argument("--gene_ch", type=int, default=64)
    p.add_argument("--disc_ch", type=int, default=64)
    p.add_argument("--dim_gan", type=int, default=256, help="z dimension")
    # training (vanilla CcGAN opts: niters_gan/lr_g_gan/... semantics)
    p.add_argument("--niters", type=int, default=30000)
    p.add_argument("--resume_niter", type=int, default=0)
    p.add_argument("--batch_size_disc", type=int, default=64)
    p.add_argument("--batch_size_gene", type=int, default=64)
    p.add_argument("--num_D_steps", type=int, default=2)
    p.add_argument("--lr_g", type=float, default=1e-4)
    p.add_argument("--lr_d", type=float, default=1e-4)
    p.add_argument("--loss_type", type=str, default="hinge", choices=["hinge", "vanilla"])
    p.add_argument("--threshold_type", type=str, default="hard", choices=["hard", "soft"])
    p.add_argument("--kappa", type=float, default=-1.0)
    p.add_argument("--kernel_sigma", type=float, default=-1.0)
    p.add_argument("--nonzero_soft_weight_threshold", type=float, default=1e-3)
    p.add_argument("--gan_DiffAugment", action="store_true", default=False)
    p.add_argument("--gan_DiffAugment_policy", type=str, default="color,translation,cutout")
    # Dual-NDA (nda_a..e mixing weights; d/e need pre-generated bad fakes)
    p.add_argument("--nda_a", type=float, default=1.0)
    p.add_argument("--nda_b", type=float, default=0.0)
    p.add_argument("--nda_c", type=float, default=0.0)
    p.add_argument("--nda_d", type=float, default=0.0)
    p.add_argument("--nda_e", type=float, default=0.0)
    p.add_argument("--nda_start_iter", type=int, default=0)
    p.add_argument("--badfake_niqe_path", type=str, default="",
                   help="h5 with fake_images/fake_labels (NIQE-filtered Type-I negatives)")
    p.add_argument("--badfake_mae_path", type=str, default="",
                   help="h5 with fake_images/fake_labels (MAE-filtered Type-I negatives)")
    p.add_argument("--visualize_freq", type=int, default=2000)
    p.add_argument("--save_niters_freq", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=100)
    # sampling
    p.add_argument("--nfake_per_label", type=int, default=200)
    p.add_argument("--samp_batch_size", type=int, default=500)
    p.add_argument("--eval_mode", type=int, default=2)
    p.add_argument("--dump_fake_data", action="store_true", default=False)
    # evaluation (shared CCGM protocol, eval/protocol.py)
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
    return p.parse_args(argv)


def _check_nda_inputs(args):
    """Dual-NDA Type-I negatives (nda_d/nda_e) require pre-generated bad
    fakes; silently training a different objective than the flags request
    would be a trap (ref Dual-NDA train_ccgan.py requires the h5 dumps)."""
    if args.nda_d > 0 and not args.badfake_niqe_path:
        raise SystemExit("--nda_d > 0 requires --badfake_niqe_path (h5 of low-NIQE bad fakes)")
    if args.nda_e > 0 and not args.badfake_mae_path:
        raise SystemExit("--nda_e > 0 requires --badfake_mae_path (h5 of high-MAE bad fakes)")


def _load_badfake(path: str):
    if not path:
        return None
    import h5py

    with h5py.File(path, "r") as f:
        key_i = "fake_images" if "fake_images" in f else "fake_images_i"
        key_l = "fake_labels" if "fake_labels" in f else "fake_labels_i"
        imgs = f[key_i][:]
        labels = f[key_l][:]
    if imgs.ndim == 4 and imgs.shape[1] in (1, 3) and imgs.shape[1] != imgs.shape[-1]:
        imgs = np.transpose(imgs, (0, 2, 3, 1))  # NCHW dumps -> NHWC
    return imgs.astype(np.uint8), np.asarray(labels, np.float32)


def main(argv=None):
    import h5py
    import jax.numpy as jnp  # noqa: F401  (kept for parity with sibling mains)

    from ccdm_tpu.data import load_dataset
    from ccdm_tpu.embedding.resolve import build_label_embedding
    from ccdm_tpu.main import get_eval_labels
    from ccdm_tpu.models.sagan import SAGANDiscriminator, SAGANGenerator
    from ccdm_tpu.models.sngan import SNGANDiscriminator, SNGANGenerator
    from ccdm_tpu.training.ccgan import CcGANConfig, CcGANTrainer
    from ccdm_tpu.utils.viz import save_image_grid

    import jax

    args = parse_opts_ccgan(argv)
    _check_nda_inputs(args)
    np.random.seed(args.seed)

    setting_folder = os.path.join(
        args.root_path, "output", f"{args.data_name}_{args.image_size}", args.setting_name
    )
    results_folder = os.path.join(setting_folder, "ccgan_results")
    os.makedirs(results_folder, exist_ok=True)

    ds_kwargs = dict(image_size=args.image_size)
    if args.data_name == "synthetic":
        ds_kwargs.update(channels=args.num_channels)
    else:
        ds_kwargs.update(min_label=args.min_label, max_label=args.max_label)
    bundle = load_dataset(args.data_name, args.data_path, **ds_kwargs)

    fn_y2h, _ = build_label_embedding(args, setting_folder, bundle=bundle)

    if args.gan_arch == "sngan":
        netG = SNGANGenerator(dim_z=args.dim_gan, dim_embed=args.dim_embed,
                              nc=bundle.channels, img_size=bundle.image_size,
                              gene_ch=args.gene_ch)
        netD = SNGANDiscriminator(dim_embed=args.dim_embed, nc=bundle.channels,
                                  img_size=bundle.image_size, disc_ch=args.disc_ch)
    else:
        netG = SAGANGenerator(dim_z=args.dim_gan, dim_embed=args.dim_embed,
                              nc=bundle.channels, img_size=bundle.image_size,
                              gene_ch=args.gene_ch)
        netD = SAGANDiscriminator(dim_embed=args.dim_embed, nc=bundle.channels,
                                  img_size=bundle.image_size, disc_ch=args.disc_ch)
    key = jax.random.PRNGKey(args.seed)
    gv = netG.init(key, jnp.zeros((2, args.dim_gan)), jnp.zeros((2, args.dim_embed)),
                   train=False)
    dv = netD.init(key, jnp.zeros((2, bundle.image_size, bundle.image_size, bundle.channels)),
                   jnp.zeros((2, args.dim_embed)), train=False)

    cfg = CcGANConfig(
        data_name=bundle.name,
        niters=args.niters,
        batch_size_disc=args.batch_size_disc,
        batch_size_gene=args.batch_size_gene,
        num_D_steps=args.num_D_steps,
        lr_g=args.lr_g,
        lr_d=args.lr_d,
        dim_gan=args.dim_gan,
        threshold_type=args.threshold_type,
        # raw flags: compute_vicinal_hyperparams owns the reference convention
        # (negative kappa = rule-of-thumb multiplier |kappa|, e.g. -2.0)
        kappa=args.kappa,
        kernel_sigma=args.kernel_sigma,
        nonzero_soft_weight_threshold=args.nonzero_soft_weight_threshold,
        loss_type=args.loss_type,
        use_DiffAugment=args.gan_DiffAugment,
        policy=args.gan_DiffAugment_policy,
        nda_a=args.nda_a, nda_b=args.nda_b, nda_c=args.nda_c,
        nda_d=args.nda_d, nda_e=args.nda_e,
        nda_start_iter=args.nda_start_iter,
        save_niters_freq=args.save_niters_freq,
        visualize_freq=args.visualize_freq,
        results_folder=results_folder,
        log_every=args.log_every,
        seed=args.seed,
    )
    trainer = CcGANTrainer(
        netG, netD, gv, dv, bundle.images, bundle.labels_norm, fn_y2h, cfg,
        badfake_niqe=_load_badfake(args.badfake_niqe_path),
        badfake_mae=_load_badfake(args.badfake_mae_path),
    )
    if args.resume_niter > 0:
        trainer.load(args.resume_niter)
    trainer.train()
    trainer.save(args.niters)

    # per-label sampling + optional h5 dump (vanilla main.py:483-560 shape)
    eval_labels = get_eval_labels(bundle, args)
    dump_folder = os.path.join(results_folder, f"fake_data_niters{args.niters}")
    os.makedirs(dump_folder, exist_ok=True)
    all_fake_images, all_fake_labels = [], []
    for curr_label in eval_labels:
        fp = os.path.join(dump_folder, f"{curr_label}.h5")
        if os.path.isfile(fp):
            with h5py.File(fp, "r") as f:
                imgs = f["fake_images_i"][:]
                fake_labels_i = f["fake_labels_i"][:]
        else:
            fake_labels_i = curr_label * np.ones(args.nfake_per_label)
            imgs, _ = trainer.sample_given_labels(
                bundle.fn_normalize(fake_labels_i), batch_size=args.samp_batch_size,
            )
            if args.dump_fake_data:
                with h5py.File(fp, "w") as f:
                    f.create_dataset("fake_images_i", data=imgs, dtype="uint8",
                                     compression="gzip", compression_opts=6)
                    f.create_dataset("fake_labels_i", data=fake_labels_i, dtype="float")
            save_image_grid(imgs[:36].astype(np.float32) / 255.0,
                            os.path.join(dump_folder, f"sample_{curr_label}.png"), nrow=6)
        all_fake_images.append(imgs)
        all_fake_labels.append(fake_labels_i)
    print("CcGAN sampling complete")

    if args.comp_FID:
        from ccdm_tpu.eval.protocol import run_ccgm_eval

        run_ccgm_eval(args, bundle,
                      np.concatenate(all_fake_images, axis=0),
                      np.concatenate(all_fake_labels),
                      setting_folder, total_time=0.0)


if __name__ == "__main__":
    main()
    # see ccdm_tpu/main.py: avoid the axon PJRT teardown hang after all work
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
