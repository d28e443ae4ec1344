"""Class-conditional baseline CLI (VERDICT r3 'next' #8).

One entry surface for the three class-conditional baseline families the
reference ships per-dataset entry scripts for (SURVEY.md §2.3 B3-B5):

- ``--method studiogan``: the StudioGAN-loss GAN — projection cGAN with the
  ReACGAN D2D-CE or ADCGAN ADC auxiliary head on binned labels (ref
  `class-conditional/StudioGAN/main.py:198-201` + `worker.py`).
- ``--method admg``: ADM-G — train a class-conditional diffusion, train the
  t-aware noisy classifier, sample with classifier guidance (ref
  `class-conditional/ADM_G/classifier_train.py` + `classifier_sample.py`).
- ``--method cfg``: classifier-free guidance on the same class-conditional
  diffusion (ref `class-conditional/CFG/main.py`).

Continuous labels are binned into ``--num_classes`` equal-frequency classes
(`eval/train_backbones.bin_labels_to_classes`, the CCGM analog of the
reference's discrete class ids); fakes are dumped with each class's mean
raw label so the shared eval protocol (`--comp_FID`) can score them like
every other method in the repo.

Examples (fixture-scale):
  python -m ccdm_tpu.classgan_main --method studiogan --cond_loss d2dce ...
  python -m ccdm_tpu.classgan_main --method admg --classifier_scale 1.0 ...
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_opts_classgan(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="./")
    p.add_argument("--data_name", type=str, default="synthetic")
    p.add_argument("--data_path", type=str, default="./datasets")
    p.add_argument("--setting_name", type=str, default="Setup_ClassCond")
    p.add_argument("--seed", type=int, default=2021)
    p.add_argument("--method", type=str, default="studiogan",
                   choices=["studiogan", "admg", "cfg"])
    # dataset
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--num_channels", type=int, default=3)
    p.add_argument("--min_label", type=float, default=0.0)
    p.add_argument("--max_label", type=float, default=90.0)
    p.add_argument("--num_classes", type=int, default=10,
                   help="equal-frequency label bins (StudioGAN class ids)")
    # GAN (studiogan)
    p.add_argument("--cond_loss", type=str, default="d2dce",
                   choices=["d2dce", "adc", "none"])
    p.add_argument("--lambda_cond", type=float, default=1.0)
    p.add_argument("--gene_ch", type=int, default=64)
    p.add_argument("--disc_ch", type=int, default=64)
    p.add_argument("--dim_z", type=int, default=128)
    p.add_argument("--niters", type=int, default=10000)
    p.add_argument("--train_batch_size", type=int, default=64)
    p.add_argument("--num_D_steps", type=int, default=1)
    p.add_argument("--lr_g", type=float, default=1e-4)
    p.add_argument("--lr_d", type=float, default=1e-4)
    p.add_argument("--gan_DiffAugment", action="store_true", default=False)
    p.add_argument("--visualize_freq", type=int, default=2000)
    p.add_argument("--save_niters_freq", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=20)
    # diffusion (admg / cfg)
    p.add_argument("--model_channels", type=int, default=32)
    p.add_argument("--channel_mult", type=str, default="1_2_2_4")
    p.add_argument("--train_timesteps", type=int, default=1000)
    p.add_argument("--train_lr", type=float, default=1e-4)
    p.add_argument("--cond_drop_prob", type=float, default=0.1)
    p.add_argument("--pred_objective", type=str, default="pred_x0")
    p.add_argument("--classifier_epochs", type=int, default=20)
    p.add_argument("--classifier_scale", type=float, default=1.0,
                   help="ADM-G guidance scale s (classifier_sample.py)")
    p.add_argument("--sample_timesteps", type=int, default=250)
    p.add_argument("--sample_cond_scale", type=float, default=1.5,
                   help="CFG guidance scale (cfg method)")
    # sampling + eval
    p.add_argument("--nfake_per_class", type=int, default=50)
    p.add_argument("--samp_batch_size", type=int, default=50)
    p.add_argument("--dump_fake_data", action="store_true", default=False)
    p.add_argument("--comp_FID", action="store_true", default=False)
    p.add_argument("--eval_mode", type=int, default=2)
    p.add_argument("--epochs_eval_ae", type=int, default=10)
    p.add_argument("--epochs_eval_cnn", type=int, default=20)
    p.add_argument("--eval_ckpt_path", type=str, default="./")
    return p.parse_args(argv)


def _class_centers(labels_raw: np.ndarray, classes: np.ndarray,
                   num_classes: int) -> np.ndarray:
    """Mean raw label per class — the raw-label stand-in the fakes carry
    into the shared eval protocol."""
    return np.array([labels_raw[classes == c].mean() if np.any(classes == c)
                     else labels_raw.mean() for c in range(num_classes)],
                    np.float32)


def _dump_and_maybe_eval(args, bundle, fakes, flabels, setting_folder,
                         results_folder, total_time=0.0):
    import h5py

    from ccdm_tpu.utils.viz import save_image_grid

    if args.dump_fake_data:
        fp = os.path.join(
            results_folder,
            f"fake_data_{args.method}_niters{args.niters}_nfake{len(fakes)}.h5")
        with h5py.File(fp, "w") as f:
            f.create_dataset("fake_images", data=fakes, dtype="uint8",
                             compression="gzip", compression_opts=6)
            f.create_dataset("fake_labels", data=flabels)
        print(f" dumped {fp}")
    save_image_grid(fakes[:36].astype(np.float32) / 255.0,
                    os.path.join(results_folder, f"sample_{args.method}.png"),
                    nrow=6)
    if args.comp_FID:
        from ccdm_tpu.eval.protocol import run_ccgm_eval

        run_ccgm_eval(args, bundle, fakes, flabels.astype(np.float32),
                      setting_folder, total_time=total_time)


def _train_class_diffusion(args, bundle, classes, results_folder, mesh):
    """Class-conditional diffusion: the label-embedding fn maps a normalized
    label to its class-table row, so the stock Trainer trains a
    class-conditional model with vicinity off (ADM/CFG semantics)."""
    import jax
    import jax.numpy as jnp

    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.diffusion.guided import make_fn_class_embed
    from ccdm_tpu.models import Unet
    from ccdm_tpu.opts import parse_channel_mult
    from ccdm_tpu.training import Trainer, TrainerConfig

    C = args.num_classes
    # class boundaries in normalized-label space, consistent with the
    # bin_labels_to_classes equal-frequency chunking on raw labels
    uniq_raw = np.sort(np.unique(bundle.labels_raw))
    chunks = np.array_split(uniq_raw, C)
    uppers_raw = np.array([c[-1] for c in chunks[:-1] if len(c)], np.float32)
    uppers_norm = np.asarray(bundle.fn_normalize(uppers_raw), np.float32).reshape(-1)
    table_fn = make_fn_class_embed(C, dim=128, seed=args.seed)
    uppers_dev = jnp.asarray(uppers_norm)

    def fn_y2h(y):
        y1 = jnp.asarray(y, jnp.float32).reshape(-1)
        cls = jnp.searchsorted(uppers_dev, y1, side="left")
        return table_fn(cls)

    model = Unet(dim=args.model_channels,
                 dim_mults=parse_channel_mult(args.channel_mult),
                 in_channels=bundle.channels)
    key = jax.random.PRNGKey(args.seed)
    img = bundle.image_size
    variables = model.init(key, jnp.zeros((2, img, img, bundle.channels)),
                           jnp.zeros((2,), jnp.int32), jnp.zeros((2, 128)),
                           None, train=False)
    dcfg = DiffusionConfig(image_size=img, channels=bundle.channels,
                           timesteps=args.train_timesteps,
                           sampling_timesteps=args.sample_timesteps,
                           objective=args.pred_objective,
                           cond_drop_prob=args.cond_drop_prob,
                           vicinity_type="none")
    diffusion = GaussianDiffusion(model.apply, dcfg)
    tcfg = TrainerConfig(
        data_name=bundle.name,
        train_batch_size=args.train_batch_size,
        train_lr=args.train_lr,
        train_num_steps=args.niters,
        results_folder=results_folder,
        vicinity_type="none",
        sample_every=10**9, save_every=max(args.niters, 1),
        log_every=args.log_every, seed=args.seed,
    )
    trainer = Trainer(diffusion, variables, bundle.images, bundle.labels_norm,
                      tcfg, mesh=mesh)
    trainer.train(fn_y2h)
    return trainer, diffusion, fn_y2h


def main(argv=None):
    import jax

    from ccdm_tpu.data import load_dataset
    from ccdm_tpu.eval.train_backbones import bin_labels_to_classes
    from ccdm_tpu.parallel import create_mesh

    args = parse_opts_classgan(argv)
    np.random.seed(args.seed)
    setting_folder = os.path.join(
        args.root_path, "output", f"{args.data_name}_{args.image_size}",
        args.setting_name)
    results_folder = os.path.join(setting_folder, f"{args.method}_results")
    os.makedirs(results_folder, exist_ok=True)

    ds_kwargs = dict(image_size=args.image_size)
    if args.data_name == "synthetic":
        ds_kwargs.update(channels=args.num_channels)
    else:
        ds_kwargs.update(min_label=args.min_label, max_label=args.max_label)
    bundle = load_dataset(args.data_name, args.data_path, **ds_kwargs)
    classes = bin_labels_to_classes(bundle.labels_raw, args.num_classes)
    centers = _class_centers(np.asarray(bundle.labels_raw, np.float32),
                             classes, args.num_classes)
    mesh = create_mesh()
    fake_classes = np.repeat(np.arange(args.num_classes), args.nfake_per_class)
    flabels = centers[fake_classes]

    import timeit

    t0 = timeit.default_timer()
    if args.method == "studiogan":
        from ccdm_tpu.models.sngan import SNGANDiscriminator, SNGANGenerator
        from ccdm_tpu.training.classgan import ClassGANConfig, ClassGANTrainer

        netG = SNGANGenerator(dim_embed=args.num_classes, dim_z=args.dim_z,
                              nc=bundle.channels, img_size=args.image_size,
                              gene_ch=args.gene_ch)
        netD = SNGANDiscriminator(dim_embed=args.num_classes,
                                  nc=bundle.channels, img_size=args.image_size,
                                  disc_ch=args.disc_ch)
        import jax.numpy as jnp

        k = jax.random.PRNGKey(args.seed)
        gv = netG.init(k, jnp.zeros((2, args.dim_z)),
                       jnp.zeros((2, args.num_classes)), train=False)
        dv = netD.init(k, jnp.zeros((2, args.image_size, args.image_size,
                                     bundle.channels)),
                       jnp.zeros((2, args.num_classes)), train=False)
        cfg = ClassGANConfig(
            num_classes=args.num_classes, niters=args.niters,
            batch_size=args.train_batch_size, num_D_steps=args.num_D_steps,
            lr_g=args.lr_g, lr_d=args.lr_d, dim_z=args.dim_z,
            cond_loss=args.cond_loss, lambda_cond=args.lambda_cond,
            use_DiffAugment=args.gan_DiffAugment,
            save_niters_freq=args.save_niters_freq,
            visualize_freq=args.visualize_freq,
            results_folder=results_folder, log_every=args.log_every,
            seed=args.seed)
        trainer = ClassGANTrainer(netG, netD, gv, dv, bundle.images, classes,
                                  cfg, mesh=mesh)
        trainer.train()
        fakes = trainer.sample_given_classes(fake_classes,
                                             batch_size=args.samp_batch_size)
    else:
        trainer, diffusion, fn_y2h = _train_class_diffusion(
            args, bundle, classes, results_folder, mesh)
        if args.method == "cfg":
            fakes, _ = trainer.sample_given_labels(
                given_labels=np.asarray(bundle.fn_normalize(flabels), np.float32),
                fn_y2h=fn_y2h, batch_size=args.samp_batch_size,
                denorm=True, to_numpy=True, sampler="ddim",
                cond_scale=args.sample_cond_scale,
                sample_timesteps=args.sample_timesteps)
        else:  # admg
            import jax.numpy as jnp

            from ccdm_tpu.diffusion.guided import (
                classifier_grad_fn, classifier_guided_sample,
            )
            from ccdm_tpu.eval.backbones import NoisyClassifier
            from ccdm_tpu.eval.train_backbones import train_noisy_classifier
            from ccdm_tpu.training.state import ema_variables
            from ccdm_tpu.utils.ckpt import (
                checkpoint_exists, load_checkpoint, save_checkpoint,
            )

            cls_tag = (f"noisycls_{bundle.name}_{args.image_size}"
                       f"_c{args.num_classes}_e{args.classifier_epochs}"
                       f"_seed{args.seed}")
            if checkpoint_exists(results_folder, cls_tag):
                cls_vars = load_checkpoint(results_folder, cls_tag)
                print(f" noisy classifier: loaded cached '{cls_tag}'")
            else:
                cls_vars = train_noisy_classifier(
                    bundle.images, classes, args.num_classes,
                    timesteps=args.train_timesteps,
                    epochs=args.classifier_epochs, seed=args.seed)
                save_checkpoint(results_folder, cls_tag,
                                jax.device_get(cls_vars))
            cls_net = NoisyClassifier(args.num_classes)
            cond_fn = classifier_grad_fn(
                lambda v, x, t, train: cls_net.apply(v, x, t, train=train),
                cls_vars, takes_t=True)
            variables = ema_variables(trainer.state)
            guided = jax.jit(lambda v, k, e, c: classifier_guided_sample(
                diffusion, v, k, e, c, cond_fn,
                guidance_scale=args.classifier_scale,
                sampling_timesteps=min(args.sample_timesteps,
                                       args.train_timesteps)))
            outs = []
            bs = args.samp_batch_size
            flabels_norm = np.asarray(bundle.fn_normalize(flabels), np.float32)
            for s in range(0, len(fake_classes), bs):
                cls_b = jnp.asarray(fake_classes[s:s + bs], jnp.int32)
                emb_b = fn_y2h(flabels_norm[s:s + bs])
                k = jax.random.fold_in(jax.random.PRNGKey(args.seed + 77), s)
                img01 = guided(variables, k, emb_b, cls_b)
                outs.append(np.asarray(jnp.clip(img01, 0, 1) * 255.0))
            fakes = np.concatenate(outs).astype(np.uint8)

    total_time = timeit.default_timer() - t0
    print(f" {args.method}: sampled {fakes.shape} in {total_time:.1f}s (incl. train)")
    _dump_and_maybe_eval(args, bundle, fakes, flabels, setting_folder,
                         results_folder, total_time=total_time)
    print(f"{args.method} run complete")


if __name__ == "__main__":
    main()
    # hard-exit: PJRT teardown can hang when the process is not __main__
    os._exit(0)
