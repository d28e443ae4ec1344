"""CLI flag surface — names preserved from the reference.

Union of the unified tree's flags (`CCDM_unified/opts.py:4-212`) and the
vanilla tree's eval surface (`CCDM_vanilla/.../opts.py:3-102`), with
`--threshold_type {hard,soft}` accepted as an alias for `--vicinity_type
{hv,sv}` to resolve the fork's script/CLI mismatch (SURVEY.md §2.1 defects).
"""

from __future__ import annotations

import argparse

# Flags parsed for reference-CLI compatibility but deliberately inert here,
# each with the reason. Every other flag must be consumed somewhere in the
# package — tests/test_opts.py walks the parser and enforces exactly this
# (no silently-dead flags).
INERT_FLAGS = {
    "num_workers": "torch DataLoader worker count (ref opts.py); the data "
                   "pipeline is device-resident with no host loader "
                   "processes, so there is nothing to parallelize",
}


def parse_opts(argv=None):
    parser = argparse.ArgumentParser()

    # Overall
    parser.add_argument("--root_path", type=str, default="./")
    parser.add_argument("--data_name", type=str, default="synthetic",
                        choices=["UTKFace", "RC-49", "Cell200", "SteeringAngle",
                                 "synthetic", "power_vector", "synthetic_power"])
    parser.add_argument("--data_path", type=str, default="./datasets")
    # power_vector (Sliced-CCDM, ref opts.py --design_folder/--power_data_path;
    # dataset.py:93-235): tiff design images + CSV power vectors, multi-dim
    # labels. synthetic_power is the fixture stand-in (data/power.py).
    parser.add_argument("--design_folder", type=str, default="None",
                        help="power_vector: tiff design-image folder "
                             "(default <data_path>/designs)")
    parser.add_argument("--power_data_path", type=str, default="None",
                        help="power_vector: power-vector CSV "
                             "(default <data_path>/power.csv)")
    parser.add_argument("--use_power_transformer", action="store_true", default=False,
                        help="normalize power labels with the quantile "
                             "PowerTransformer (ref dataset.py:13-90; the "
                             "reference constructs-but-disables it, "
                             "main.py:95-104)")
    parser.add_argument("--eval_ckpt_path", type=str, default="./")
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--num_workers", type=int, default=0,
                        help="accepted for reference-script compatibility; "
                             "inert (see INERT_FLAGS)")
    parser.add_argument("--setting_name", type=str, default="Setup1")

    # Sliced-CCDM extensions
    parser.add_argument("--architecture", type=str, default="unet",
                        choices=["unet", "vit", "adm"],
                        help="unet/vit = unified tree; adm = vanilla tree's GroupNorm UNet")
    parser.add_argument("--label_embed", type=str, default="ccdm2", choices=["ccdm1", "ccdm2", "random"],
                        help="embedding pipeline family (ref main.py:303-338): ccdm1=y2h only, "
                             "ccdm2=y2h+y2cov (enables --use_Hy), random=Gaussian-Fourier y2h")
    parser.add_argument("--vicinity_type", type=str, default=None,
                        choices=["shv", "ssv", "hv", "sv", "none"])
    parser.add_argument("--threshold_type", type=str, default=None, choices=["hard", "soft"],
                        help="vanilla-tree alias: hard->hv, soft->sv")
    parser.add_argument("--distance", type=str, default="l2", choices=["l1", "l2", "cosine"])
    parser.add_argument("--vector_type", type=str, default="gaussian",
                        choices=["gaussian", "rademacher", "sphere"])
    parser.add_argument("--hyperparameter", type=str, default="rule_of_thumb",
                        choices=["rule_of_thumb", "percentile"])
    parser.add_argument("--adaptive_slicing", action="store_true", default=False)
    parser.add_argument("--label_dim", type=int, default=1)
    parser.add_argument("--synthetic_n", type=int, default=0,
                        help="sample count for the synthetic/synthetic_power "
                             "generators; 0 keeps each generator's default "
                             "(test/CI sizing; no reference analogue)")
    parser.add_argument("--percentile", type=float, default=5.0)
    parser.add_argument("--num_projections", type=int, default=1)
    parser.add_argument("--dim_combination", type=str, default="mean",
                        choices=["mean", "weighted", "attention", "cross", "cross_attention"])

    # Dataset
    parser.add_argument("--min_label", type=float, default=0.0)
    parser.add_argument("--max_label", type=float, default=90.0)
    parser.add_argument("--num_channels", type=int, default=3)
    parser.add_argument("--image_size", type=int, default=64)
    parser.add_argument("--max_num_img_per_label", type=int, default=int(1e30))
    parser.add_argument("--num_img_per_label_after_replica", type=int, default=0)
    parser.add_argument("--data_split", type=str, default="train", choices=["train", "all"])
    parser.add_argument("--stepsize", type=int, default=2, help="Cell-200 label stride")
    parser.add_argument("--num_imgs_per_label", type=int, default=10, help="Cell-200 per-label subset")

    # Model config
    parser.add_argument("--model_channels", type=int, default=64)
    parser.add_argument("--num_res_blocks", type=int, default=2)
    parser.add_argument("--num_heads", type=int, default=4)
    parser.add_argument("--num_groups", type=int, default=8)
    parser.add_argument("--attention_resolutions", type=str, default="16_32")
    parser.add_argument("--channel_mult", type=str, default="1_2_4_8")
    parser.add_argument("--attn_dim_head", type=int, default=32)
    parser.add_argument("--cond_drop_prob", type=float, default=0.1)

    # Training
    parser.add_argument("--pred_objective", type=str, default="pred_noise",
                        choices=["pred_noise", "pred_x0", "pred_v"])
    parser.add_argument("--niters", type=int, default=10)
    parser.add_argument("--resume_niter", type=int, default=0)
    parser.add_argument("--train_timesteps", type=int, default=1000)
    parser.add_argument("--train_batch_size", type=int, default=16)
    parser.add_argument("--train_lr", type=float, default=1e-4)
    parser.add_argument("--train_amp", action="store_true", default=False,
                        help="bf16 activations on TPU (no loss scaling needed)")
    parser.add_argument("--gradient_accumulate_every", type=int, default=1)
    parser.add_argument("--beta_schedule", type=str, default="cosine", choices=["cosine", "linear"])
    parser.add_argument("--sample_every", type=int, default=1000)
    parser.add_argument("--save_every", type=int, default=10000)
    parser.add_argument("--log_every", type=int, default=500,
                        help="loss/throughput logging stride (reference logs every 500)")
    parser.add_argument("--tb_log", action="store_true", default=False,
                        help="also write TensorBoard event files (ADM-G "
                             "logger.py TB backend parity)")

    # Label embedding
    parser.add_argument("--y2h_embed_type", type=str, default="sinusoidal",
                        choices=["resnet", "sinusoidal", "gaussian"])
    parser.add_argument("--y2cov_embed_type", type=str, default="sinusoidal",
                        choices=["resnet", "sinusoidal", "gaussian"])
    parser.add_argument("--use_Hy", action="store_true", default=False)
    parser.add_argument("--hy_max_log", type=float, default=4.0,
                        help="cap on the y2cov log-scale h in Hy=exp(-h); "
                             "<=0 disables (exact reference semantics)")
    parser.add_argument("--net_embed", type=str, default="ResNet34_embed")
    parser.add_argument("--epoch_cnn_embed", type=int, default=200)
    parser.add_argument("--resumeepoch_cnn_embed", type=int, default=0)
    parser.add_argument("--epoch_net_y2h", type=int, default=500)
    parser.add_argument("--dim_embed", type=int, default=128)
    parser.add_argument("--batch_size_embed", type=int, default=256)
    parser.add_argument("--net_embed_y2cov", type=str, default="ResNet34_embed_y2cov")
    parser.add_argument("--epoch_cnn_embed_y2cov", type=int, default=10)
    parser.add_argument("--resumeepoch_cnn_embed_y2cov", type=int, default=0)
    parser.add_argument("--epoch_net_y2cov", type=int, default=500)
    parser.add_argument("--batch_size_embed_y2cov", type=int, default=256)

    # Auxiliary elastic loss (vanilla opts.py:36-42 + train_aux_net.py)
    parser.add_argument("--lambda_aux", type=float, default=0.0,
                        help=">0 enables the elastic aux label loss "
                             "(pred_noise only; vanilla diffusion.py:444-471)")
    parser.add_argument("--net_aux", type=str, default="ResNet34",
                        choices=["VGG11", "VGG13", "VGG16", "VGG19",
                                 "ResNet18", "ResNet34"])
    parser.add_argument("--epoch_aux", type=int, default=200)
    parser.add_argument("--batch_size_aux", type=int, default=256)
    parser.add_argument("--aux_start_step", type=int, default=0)

    # Vicinal loss
    parser.add_argument("--kernel_sigma", type=float, default=-1.0)
    parser.add_argument("--kappa", type=float, default=-1.0)
    parser.add_argument("--nonzero_soft_weight_threshold", type=float, default=1e-3)

    # Sampling
    parser.add_argument("--sampler", type=str, default="ddim", choices=["ddim", "ddpm"])
    parser.add_argument("--sample_timesteps", type=int, default=250)
    parser.add_argument("--sample_cond_scale", type=float, default=1.5)
    parser.add_argument("--ddim_eta", type=float, default=0.0)
    parser.add_argument("--nfake_per_label", type=int, default=200)
    parser.add_argument("--samp_batch_size", type=int, default=100)
    parser.add_argument("--samp_precast_bf16", action="store_true", default=False,
                        help="sampling-only perf mode: cast f32 kernel "
                             "leaves to bf16 once, outside the DDIM scan — "
                             "halves weight HBM traffic per step at the "
                             "cost of bf16 weight rounding in the fused "
                             "blocks (training/state.precast_sampling_params)")
    parser.add_argument("--dump_fake_data", action="store_true", default=False,
                        help="persist per-label fake h5 dumps (ref "
                             "main.py:541; sampling runs either way)")
    parser.add_argument("--gif_trajectory", action="store_true", default=False,
                        help="save an animated GIF of the DDIM denoising "
                             "trajectory for the visual label grid "
                             "(vanilla trainer.py:421-458)")
    parser.add_argument("--interpolation", action="store_true", default=False,
                        help="latent-blending interpolation grid between two "
                             "eval images (vanilla diffusion.py:369-383 / "
                             "StudioGAN -itp)")

    # Evaluation surface (vanilla opts.py:74-102)
    parser.add_argument("--comp_FID", action="store_true", default=False)
    parser.add_argument("--eval_mode", type=int, default=2, choices=[1, 2, 3, 4])
    parser.add_argument("--FID_radius", type=float, default=0)
    parser.add_argument("--FID_num_centers", type=int, default=-1)
    parser.add_argument("--dump_fake_for_NIQE", action="store_true", default=False)
    parser.add_argument("--niqe_dump_path", type=str, default="None")
    parser.add_argument("--comp_niqe", action="store_true", default=False,
                        help="native in-process NIQE (eval/niqe.py) calibrated "
                             "on the dataset's real images — replaces the "
                             "reference's external MATLAB step "
                             "(vanilla main.py:498-513)")
    parser.add_argument("--niqe_patch", type=int, default=0,
                        help="NIQE patch size; 0 = auto (96 at >=192px, "
                             "else image_size/2)")
    parser.add_argument("--comp_IS_and_FID_only", action="store_true", default=False)
    parser.add_argument("--comp_prdc", action="store_true", default=False,
                        help="precision/recall/density/coverage over the FID feature net "
                             "(StudioGAN metrics/prdc.py parity)")
    parser.add_argument("--prdc_nearest_k", type=int, default=5)
    parser.add_argument("--comp_intra_fid", action="store_true", default=False,
                        help="per-label-value FID (StudioGAN worker.py iFID parity)")
    parser.add_argument("--knn_analysis", action="store_true", default=False,
                        help="k-nearest-real grids for fake anchors "
                             "(StudioGAN main.py -knn / worker.py:1068)")
    parser.add_argument("--frequency_analysis", action="store_true", default=False,
                        help="mean FFT log-spectrum, real vs fake "
                             "(StudioGAN main.py -fa / worker.py:1219)")
    parser.add_argument("--tsne_analysis", action="store_true", default=False,
                        help="2-D t-SNE of eval-net embeddings, real vs fake "
                             "(StudioGAN main.py -tsne / worker.py:1297)")
    parser.add_argument("--GAN_train", action="store_true", default=False,
                        help="CAS recall leg: train classifier on FAKE, test on "
                             "REAL (StudioGAN worker.py:1529)")
    parser.add_argument("--GAN_test", action="store_true", default=False,
                        help="CAS precision leg: train classifier on REAL, test "
                             "on FAKE (StudioGAN worker.py:1529)")

    # Serving surface (ccdm_tpu/serve.py; no reference analog)
    parser.add_argument("--serve_port", type=int, default=8600)
    parser.add_argument("--serve_host", type=str, default="127.0.0.1",
                        help="bind address; 0.0.0.0 exposes the chip to the "
                             "network and is an explicit opt-in")
    parser.add_argument("--serve_max_labels", type=int, default=1024,
                        help="per-request label-count cap (each /generate "
                             "holds the accelerator lock)")
    parser.add_argument("--serve_milestone", type=int, default=0,
                        help="milestone to load for serving (0 = fresh weights; "
                             "only useful for smoke tests)")
    parser.add_argument("--epochs_eval_ae", type=int, default=10,
                        help="epochs for training the SFID autoencoder backbone")
    parser.add_argument("--epochs_eval_cnn", type=int, default=20,
                        help="epochs for training the LS/Diversity ResNet backbones")

    args = parser.parse_args(argv)

    # resolve the threshold_type alias (scripts target upstream flags)
    if args.vicinity_type is None:
        if args.threshold_type == "hard":
            args.vicinity_type = "hv"
        elif args.threshold_type == "soft":
            args.vicinity_type = "sv"
        else:
            args.vicinity_type = "shv"
    return args


def parse_channel_mult(s: str) -> tuple:
    """'1_2_4_8' -> (1,2,4,8)."""
    return tuple(int(x) for x in s.split("_"))
