"""Generate per-dataset launch scripts mirroring the reference's
CCDM_unified/scripts/** hyperparameter sets (SURVEY.md §6 table)."""
import os, stat

CONFIGS = {
    # name: (data_name, img, min, max, objective, type, kappa, mult, ch, batch, acc, lr, niters, T', scale, extra)
    "RC64":  ("RC-49", 64, 0, 90.0, "pred_x0", "hard", -2.0, "1_2_2_4_8", 64, 128, 1, "1e-4", 50000, 250, 1.5, "--use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet"),
    "UK64":  ("UTKFace", 64, 1, 60, "pred_x0", "hard", -1.0, "1_2_4_4_8", 72, 128, 1, "1e-4", 100000, 250, 1.5, "--use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet --max_num_img_per_label 1000000 --num_img_per_label_after_replica 200"),
    "UK128": ("UTKFace", 128, 1, 60, "pred_x0", "hard", -1.0, "1_2_4_4_8_8", 64, 32, 2, "1e-5", 200000, 150, 2.0, "--use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet"),
    "UK192": ("UTKFace", 192, 1, 60, "pred_x0", "hard", -1.0, "1_2_2_4_4_8_8", 64, 16, 4, "1e-5", 300000, 100, 2.0, "--use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet"),
    "SA64":  ("SteeringAngle", 64, -80.0, 80.0, "pred_x0", "hard", -5.0, "1_2_2_4_8", 64, 128, 1, "1e-4", 50000, 250, 1.5, "--use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet"),
    "SA128": ("SteeringAngle", 128, -80.0, 80.0, "pred_x0", "hard", -5.0, "1_2_2_4_4_8", 64, 32, 2, "5e-5", 200000, 150, 1.5, "--use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet"),
    "Cell":  ("Cell200", 64, 1, 200, "pred_x0", "hard", -2.0, "1_2_2_4", 32, 128, 1, "5e-5", 50000, 250, 1.5, "--use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet --num_channels 1"),
}

TEMPLATE = """#!/bin/bash
# {tag} {method} launch — hyperparameters mirror the reference
# CCDM_unified/scripts/{tag}/linux/run_{method}.sh (SURVEY.md §6).
ROOT_PATH=${{ROOT_PATH:-./}}
DATA_PATH=${{DATA_PATH:-./datasets}}

python -m ccdm_tpu.main \\
    --setting_name Setup_{METHOD} \\
    --root_path $ROOT_PATH --data_name {data} --data_path $DATA_PATH \\
    --image_size {img} --train_amp \\
    --min_label {minl} --max_label {maxl} \\
    --pred_objective {obj} \\
    --model_channels {ch} --cond_drop_prob 0.1 --channel_mult {mult} \\
    {extra} \\
    --niters {niters} --resume_niter 0 --train_lr {lr} --train_timesteps 1000 \\
    --train_batch_size {batch} --gradient_accumulate_every {acc} \\
    --kernel_sigma -1.0 --threshold_type {vtype} --kappa {kappa} \\
    --sample_every 10000 --save_every 10000 \\
    --sample_timesteps {tprime} --sample_cond_scale {scale} \\
    --sampler ddim --samp_batch_size 200 --nfake_per_label 200 \\
    --dump_fake_data \\
    "$@" 2>&1 | tee output_{data}_{img}_{METHOD}.txt
"""

for tag, (data, img, minl, maxl, obj, vtype, kappa, mult, ch, batch, acc, lr, niters, tp, scale, extra) in CONFIGS.items():
    # CCDM variant (pred_x0, hard vicinity, Hy)
    path = f"/root/repo/scripts/{tag}/run_ccdm.sh"
    with open(path, "w") as f:
        f.write(TEMPLATE.format(tag=tag, method="ccdm", METHOD="CCDM", data=data, img=img,
                                minl=minl, maxl=maxl, obj=obj, ch=ch, mult=mult, extra=extra,
                                niters=niters, lr=lr, batch=batch, acc=acc, vtype=vtype,
                                kappa=kappa, tprime=tp, scale=scale))
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    # CcDPM variant (pred_noise, soft vicinity, no Hy; scripts/*/run_ccdpm.sh)
    extra_dpm = extra.replace("--use_Hy ", "").replace("--y2cov_embed_type resnet", "")
    path = f"/root/repo/scripts/{tag}/run_ccdpm.sh"
    with open(path, "w") as f:
        f.write(TEMPLATE.format(tag=tag, method="ccdpm", METHOD="CcDPM", data=data, img=img,
                                minl=minl, maxl=maxl, obj="pred_noise", ch=ch, mult=mult,
                                extra=extra_dpm, niters=niters, lr=lr, batch=batch, acc=acc,
                                vtype="soft", kappa=kappa, tprime=tp, scale=scale))
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)

DMD_TEMPLATE = """#!/bin/bash
# {tag} DMD2-M launch — mirrors scripts/{tag}/linux/run_dmd.sh semantics.
ROOT_PATH=${{ROOT_PATH:-./}}
DATA_PATH=${{DATA_PATH:-./datasets}}

python -m ccdm_tpu.dmd_main \\
    --setting_name Setup_CCDM \\
    --root_path $ROOT_PATH --data_name {data} --data_path $DATA_PATH \\
    --image_size {img} --min_label {minl} --max_label {maxl} \\
    --model_channels {ch} --channel_mult {mult} \\
    --use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet \\
    --teacher_milestone {teacher} \\
    --gan_arch sngan --gene_ch {gene_ch} --disc_ch 64 --dim_z 256 \\
    --niters {niters} --train_batch_size 128 \\
    --train_lr_generator 1e-4 --train_lr_guidance 1e-4 \\
    --num_D_steps 2 --weight_guidance_adv {wD} --weight_generator_adv {wG} \\
    --adv_loss_type hinge --gan_DiffAugment \\
    --kappa {kappa} --kernel_sigma -1.0 \\
    --sample_every 1000 --save_every 5000 \\
    --nfake_per_label 200 --samp_batch_size 200 \\
    "$@" 2>&1 | tee output_dmd_{data}_{img}.txt
"""

for tag, data, img, minl, maxl, ch, mult, teacher, gene_ch, wD, wG, kappa, niters in [
    ("RC64", "RC-49", 64, 0, 90.0, 64, "1_2_2_4_8", 50000, 84, 10, 1, 0.0, 50000),
    ("SA64", "SteeringAngle", 64, -80.0, 80.0, 64, "1_2_2_4_8", 50000, 64, 2, 0.2, -1.0, 200000),
    ("UK64", "UTKFace", 64, 1, 60, 72, "1_2_4_4_8", 100000, 64, 10, 1, -1.0, 50000),
]:
    path = f"/root/repo/scripts/{tag}/run_dmd.sh"
    with open(path, "w") as f:
        f.write(DMD_TEMPLATE.format(tag=tag, data=data, img=img, minl=minl, maxl=maxl,
                                    ch=ch, mult=mult, teacher=teacher, gene_ch=gene_ch,
                                    wD=wD, wG=wG, kappa=kappa, niters=niters))
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)

CCGAN_TEMPLATE = """#!/bin/bash
# {tag} CcGAN baseline launch — hyperparameters mirror the reference
# CCDM_vanilla/{refdir}/CCGM/CcGAN/scripts/run_train.sh.{note}
ROOT_PATH=${{ROOT_PATH:-./}}
DATA_PATH=${{DATA_PATH:-./datasets}}

python -m ccdm_tpu.ccgan_main \\
    --setting_name Setup_CcGAN \\
    --root_path $ROOT_PATH --data_name {data} --data_path $DATA_PATH \\
    --image_size {img} --min_label {minl} --max_label {maxl} {extra} \\
    --gan_arch {arch} --gene_ch {gene_ch} --disc_ch {disc_ch} --dim_gan 256 \\
    --niters {niters} --loss_type {loss} --num_D_steps {nd} \\
    --batch_size_disc {bd} --batch_size_gene {bg} \\
    --lr_g 1e-4 --lr_d 1e-4 \\
    --kernel_sigma -1.0 --threshold_type {vtype} --kappa {kappa} \\{diffaug}
    --save_niters_freq 5000 --visualize_freq {vis} \\
    --samp_batch_size 500 --nfake_per_label 200 --dump_fake_data \\
    "$@" 2>&1 | tee output_ccgan_{data}_{img}.txt
"""

# per-dataset rows match the reference run_train.sh exactly: RC-49 uses
# NUM_D_STEPS=2 + DiffAugment + visualize_freq 2000; Cell-200 uses
# NUM_D_STEPS=1, no DiffAugment, visualize_freq 1000.
for tag, data, img, minl, maxl, refdir, arch, gene_ch, disc_ch, bd, bg, loss, vtype, kappa, niters, nd, diffaug, vis, extra, note in [
    ("RC64", "RC-49", 64, 0, 90.0, "RC-49/RC-49_64x64", "sagan", 64, 64,
     256, 256, "hinge", "soft", -2.0, 30000, 2, "\n    --gan_DiffAugment \\", 2000, "", ""),
    ("Cell", "Cell200", 64, 1, 200, "Cell-200/Cell-200_64x64", "sngan", 64, 64,
     32, 512, "vanilla", "soft", -2.0, 5000, 1, "", 1000, "--num_channels 1",
     "\n# (reference uses DCGAN here; SNGAN is the closest in-framework arch)"),
]:
    path = f"/root/repo/scripts/{tag}/run_ccgan.sh"
    with open(path, "w") as f:
        f.write(CCGAN_TEMPLATE.format(tag=tag, data=data, img=img, minl=minl, maxl=maxl,
                                      refdir=refdir, arch=arch, gene_ch=gene_ch,
                                      disc_ch=disc_ch, bd=bd, bg=bg, loss=loss,
                                      vtype=vtype, kappa=kappa, niters=niters,
                                      nd=nd, diffaug=diffaug, vis=vis,
                                      extra=extra, note=note))
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)

print("generated", len(os.listdir("/root/repo/scripts")))
