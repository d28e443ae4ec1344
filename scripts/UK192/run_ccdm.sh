#!/bin/bash
# UK192 ccdm launch — hyperparameters mirror the reference
# CCDM_unified/scripts/UK192/linux/run_ccdm.sh (SURVEY.md §6).
ROOT_PATH=${ROOT_PATH:-./}
DATA_PATH=${DATA_PATH:-./datasets}

python -m ccdm_tpu.main \
    --setting_name Setup_CCDM \
    --root_path $ROOT_PATH --data_name UTKFace --data_path $DATA_PATH \
    --image_size 192 --train_amp \
    --min_label 1 --max_label 60 \
    --pred_objective pred_x0 \
    --model_channels 64 --cond_drop_prob 0.1 --channel_mult 1_2_2_4_4_8_8 \
    --use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet \
    --niters 300000 --resume_niter 0 --train_lr 1e-5 --train_timesteps 1000 \
    --train_batch_size 16 --gradient_accumulate_every 4 \
    --kernel_sigma -1.0 --threshold_type hard --kappa -1.0 \
    --sample_every 10000 --save_every 10000 \
    --sample_timesteps 100 --sample_cond_scale 2.0 \
    --sampler ddim --samp_batch_size 200 --nfake_per_label 200 \
    --dump_fake_data \
    "$@" 2>&1 | tee output_UTKFace_192_CCDM.txt
