#!/bin/bash
# Cell ccdpm launch — hyperparameters mirror the reference
# CCDM_unified/scripts/Cell/linux/run_ccdpm.sh (SURVEY.md §6).
ROOT_PATH=${ROOT_PATH:-./}
DATA_PATH=${DATA_PATH:-./datasets}

python -m ccdm_tpu.main \
    --setting_name Setup_CcDPM \
    --root_path $ROOT_PATH --data_name Cell200 --data_path $DATA_PATH \
    --image_size 64 --train_amp \
    --min_label 1 --max_label 200 \
    --pred_objective pred_noise \
    --model_channels 32 --cond_drop_prob 0.1 --channel_mult 1_2_2_4 \
    --y2h_embed_type resnet  --num_channels 1 \
    --niters 50000 --resume_niter 0 --train_lr 5e-5 --train_timesteps 1000 \
    --train_batch_size 128 --gradient_accumulate_every 1 \
    --kernel_sigma -1.0 --threshold_type soft --kappa -2.0 \
    --sample_every 10000 --save_every 10000 \
    --sample_timesteps 250 --sample_cond_scale 1.5 \
    --sampler ddim --samp_batch_size 200 --nfake_per_label 200 \
    --dump_fake_data \
    "$@" 2>&1 | tee output_Cell200_64_CcDPM.txt
