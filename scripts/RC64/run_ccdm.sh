#!/bin/bash
# RC64 ccdm launch — hyperparameters mirror the reference
# CCDM_unified/scripts/RC64/linux/run_ccdm.sh (SURVEY.md §6).
ROOT_PATH=${ROOT_PATH:-./}
DATA_PATH=${DATA_PATH:-./datasets}

python -m ccdm_tpu.main \
    --setting_name Setup_CCDM \
    --root_path $ROOT_PATH --data_name RC-49 --data_path $DATA_PATH \
    --image_size 64 --train_amp \
    --min_label 0 --max_label 90.0 \
    --pred_objective pred_x0 \
    --model_channels 64 --cond_drop_prob 0.1 --channel_mult 1_2_2_4_8 \
    --use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet \
    --niters 50000 --resume_niter 0 --train_lr 1e-4 --train_timesteps 1000 \
    --train_batch_size 128 --gradient_accumulate_every 1 \
    --kernel_sigma -1.0 --threshold_type hard --kappa -2.0 \
    --sample_every 10000 --save_every 10000 \
    --sample_timesteps 250 --sample_cond_scale 1.5 \
    --sampler ddim --samp_batch_size 200 --nfake_per_label 200 \
    --dump_fake_data \
    "$@" 2>&1 | tee output_RC-49_64_CCDM.txt
