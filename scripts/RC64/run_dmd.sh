#!/bin/bash
# RC64 DMD2-M launch — mirrors scripts/RC64/linux/run_dmd.sh semantics.
ROOT_PATH=${ROOT_PATH:-./}
DATA_PATH=${DATA_PATH:-./datasets}

python -m ccdm_tpu.dmd_main \
    --setting_name Setup_CCDM \
    --root_path $ROOT_PATH --data_name RC-49 --data_path $DATA_PATH \
    --image_size 64 --min_label 0 --max_label 90.0 \
    --model_channels 64 --channel_mult 1_2_2_4_8 \
    --use_Hy --y2h_embed_type resnet --y2cov_embed_type resnet \
    --teacher_milestone 50000 \
    --gan_arch sngan --gene_ch 84 --disc_ch 64 --dim_z 256 \
    --niters 50000 --train_batch_size 128 \
    --train_lr_generator 1e-4 --train_lr_guidance 1e-4 \
    --num_D_steps 2 --weight_guidance_adv 10 --weight_generator_adv 1 \
    --adv_loss_type hinge --gan_DiffAugment \
    --kappa 0.0 --kernel_sigma -1.0 \
    --sample_every 1000 --save_every 5000 \
    --nfake_per_label 200 --samp_batch_size 200 \
    "$@" 2>&1 | tee output_dmd_RC-49_64.txt
