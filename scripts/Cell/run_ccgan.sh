#!/bin/bash
# Cell CcGAN baseline launch — hyperparameters mirror the reference
# CCDM_vanilla/Cell-200/Cell-200_64x64/CCGM/CcGAN/scripts/run_train.sh.
# (reference uses DCGAN here; SNGAN is the closest in-framework arch)
ROOT_PATH=${ROOT_PATH:-./}
DATA_PATH=${DATA_PATH:-./datasets}

python -m ccdm_tpu.ccgan_main \
    --setting_name Setup_CcGAN \
    --root_path $ROOT_PATH --data_name Cell200 --data_path $DATA_PATH \
    --image_size 64 --min_label 1 --max_label 200 --num_channels 1 \
    --gan_arch sngan --gene_ch 64 --disc_ch 64 --dim_gan 256 \
    --niters 5000 --loss_type vanilla --num_D_steps 1 \
    --batch_size_disc 32 --batch_size_gene 512 \
    --lr_g 1e-4 --lr_d 1e-4 \
    --kernel_sigma -1.0 --threshold_type soft --kappa -2.0 \
    --save_niters_freq 5000 --visualize_freq 1000 \
    --samp_batch_size 500 --nfake_per_label 200 --dump_fake_data \
    "$@" 2>&1 | tee output_ccgan_Cell200_64.txt
