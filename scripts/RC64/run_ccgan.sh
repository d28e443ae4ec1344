#!/bin/bash
# RC64 CcGAN baseline launch — hyperparameters mirror the reference
# CCDM_vanilla/RC-49/RC-49_64x64/CCGM/CcGAN/scripts/run_train.sh.
ROOT_PATH=${ROOT_PATH:-./}
DATA_PATH=${DATA_PATH:-./datasets}

python -m ccdm_tpu.ccgan_main \
    --setting_name Setup_CcGAN \
    --root_path $ROOT_PATH --data_name RC-49 --data_path $DATA_PATH \
    --image_size 64 --min_label 0 --max_label 90.0  \
    --gan_arch sagan --gene_ch 64 --disc_ch 64 --dim_gan 256 \
    --niters 30000 --loss_type hinge --num_D_steps 2 \
    --batch_size_disc 256 --batch_size_gene 256 \
    --lr_g 1e-4 --lr_d 1e-4 \
    --kernel_sigma -1.0 --threshold_type soft --kappa -2.0 \
    --gan_DiffAugment \
    --save_niters_freq 5000 --visualize_freq 2000 \
    --samp_batch_size 500 --nfake_per_label 200 --dump_fake_data \
    "$@" 2>&1 | tee output_ccgan_RC-49_64.txt
