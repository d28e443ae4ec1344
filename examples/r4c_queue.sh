#!/bin/bash
# Round-4c TPU queue — r4b reordered after two incidents ate ~40 min:
# (a) a wedged remote-compile RPC held the chip 27 min (killed, post-mortem
#     in ROUND4.md), (b) the partial-embed-cache crash (fixed, 21698dc).
# Teacher->DMD->evals lead (the VERDICT #2 deliverable); SA-64 and the
# remaining perf sections (train rooflines already captured in
# runs/queue_logs/04_perf.log) trail and truncate gracefully if the
# session ends first.
set -u
cd /root/repo
mkdir -p runs/queue_logs
R=runs/cell200_r4
DATA10K=runs/datasets_fixture10k
T0=$(date +%s)
phase() { echo "[queue +$(( $(date +%s) - T0 ))s $(date +%T)] === $1 ==="; }
done_marker() { echo "[queue +$(( $(date +%s) - T0 ))s] PHASE_$2: $1"; }

NITERS=10000
TEACHER_ARGS=(--setting_name Setup_CCDM --root_path $R --data_name Cell200
    --data_path $DATA10K --eval_ckpt_path $R --seed 111
    --image_size 64 --min_label 1 --max_label 200 --num_channels 1
    --pred_objective pred_x0 --model_channels 32 --channel_mult 1_2_2_4
    --cond_drop_prob 0.1 --use_Hy --hy_max_log 4.0
    --y2h_embed_type resnet --y2cov_embed_type resnet
    --epoch_cnn_embed 60 --epoch_net_y2h 250 --epoch_net_y2cov 250
    --niters $NITERS --train_lr 5e-5 --train_timesteps 1000
    --train_batch_size 128 --train_amp
    --kernel_sigma -1.0 --threshold_type hard --kappa -2.0
    --sample_every 5000 --save_every 5000
    --sampler ddim --sample_timesteps 250 --sample_cond_scale 1.5
    --samp_batch_size 200 --nfake_per_label 50)

DMD_ARGS=(--root_path $R --data_name Cell200 --data_path $DATA10K
    --setting_name Setup_CCDM --seed 111 --min_label 1 --max_label 200
    --image_size 64 --num_channels 1 --teacher_milestone $NITERS
    --model_channels 32 --channel_mult 1_2_2_4 --use_Hy
    --y2h_embed_type resnet --y2cov_embed_type resnet
    --gan_arch sngan --gene_ch 64 --disc_ch 64 --dim_z 256
    --train_batch_size 128
    --train_lr_generator 1e-4 --train_lr_guidance 1e-4
    --num_D_steps 2 --weight_guidance_adv 10 --weight_generator_adv 1
    --adv_loss_type hinge --gan_DiffAugment
    --kappa -2.0 --kernel_sigma -1.0
    --nfake_per_label 50 --samp_batch_size 200 --eval_mode 2
    --comp_FID --FID_radius 0 --comp_prdc --comp_intra_fid --comp_niqe
    --eval_ckpt_path $R)

phase "1 teacher ${NITERS}"
python -u -m ccdm_tpu.main "${TEACHER_ARGS[@]}" --resume_niter 0 \
    > runs/queue_logs/01_teacher.log 2>&1 \
    && done_marker teacher DONE || done_marker teacher FAIL

TEACHER_CKPT=$R/output/Cell200_64/Setup_CCDM/results/model-$NITERS
if [ -e "$TEACHER_CKPT" ] || ls -d "$TEACHER_CKPT"* >/dev/null 2>&1; then
    phase "2 dmd 3k + eval"
    python -u -m ccdm_tpu.dmd_main "${DMD_ARGS[@]}" --niters 3000 --resume_niter 0 \
        --sample_every 1000 --save_every 3000 \
        > runs/queue_logs/02_dmd3k.log 2>&1 \
        && done_marker dmd3k DONE || done_marker dmd3k FAIL

    phase "3 teacher sample + eval"
    python -u -m ccdm_tpu.main "${TEACHER_ARGS[@]}" --resume_niter $NITERS \
        --dump_fake_data --comp_FID --eval_mode 2 --FID_radius 0 \
        --FID_num_centers -1 --comp_prdc --comp_intra_fid --comp_niqe \
        > runs/queue_logs/03_teacher_eval.log 2>&1 \
        && done_marker teacher_eval DONE || done_marker teacher_eval FAIL
else
    echo "[queue] no teacher ckpt at $TEACHER_CKPT — skipping phases 2-3"
fi

phase "4 SA-64 e2e (fixture budget)"
python -u -m ccdm_tpu.main --setting_name Setup_CCDM --root_path runs/sa64_r4 \
    --data_name SteeringAngle --data_path runs/datasets_fixture_sa \
    --eval_ckpt_path runs/sa64_r4 --seed 111 \
    --image_size 64 --min_label -80 --max_label 80 --num_channels 3 \
    --pred_objective pred_x0 --model_channels 32 --channel_mult 1_2_2_4 \
    --cond_drop_prob 0.1 --use_Hy --hy_max_log 4.0 \
    --y2h_embed_type resnet --y2cov_embed_type resnet \
    --epoch_cnn_embed 50 --epoch_net_y2h 150 --epoch_net_y2cov 150 \
    --niters 5000 --train_lr 1e-4 --train_timesteps 1000 \
    --train_batch_size 128 --train_amp \
    --kernel_sigma -1.0 --threshold_type hard --kappa -5.0 \
    --sample_every 2500 --save_every 2500 \
    --sampler ddim --sample_timesteps 250 --sample_cond_scale 1.5 \
    --samp_batch_size 200 --nfake_per_label 20 --dump_fake_data \
    --comp_FID --eval_mode 2 --FID_radius 5 --comp_niqe \
    > runs/queue_logs/05_sa64.log 2>&1 \
    && done_marker sa64 DONE || done_marker sa64 FAIL

phase "5 perf session remainder (64^2 head / 192^2)"
timeout 500 python -u examples/perf_session_r4.py head64 \
    > runs/queue_logs/06_perf_head64.log 2>&1 \
    && done_marker perf_head64 DONE || done_marker perf_head64 FAIL
timeout 500 python -u examples/perf_session_r4.py uk192 \
    > runs/queue_logs/07_perf_uk192.log 2>&1 \
    && done_marker perf_uk192 DONE || done_marker perf_uk192 FAIL

phase "queue complete"
