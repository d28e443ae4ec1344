#!/bin/bash
# Round-4b TPU work queue — the surviving VERDICT-r3 run directives after
# the mid-round box reset wiped runs/ a second time (the r4 50k teacher
# checkpoint is gone; only the committed train_log/sample grid remain).
#
# This session has ~1h of chip time, so budgets are cut vs r4_queue.sh and
# every deviation is documented in the artifact READMEs:
#   0  Cell-200 10k fixture (deterministic, byte-identical to r3 pool)
#   1  teacher retrain at 15k iters (r3/r4 recipe otherwise; embeds
#      60/250/10/250 epochs vs default 200/500/10/500)
#   2  DMD2-M distill 3k with the POST-FIX trainer + full shared-protocol
#      eval (VERDICT #2 — the round's headline deliverable)
#   3  teacher sample + eval at the same nfake (teacher column for #2's A/B)
#   4  perf session: train/64^2/192^2 rooflines (VERDICT #5), time-boxed
#   5  SteeringAngle-64 e2e at fixture budget (VERDICT #6)
#
# Launch:  setsid nohup bash examples/r4b_queue.sh > runs/queue_logs/queue.log 2>&1 &
set -u
cd /root/repo
mkdir -p runs/queue_logs
PIDFILE=runs/queue.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; then
    echo "queue already running (pid $(cat $PIDFILE))"; exit 1
fi
echo $$ > "$PIDFILE"

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

phase "0 fixtures"
if [ ! -f $DATA10K/Cell200_64x64.h5 ]; then
    python examples/make_fixture_cell200.py --out $DATA10K \
        --imgs_per_count 50 --max_count 200 > runs/queue_logs/00_fixture10k.log 2>&1 \
        && done_marker fixture10k DONE || done_marker fixture10k FAIL
fi

phase "1 teacher ${NITERS}"
if python -m ccdm_tpu.main "${TEACHER_ARGS[@]}" --resume_niter 0 \
        > runs/queue_logs/01_teacher.log 2>&1; then
    done_marker teacher DONE
else
    done_marker teacher FAIL
fi

TEACHER_CKPT=$R/output/Cell200_64/Setup_CCDM/results/model-$NITERS
if [ -e "$TEACHER_CKPT" ] || ls -d "$TEACHER_CKPT"* >/dev/null 2>&1; then
    phase "2 dmd 3k + eval"
    python -m ccdm_tpu.dmd_main "${DMD_ARGS[@]}" --niters 3000 --resume_niter 0 \
        --sample_every 1000 --save_every 3000 \
        > runs/queue_logs/02_dmd3k.log 2>&1 \
        && done_marker dmd3k DONE || done_marker dmd3k FAIL

    phase "3 teacher sample + eval"
    python -m ccdm_tpu.main "${TEACHER_ARGS[@]}" --resume_niter $NITERS \
        --dump_fake_data --comp_FID --eval_mode 2 --FID_radius 0 \
        --FID_num_centers -1 --comp_prdc --comp_intra_fid --comp_niqe \
        > runs/queue_logs/03_teacher_eval.log 2>&1 \
        && done_marker teacher_eval DONE || done_marker teacher_eval FAIL
else
    echo "[queue] no teacher ckpt at $TEACHER_CKPT — skipping phases 2-3"
fi

phase "4 perf session (train / 64^2 / 192^2)"
timeout 900 python examples/perf_session_r4.py all > runs/queue_logs/04_perf.log 2>&1 \
    && done_marker perf DONE || done_marker perf FAIL

phase "5 SA-64 e2e (fixture budget)"
if [ ! -f runs/datasets_fixture_sa/SteeringAngle_64x64.h5 ]; then
    python examples/make_fixture_sa64.py --out runs/datasets_fixture_sa \
        --imgs_per_angle 50 --num_angles 200 > runs/queue_logs/05_fixture_sa.log 2>&1
fi
python -m ccdm_tpu.main --setting_name Setup_CCDM --root_path runs/sa64_r4 \
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

phase "queue complete"
rm -f "$PIDFILE"
