#!/bin/bash
# Round-5 session-2 TPU queue — resumes exactly where examples/r5_queue.sh
# died (the session clock ran out during phase 3, and runs/ was wiped
# between sessions AGAIN — but this time every phase-1/2 artifact including
# the orbax checkpoints had been committed, so phases 3+ resume from the
# restored tarballs instead of retraining).
#
# Pre-conditions (done by the interactive session before launch):
#   * artifacts/cell200_r5/teacher_model-10000.tar.gz untarred back to
#     runs/cell200_r4/output/Cell200_64/Setup_CCDM/results/model-10000
#   * torch half of quality parity running nice-19 in a separate process
#     (runs/queue_logs/torch_parity_r5.log), NITERS=1200 for BOTH stacks
#
# Phases (TPU-serialized — one chip):
#   3 teacher sample + eval  (the A/B control column, VERDICT #1/weak#4)
#   5 jax half of quality parity (VERDICT #2; scored with torch later)
#   4 SA-64 e2e              (VERDICT #3b)
#   6 perf session remainder (64^2 head + 192^2, VERDICT #4)
set -u
cd /root/repo
mkdir -p runs/queue_logs artifacts/cell200_r5 artifacts/sa64_r5
PIDFILE=runs/queue.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; then
    echo "queue already running (pid $(cat $PIDFILE))"; exit 1
fi
echo $$ > "$PIDFILE"

R=runs/cell200_r4
DATA10K=runs/datasets_fixture10k
SETTING=$R/output/Cell200_64/Setup_CCDM
T0=$(date +%s)
phase() { echo "[queue +$(( $(date +%s) - T0 ))s $(date +%T)] === $1 ==="; }
done_marker() { echo "[queue +$(( $(date +%s) - T0 ))s] PHASE_$2: $1"; }
gcommit() {  # gcommit <message> <paths...>
    local msg="$1"; shift
    flock /tmp/ccdm_git.lock bash -c \
        "cd /root/repo && git add -A $* runs/queue_logs && git commit -q -m '$msg' || true"
}

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

phase "0 fixtures"
if [ ! -f $DATA10K/Cell200_64x64.h5 ]; then
    python examples/make_fixture_cell200.py --out $DATA10K \
        --imgs_per_count 50 --max_count 200 > runs/queue_logs/00_fixture10k.log 2>&1
fi
[ -f $DATA10K/Cell200_64x64.h5 ] || { echo "FATAL: cell200 fixture missing"; rm -f $PIDFILE; exit 1; }

if [ -d "$SETTING/results/model-$NITERS" ]; then
    phase "3 teacher sample + eval (A/B control column)"
    python -u -m ccdm_tpu.main "${TEACHER_ARGS[@]}" --resume_niter $NITERS \
        --dump_fake_data --comp_FID --eval_mode 2 --FID_radius 0 \
        --FID_num_centers -1 --comp_prdc --comp_intra_fid --comp_niqe \
        > runs/queue_logs/03_teacher_eval.log 2>&1 \
        && done_marker teacher_eval DONE || done_marker teacher_eval FAIL
    cp -f $SETTING/eval_results_niters$NITERS.txt artifacts/cell200_r5/ 2>/dev/null
    gcommit "r5 queue: 10k teacher scored through the shared protocol" artifacts/cell200_r5
else
    echo "[queue] no teacher ckpt at $SETTING/results/model-$NITERS — skipping phase 3"
fi

phase "5 jax half of quality parity"
if [ ! -f runs/datasets_fixture/Cell200_64x64.h5 ]; then
    python examples/make_fixture_cell200.py --out runs/datasets_fixture \
        > runs/queue_logs/06_fixture3k.log 2>&1
fi
python -u examples/quality_parity_cell200.py --phase jax \
    > runs/queue_logs/07_parity_jax.log 2>&1 \
    && done_marker parity_jax DONE || done_marker parity_jax FAIL
gcommit "r5 queue: jax half of the quality-parity run" runs/queue_logs

phase "4 SA-64 e2e (fixture budget)"
if [ ! -f runs/datasets_fixture_sa/SteeringAngle_64x64.h5 ]; then
    python examples/make_fixture_sa64.py --out runs/datasets_fixture_sa \
        --imgs_per_angle 50 --num_angles 200 > runs/queue_logs/05_fixture_sa.log 2>&1
fi
if [ -f runs/datasets_fixture_sa/SteeringAngle_64x64.h5 ]; then
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
SA_SET=runs/sa64_r4/output/SteeringAngle_64/Setup_CCDM
cp -f $SA_SET/setting_info.txt $SA_SET/eval_results_niters5000.txt \
      $SA_SET/results/log_loss_niters5000.txt $SA_SET/results/train_log.jsonl \
      $SA_SET/results/sample_*.png artifacts/sa64_r5/ 2>/dev/null
gcommit "r5 queue: SA-64 end-to-end (signed-label shift-norm exercised)" artifacts/sa64_r5
else
    done_marker sa64_fixture FAIL
fi

phase "6 perf session remainder (64^2 head / 192^2)"
timeout 500 python -u examples/perf_session_r4.py head64 \
    > runs/queue_logs/08_perf_head64.log 2>&1 \
    && done_marker perf_head64 DONE || done_marker perf_head64 FAIL
timeout 500 python -u examples/perf_session_r4.py uk192 \
    > runs/queue_logs/09_perf_uk192.log 2>&1 \
    && done_marker perf_uk192 DONE || done_marker perf_uk192 FAIL
gcommit "r5 queue: perf session logs (64^2 head / 192^2)" runs/queue_logs

phase "queue complete"
rm -f "$PIDFILE"
