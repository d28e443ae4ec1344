#!/bin/bash
# Round-5 session-2 final TPU queue — launched the moment the wedged relay
# recovered (~1.5 h outage; see ROUND5.md incident log). Value order:
#   A  parity score on the chip (full 10/20 backbone budget, r4 design)
#   B  SA-64 eval resume (training + per-label fakes persisted pre-wedge;
#      restartable sampling reloads the dumps, so this is eval-only)
#   C  §9.2/§9.3 perf audits (head64 / uk192, bf16-precast A/B arms)
# No phase is ever killed mid-RPC (the wedge root cause): timeouts are
# generous and SIGTERM-free where possible.
set -u
cd /root/repo
mkdir -p runs/queue_logs artifacts/sa64_r5 artifacts/parity_r5
PIDFILE=runs/queue.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; then
    echo "queue already running (pid $(cat $PIDFILE))"; exit 1
fi
echo $$ > "$PIDFILE"
T0=$(date +%s)
phase() { echo "[queue +$(( $(date +%s) - T0 ))s $(date +%T)] === $1 ==="; }
done_marker() { echo "[queue +$(( $(date +%s) - T0 ))s] PHASE_$2: $1"; }

phase "A parity score (TPU)"
rm -f runs/parity_cell200/score_torch.json runs/parity_cell200/score_jax.json
python -u examples/quality_parity_cell200.py --phase score \
    > runs/queue_logs/14_parity_score_tpu.log 2>&1 \
    && done_marker parity_score DONE || done_marker parity_score FAIL
cp -f runs/parity_cell200/PARITY.md runs/parity_cell200/score_*.json \
    artifacts/parity_r5/ 2>/dev/null

phase "B SA-64 eval resume"
python -u -m ccdm_tpu.main --setting_name Setup_CCDM --root_path runs/sa64_r4 \
    --data_name SteeringAngle --data_path runs/datasets_fixture_sa \
    --eval_ckpt_path runs/sa64_r4 --seed 111 \
    --image_size 64 --min_label -80 --max_label 80 --num_channels 3 \
    --pred_objective pred_x0 --model_channels 32 --channel_mult 1_2_2_4 \
    --cond_drop_prob 0.1 --use_Hy --hy_max_log 4.0 \
    --y2h_embed_type resnet --y2cov_embed_type resnet \
    --epoch_cnn_embed 50 --epoch_net_y2h 150 --epoch_net_y2cov 150 \
    --niters 5000 --resume_niter 5000 --train_lr 1e-4 --train_timesteps 1000 \
    --train_batch_size 128 --train_amp \
    --kernel_sigma -1.0 --threshold_type hard --kappa -5.0 \
    --sample_every 2500 --save_every 2500 \
    --sampler ddim --sample_timesteps 250 --sample_cond_scale 1.5 \
    --samp_batch_size 200 --nfake_per_label 20 --dump_fake_data \
    --comp_FID --eval_mode 2 --FID_radius 5 --comp_niqe \
    > runs/queue_logs/15_sa64_eval.log 2>&1 \
    && done_marker sa64_eval DONE || done_marker sa64_eval FAIL
SA_SET=runs/sa64_r4/output/SteeringAngle_64/Setup_CCDM
cp -f $SA_SET/eval_results_niters5000.txt artifacts/sa64_r5/ 2>/dev/null

phase "C perf audits (64^2 head / 192^2)"
timeout 2400 python -u examples/perf_session_r4.py head64 \
    > runs/queue_logs/16_perf_head64.log 2>&1 \
    && done_marker perf_head64 DONE || done_marker perf_head64 FAIL
timeout 2400 python -u examples/perf_session_r4.py uk192 \
    > runs/queue_logs/17_perf_uk192.log 2>&1 \
    && done_marker perf_uk192 DONE || done_marker perf_uk192 FAIL

phase "queue complete"
rm -f "$PIDFILE"
