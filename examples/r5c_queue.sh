#!/bin/bash
# Round-5 session-2 follow-up queue (chip-serialized), in value order:
#   A  parity score phase (both fake sets exist -> PARITY.md, VERDICT #2)
#   B  SA-64 e2e rerun — the first attempt died in the relayed compile RPC
#      (HTTP 413: the 123 MB SA bank was lowered as an HLO constant; fixed
#      by threading the bank as jit arguments, commit in session 2)
#   C  §9.2/§9.3 perf audits with a REAL budget (the 500 s timeout killed
#      them mid-compile in r4 AND in r5b; 2 batch-arms x 4 sizes of a
#      250-step scan compile in ~15-20 min cold on this relay)
set -u
cd /root/repo
mkdir -p runs/queue_logs artifacts/sa64_r5
PIDFILE=runs/queue.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; then
    echo "queue already running (pid $(cat $PIDFILE))"; exit 1
fi
echo $$ > "$PIDFILE"
T0=$(date +%s)
phase() { echo "[queue +$(( $(date +%s) - T0 ))s $(date +%T)] === $1 ==="; }
done_marker() { echo "[queue +$(( $(date +%s) - T0 ))s] PHASE_$2: $1"; }

phase "A parity score"
python -u examples/quality_parity_cell200.py --phase score \
    > runs/queue_logs/10_parity_score.log 2>&1 \
    && done_marker parity_score DONE || done_marker parity_score FAIL
cp -f runs/parity_cell200/PARITY.md artifacts/parity_r5/ 2>/dev/null

phase "B SA-64 e2e rerun"
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
    > runs/queue_logs/11_sa64.log 2>&1 \
    && done_marker sa64 DONE || done_marker sa64 FAIL
SA_SET=runs/sa64_r4/output/SteeringAngle_64/Setup_CCDM
cp -f $SA_SET/setting_info.txt $SA_SET/eval_results_niters5000.txt \
      $SA_SET/results/log_loss_niters5000.txt $SA_SET/results/train_log.jsonl \
      $SA_SET/results/sample_*.png artifacts/sa64_r5/ 2>/dev/null

phase "C perf audits (64^2 head / 192^2), real budget"
timeout 1800 python -u examples/perf_session_r4.py head64 \
    > runs/queue_logs/12_perf_head64.log 2>&1 \
    && done_marker perf_head64 DONE || done_marker perf_head64 FAIL
timeout 1800 python -u examples/perf_session_r4.py uk192 \
    > runs/queue_logs/13_perf_uk192.log 2>&1 \
    && done_marker perf_uk192 DONE || done_marker perf_uk192 FAIL

phase "queue complete"
rm -f "$PIDFILE"
