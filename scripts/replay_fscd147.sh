#!/usr/bin/env bash
# Replay-readiness harness: the reference's full FSCD-147 two-stage schedule
# as ONE command — stage-1 train -> pseudo-label generation -> stage-2 train
# -> inference -> offline evaluation, with the reference preset flags
# (weakly_supervise_fscd_147.sh: stage 1, defined prior, 30 epochs;
# var_wh_laplace_600.sh: stage 2, grid prior, 600 queries, 1200 epochs at
# batch 1 -> here batch 8 with linearly scaled lr, or EXACT_REPLAY=1 for
# the bit-faithful batch-1 + scipy-matcher schedule).
#
# Usage:
#   bash scripts/replay_fscd147.sh                      # synthetic dry run
#   DATA_PATH=/data/FSC147 bash scripts/replay_fscd147.sh   # the real thing
#   EXACT_REPLAY=1 DATA_PATH=... bash scripts/replay_fscd147.sh
#   SMOKE=1 DATA_PATH=... bash scripts/replay_fscd147.sh
#     readiness smoke: ~50 real-layout train steps of EACH stage + the full
#     pseudo-gen/infer/eval chain at production geometry — minutes of risk
#     retirement before committing to the multi-hour schedule
#
# The dry run proves the command sequence end-to-end on a generated
# synthetic tree (small epochs); pointing DATA_PATH at a real FSC-147
# layout runs the reference schedule unchanged. Expected wall time is
# printed up front from the measured PERFORMANCE.md throughput.
set -e
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"
cd "$(dirname "$0")/.."

OUT="${OUT:-/tmp/countdetr_replay}"
SYNTH=0
if [ -z "${DATA_PATH}" ]; then
  SYNTH=1
  DATA_PATH=/tmp/countdetr_replay_data
  echo "== no DATA_PATH: dry-running on a synthetic FSCD-147 tree =="
  python -c "from countdetr_tpu.data.synthetic import make_synthetic_fscd147 as m; m('${DATA_PATH}', n_train=8, n_val=3, n_test=3, size=(96,128), with_pseudo=False)"
  S1_EPOCHS="${S1_EPOCHS:-2}";  S2_EPOCHS="${S2_EPOCHS:-2}"
  SIZE_FLAGS="--buckets 96x128 --max_points 32 --max_boxes 64 --batch_size 3"
  MODEL_FLAGS="--enc_layers 1 --dec_layers 1 --hidden_dim 32 --nheads 4 --dim_feedforward 64"
  Q1="--num_query_position 3"; Q2="--num_query_position 25"
  LR1="--lr 2e-3"; LR2="--lr 1e-3"
else
  S1_EPOCHS="${S1_EPOCHS:-30}"; S2_EPOCHS="${S2_EPOCHS:-1200}"
  SIZE_FLAGS="--buckets 384x384,384x512,384x672 --max_points 700 --max_boxes 700"
  MODEL_FLAGS=""
  Q1="--num_query_position 3"; Q2="--num_query_position 600"
  if [ "${SMOKE}" = "1" ]; then
    # production geometry/model, but cap each train phase at ~50 steps; the
    # pseudo-gen/infer/eval phases always run their full (cheap) pass
    SIZE_FLAGS="$SIZE_FLAGS --max_steps ${SMOKE_STEPS:-50}"
    S1_EPOCHS=1; S2_EPOCHS=1
    echo "== SMOKE mode: ${SMOKE_STEPS:-50} train steps per stage =="
  fi
  if [ "${EXACT_REPLAY}" = "1" ]; then
    SIZE_FLAGS="$SIZE_FLAGS --exact_replay"
    LR1="--lr 1e-4"; LR2="--lr 1e-4"
  else
    # batch 8 with linearly scaled lr from the reference's 1e-4 @ batch 1
    SIZE_FLAGS="$SIZE_FLAGS --batch_size 8"
    LR1="--lr 8e-4"; LR2="--lr 8e-4"
  fi
  # wall-time estimate from PERFORMANCE.md measured throughput
  python - <<EOF
import json, os
n_train = len(json.load(open(os.path.join("${DATA_PATH}", "Train_Test_Val_FSC_147.json")))["train"])
ips = 105.0  # tier-mix effective train img/s/chip at 592px (PERFORMANCE.md round 3)
s1 = n_train * ${S1_EPOCHS} / ips / 3600
s2 = n_train * ${S2_EPOCHS} / ips / 3600
print(f"== expected wall time at {ips:.0f} img/s/chip: stage1 ~{s1:.1f} h, stage2 ~{s2:.1f} h ==")
EOF
fi

COMMON="--dataset_file fscd_147 --data_path ${DATA_PATH} ${SIZE_FLAGS} ${MODEL_FLAGS} --num_workers ${NUM_WORKERS:-4} --decoded_cache"

echo "== [1/5] stage-1 train (${S1_EPOCHS} epochs) =="
python -m countdetr_tpu.cli.main --stage 1 ${COMMON} ${Q1} ${LR1} \
  --spatial_prior defined --num_query_pattern 1 \
  --output_dir "${OUT}/stage1" --epochs "${S1_EPOCHS}" --auto_resume

echo "== [2/5] pseudo-label generation =="
python -m countdetr_tpu.cli.main --stage 1 ${COMMON} ${Q1} \
  --spatial_prior defined --num_query_pattern 1 \
  --output_dir "${DATA_PATH}/annotations" --generate_pseudo_label \
  --resume "${OUT}/stage1/checkpoints"

echo "== [3/5] stage-2 train (${S2_EPOCHS} epochs, var_wh_laplace_600 preset) =="
python -m countdetr_tpu.cli.main --stage 2 ${COMMON} ${Q2} ${LR2} \
  --spatial_prior grid --num_query_pattern 1 --no_aux_loss \
  --output_dir "${OUT}/stage2" --epochs "${S2_EPOCHS}" --auto_resume

echo "== [4/5] inference (val + test) =="
python -m countdetr_tpu.cli.main --stage 2 ${COMMON} ${Q2} \
  --spatial_prior grid --num_query_pattern 1 --no_aux_loss \
  --output_dir "${OUT}/stage2" --infer \
  --checkpoint_path "${OUT}/stage2/checkpoints"

echo "== [5/5] offline evaluation =="
python -m countdetr_tpu.cli.main --stage 2 --dataset_file fscd_147 \
  --data_path "${DATA_PATH}" --output_dir "${OUT}/stage2" \
  --evaluate_predictions "${OUT}/stage2/predictions_test.json"

echo "== REPLAY PIPELINE COMPLETE (out: ${OUT}) =="
[ "$SYNTH" = "1" ] && echo "(synthetic dry run; set DATA_PATH for the real schedule)"
