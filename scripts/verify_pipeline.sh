set -e
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
TINY="--enc_layers 1 --dec_layers 1 --hidden_dim 32 --nheads 4 --dim_feedforward 64"
cd /root/repo

echo "=== STAGE 1 TRAIN ==="
python -m countdetr_tpu.cli.main --stage 1 --dataset_file fscd_147 \
  --spatial_prior defined --num_query_pattern 1 --num_query_position 3 $TINY \
  --data_path /tmp/verify_data --output_dir /tmp/verify_out1 \
  --batch_size 3 --epochs 2 --lr 2e-3 --buckets 96x128 --max_points 16 --log_every 1 2>&1 | grep -v WARNING | tail -5 || exit 1

echo "=== STAGE 1 PSEUDO-LABEL GENERATION ==="
python -m countdetr_tpu.cli.main --stage 1 --dataset_file fscd_147 \
  --spatial_prior defined --num_query_pattern 1 $TINY \
  --data_path /tmp/verify_data --output_dir /tmp/verify_data/annotations \
  --generate_pseudo_label --auto_resume --resume /tmp/verify_out1/checkpoints \
  --batch_size 3 --buckets 96x128 --max_points 16 2>&1 | grep -v WARNING | tail -4 || exit 1
python -c "import json; d=json.load(open('/tmp/verify_data/annotations/pseudo_bbox_train.json')); print('pseudo train annos:', len(d['annotations']), 'format:', d['box_format'])"

echo "=== STAGE 2 TRAIN ==="
python -m countdetr_tpu.cli.main --stage 2 --dataset_file fscd_147 \
  --spatial_prior grid --num_query_position 25 --num_query_pattern 1 --no_aux_loss $TINY \
  --data_path /tmp/verify_data --output_dir /tmp/verify_out2 \
  --batch_size 3 --epochs 2 --lr 1e-3 --buckets 96x128 --max_boxes 36 --max_points 16 --log_every 1 2>&1 | grep -v WARNING | tail -5 || exit 1

echo "=== STAGE 2 INFER + EVAL ==="
python -m countdetr_tpu.cli.main --stage 2 --dataset_file fscd_147 \
  --spatial_prior grid --num_query_position 25 --num_query_pattern 1 --no_aux_loss $TINY \
  --data_path /tmp/verify_data --output_dir /tmp/verify_out2 \
  --infer --checkpoint_path /tmp/verify_out2/checkpoints \
  --batch_size 3 --buckets 96x128 --max_boxes 36 --max_points 16 2>&1 | grep -v WARNING | tail -30 || exit 1

echo "=== OFFLINE EVALUATOR ==="
python -m countdetr_tpu.cli.main --stage 2 --dataset_file fscd_147 \
  --data_path /tmp/verify_data --output_dir /tmp/verify_out2 \
  --evaluate_predictions /tmp/verify_out2/predictions_test.json 2>&1 | grep -v WARNING | tail -20 || exit 1
echo "=== PIPELINE COMPLETE ==="
