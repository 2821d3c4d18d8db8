#!/bin/bash
# TUM fr1 evaluation (mirrors /root/reference/scripts/eval_tum.sh: headless,
# single-thread deterministic config, subsample 2, Sim3-aligned ATE RMSE).
# Usage: scripts/eval_tum.sh <dataset_root> <checkpoint.pth> [no-calib]
set -e
DATASET_ROOT=${1:-datasets/tum}
CKPT=${2:-checkpoints/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth}
MODE=${3:-calib}
CFG=configs/eval_calib.yaml
[ "$MODE" = "no-calib" ] && CFG=configs/eval_no_calib.yaml

seqs=(rgbd_dataset_freiburg1_360 rgbd_dataset_freiburg1_desk
      rgbd_dataset_freiburg1_desk2 rgbd_dataset_freiburg1_floor
      rgbd_dataset_freiburg1_plant rgbd_dataset_freiburg1_room
      rgbd_dataset_freiburg1_rpy rgbd_dataset_freiburg1_teddy
      rgbd_dataset_freiburg1_xyz)

for seq in "${seqs[@]}"; do
  echo "=== $seq ==="
  python main.py --dataset "$DATASET_ROOT/$seq" --config "$CFG" \
      --checkpoint "$CKPT" --no-viz --save-as "eval_tum_$MODE"
  python -m mast3r_slam_tpu.eval.ate \
      "$DATASET_ROOT/$seq/groundtruth.txt" \
      "logs/eval_tum_$MODE/$seq.txt"
done
