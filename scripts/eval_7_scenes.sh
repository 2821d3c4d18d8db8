#!/bin/bash
set -e
DATASET_ROOT=${1:-datasets/7-scenes}
CKPT=${2:-checkpoints/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth}
seqs=(chess fire heads office pumpkin redkitchen stairs)
for seq in "${seqs[@]}"; do
  echo "=== $seq ==="
  python main.py --dataset "$DATASET_ROOT/$seq" \
      --config configs/eval_calib.yaml --checkpoint "$CKPT" --no-viz \
      --save-as eval_7scenes
  python -m mast3r_slam_tpu.eval.ate \
      "groundtruths/7-scenes/$seq.txt" "logs/eval_7scenes/$seq.txt"
done
