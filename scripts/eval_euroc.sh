#!/bin/bash
# EuRoC evaluation (no-calib mode, groundtruth from state estimate CSVs).
set -e
DATASET_ROOT=${1:-datasets/euroc}
CKPT=${2:-checkpoints/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth}
seqs=(MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult
      V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium
      V2_03_difficult)
for seq in "${seqs[@]}"; do
  echo "=== $seq ==="
  python main.py --dataset "$DATASET_ROOT/$seq" \
      --config configs/eval_no_calib.yaml --checkpoint "$CKPT" --no-viz \
      --save-as eval_euroc
  python -m mast3r_slam_tpu.eval.ate \
      "groundtruths/euroc/$seq.txt" "logs/eval_euroc/$seq.txt"
done
