#!/bin/bash
set -e
DATASET_ROOT=${1:-datasets/eth3d}
CKPT=${2:-checkpoints/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth}
seqs=(cables_1 camera_shake_1 ceiling_1 desk_3 einstein_1 einstein_2
      mannequin_3 mannequin_4 motion_1 planar_2 plant_scene_1 sfm_lab_room_1
      sofa_1 table_3 table_7)
for seq in "${seqs[@]}"; do
  echo "=== $seq ==="
  python main.py --dataset "$DATASET_ROOT/$seq" --config configs/eth3d.yaml \
      --checkpoint "$CKPT" --no-viz --save-as eval_eth3d
  python -m mast3r_slam_tpu.eval.ate \
      "$DATASET_ROOT/$seq/groundtruth.txt" "logs/eval_eth3d/$seq.txt"
done
