#!/usr/bin/env bash
# Fetch benchmark datasets and MASt3R checkpoints.
#
#   scripts/download.sh checkpoints            # MASt3R + retrieval weights
#   scripts/download.sh tum [euroc eth3d 7scenes ...]
#   scripts/download.sh all
#
# Dataset URL sets match the reference evaluation protocol
# (reference scripts/download_{tum,euroc,eth3d,7_scenes}.sh and README.md:60-65).
# Checkpoints are NAVER's — see their CHECKPOINTS_NOTICE for licensing.
# main.py converts the torch checkpoint to JAX params at load time:
#   python main.py --dataset datasets/tum/rgbd_dataset_freiburg1_desk \
#       --config configs/eval_no_calib.yaml \
#       --checkpoint checkpoints/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth
set -euo pipefail
cd "$(dirname "$0")/.."

fetch() { # fetch <url> <dest-dir>
    mkdir -p "$2"
    local f="$2/$(basename "$1")"
    if [ -s "$f" ]; then echo "have $f"; else wget -c "$1" -O "$f"; fi
    echo "$f"
}

checkpoints() {
    local base=https://download.europe.naverlabs.com/ComputerVision/MASt3R
    for name in MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth \
                MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric_retrieval_trainingfree.pth \
                MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric_retrieval_codebook.pkl; do
        fetch "$base/$name" checkpoints >/dev/null
    done
}

tum() {
    local base=https://cvg.cit.tum.de/rgbd/dataset/freiburg1
    for seq in 360 floor desk desk2 room plant teddy xyz rpy; do
        local f; f=$(fetch "$base/rgbd_dataset_freiburg1_$seq.tgz" datasets/tum)
        tar -xzf "$f" -C datasets/tum
    done
}

euroc() {
    local base=http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset
    local seqs=(vicon_room1/V1_01_easy vicon_room1/V1_02_medium
        vicon_room1/V1_03_difficult vicon_room2/V2_01_easy
        vicon_room2/V2_02_medium vicon_room2/V2_03_difficult
        machine_hall/MH_01_easy machine_hall/MH_02_easy
        machine_hall/MH_03_medium machine_hall/MH_04_difficult
        machine_hall/MH_05_difficult)
    for s in "${seqs[@]}"; do
        local name; name=$(basename "$s")
        local f; f=$(fetch "$base/$s/$name.zip" datasets/euroc)
        unzip -n -q "$f" -d "datasets/euroc/$name"
    done
}

eth3d() {
    local seqs=(cables_1 cables_2 cables_3 camera_shake_1 camera_shake_2
        camera_shake_3 ceiling_1 ceiling_2 desk_3 desk_changing_1 einstein_1
        einstein_2 einstein_dark einstein_flashlight
        einstein_global_light_changes_1 einstein_global_light_changes_2
        einstein_global_light_changes_3 kidnap_1 kidnap_dark large_loop_1
        mannequin_1 mannequin_3 mannequin_4 mannequin_5 mannequin_7
        mannequin_face_1 mannequin_face_2 mannequin_face_3 mannequin_head
        motion_1 planar_2 planar_3 plant_1 plant_2 plant_3 plant_4 plant_5
        plant_dark plant_scene_1 plant_scene_2 plant_scene_3 reflective_1
        repetitive sfm_bench sfm_garden sfm_house_loop sfm_lab_room_1
        sfm_lab_room_2 sofa_1 sofa_2 sofa_3 sofa_4 sofa_dark_1 sofa_dark_2
        sofa_dark_3 sofa_shake table_3 table_4 table_7 vicon_light_1
        vicon_light_2)
    for s in "${seqs[@]}"; do
        local f
        f=$(fetch "https://www.eth3d.net/data/slam/datasets/${s}_mono.zip" \
            datasets/eth3d/train)
        unzip -n -q "$f" -d datasets/eth3d/train
    done
}

scenes7() {
    local base=http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8
    for s in chess fire heads office pumpkin redkitchen stairs; do
        local f; f=$(fetch "$base/$s.zip" datasets/7-scenes)
        unzip -n -q "$f" -d datasets/7-scenes
        unzip -n -q "datasets/7-scenes/$s/seq-01.zip" -d "datasets/7-scenes/$s"
    done
}

[ $# -ge 1 ] || { sed -n '2,9p' "$0"; exit 1; }
for arg in "$@"; do
    case "$arg" in
        checkpoints) checkpoints ;;
        tum) tum ;;
        euroc) euroc ;;
        eth3d) eth3d ;;
        7scenes|7-scenes) scenes7 ;;
        all) checkpoints; tum; euroc; eth3d; scenes7 ;;
        *) echo "unknown target: $arg" >&2; exit 1 ;;
    esac
done
