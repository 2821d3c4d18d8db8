"""Per-sequence results harness: runs the SLAM on every sequence of a
benchmark family and emits the results table the reference's eval scripts
imply (ATE RMSE, RPE, FPS, keyframes, loop closures per sequence).

Mirrors /root/reference/scripts/eval_{tum,euroc,7_scenes,eth3d}.sh (which
run main.py headless + single-thread, then evo_ape per sequence) but
produces one machine-readable table. Ground truth comes from the dataset
itself (TUM: groundtruth.txt) or the vendored `groundtruths/` directory
(EuRoC, 7-Scenes — byte-identical to the reference's).

Usage:
  python scripts/results_table.py --family tum --dataset-root datasets/tum \
      --checkpoint checkpoints/MASt3R_....pth [--mode no-calib] \
      [--sequences seq1,seq2] [--out RESULTS.md]

Sequences whose dataset directory is missing are reported as `missing`
(this environment has no datasets; the harness is exercised end-to-end by
tests/test_results_table.py on a synthetic RGB-dir sequence).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]

FAMILIES = {
    "tum": {
        "sequences": [
            "rgbd_dataset_freiburg1_360", "rgbd_dataset_freiburg1_desk",
            "rgbd_dataset_freiburg1_desk2", "rgbd_dataset_freiburg1_floor",
            "rgbd_dataset_freiburg1_plant", "rgbd_dataset_freiburg1_room",
            "rgbd_dataset_freiburg1_rpy", "rgbd_dataset_freiburg1_teddy",
            "rgbd_dataset_freiburg1_xyz",
        ],
        "gt": lambda root, seq: pathlib.Path(root) / seq / "groundtruth.txt",
        "config": {"calib": "configs/eval_calib.yaml",
                   "no-calib": "configs/eval_no_calib.yaml"},
    },
    "euroc": {
        "sequences": [
            "MH_01_easy", "MH_02_easy", "MH_03_medium", "MH_04_difficult",
            "MH_05_difficult", "V1_01_easy", "V1_02_medium",
            "V1_03_difficult", "V2_01_easy", "V2_02_medium",
            "V2_03_difficult",
        ],
        "gt": lambda root, seq: REPO / "groundtruths/euroc" / f"{seq}.txt",
        "config": {"calib": "configs/eval_calib.yaml",
                   "no-calib": "configs/eval_no_calib.yaml"},
    },
    "7-scenes": {
        "sequences": ["chess", "fire", "heads", "office", "pumpkin",
                      "redkitchen", "stairs"],
        "gt": lambda root, seq: REPO / "groundtruths/7-scenes" / f"{seq}.txt",
        "config": {"calib": "configs/eval_calib.yaml",
                   "no-calib": "configs/eval_no_calib.yaml"},
    },
    "eth3d": {
        # long sequences used by the reference's eval_eth3d.sh
        "sequences": ["cables_1", "camera_shake_1", "ceiling_1",
                      "desk_3", "einstein_1", "mannequin_face_1",
                      "planar_2", "plant_scene_1", "sfm_lab_room_1",
                      "table_3"],
        "gt": lambda root, seq: pathlib.Path(root) / seq / "groundtruth.txt",
        "config": {"calib": "configs/eth3d.yaml"},
    },
}


def run_sequence(dataset_dir, config, checkpoint, save_as, extra_args=()):
    """Run main.py on one sequence; returns (traj_file, run_stats dict)."""
    seq = pathlib.Path(dataset_dir).stem
    metrics_file = REPO / "logs" / save_as / f"{seq}.metrics.jsonl"
    if metrics_file.exists():
        metrics_file.unlink()
    cmd = [sys.executable, str(REPO / "main.py"),
           "--dataset", str(dataset_dir), "--config", str(config),
           "--no-viz", "--save-as", save_as,
           "--metrics", str(metrics_file)]
    if checkpoint:
        cmd += ["--checkpoint", str(checkpoint)]
    cmd += list(extra_args)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f"run failed for {dataset_dir}:\n{proc.stdout[-2000:]}"
            f"\n{proc.stderr[-2000:]}")
    stats = {"wall_s": round(wall, 1)}
    m = re.search(r"done: (\d+) frames in ([0-9.]+)s = ([0-9.]+) FPS",
                  proc.stdout)
    if m:
        stats.update(frames=int(m.group(1)), fps=float(m.group(3)))
    m = re.search(r"stats: (\{.*\})", proc.stdout)
    if m:
        try:
            stats.update(eval(m.group(1), {"__builtins__": {}}))  # noqa
        except Exception:
            pass
    traj = REPO / "logs" / save_as / f"{seq}.txt"
    return traj, stats


def evaluate(gt_file, traj_file, rpe_delta=1):
    from mast3r_slam_tpu.eval import ate

    res = ate.ate_rmse(gt_file, traj_file, max_diff=0.1)
    row = {"ate_rmse": res["rmse"], "n_pairs": res["n_pairs"]}
    try:
        r = ate.rpe(gt_file, traj_file, delta=rpe_delta, max_diff=0.1)
        row["rpe_trans"] = r["trans_rmse"]
        row["rpe_rot_deg"] = r["rot_rmse_deg"]
    except Exception:
        pass
    return row


def fmt_table(rows):
    head = ("| sequence | ATE RMSE (m) | RPE trans | RPE rot (deg) | FPS | "
            "keyframes | loop closures | status |")
    sep = "|---|---|---|---|---|---|---|---|"
    out = [head, sep]
    for r in rows:
        f = lambda k, p="%.4f": (p % r[k]) if k in r else "-"
        out.append(
            f"| {r['seq']} | {f('ate_rmse')} | {f('rpe_trans')} | "
            f"{f('rpe_rot_deg', '%.3f')} | {f('fps', '%.2f')} | "
            f"{r.get('keyframes', '-')} | {r.get('loop_closures', '-')} | "
            f"{r.get('status', 'ok')} |")
    return "\n".join(out)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=sorted(FAMILIES), required=True)
    ap.add_argument("--dataset-root", required=True)
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--mode", default="calib")
    ap.add_argument("--sequences", default="",
                    help="comma-separated override of the sequence list")
    ap.add_argument("--config", default="",
                    help="config override (else the family's eval preset)")
    ap.add_argument("--gt", default="",
                    help="ground-truth file override (single sequence)")
    ap.add_argument("--rpe-delta", type=int, default=1,
                    help="RPE pose-pair separation in associated KEYFRAME "
                         "steps (not seconds/meters; see eval/ate.rpe)")
    ap.add_argument("--out", default="")
    ap.add_argument("--extra-args", default="",
                    help="extra main.py args, space-separated")
    args = ap.parse_args(argv)

    fam = FAMILIES[args.family]
    seqs = (args.sequences.split(",") if args.sequences
            else fam["sequences"])
    config = args.config or fam["config"].get(args.mode)
    if config is None:
        ap.error(f"family {args.family} has no {args.mode} mode")
    save_as = f"eval_{args.family}_{args.mode}"

    rows = []
    for seq in seqs:
        ds = pathlib.Path(args.dataset_root) / seq
        row = {"seq": seq}
        if not ds.exists():
            row["status"] = "missing"
            rows.append(row)
            print(f"{seq}: dataset missing, skipped", flush=True)
            continue
        try:
            traj, stats = run_sequence(
                ds, config, args.checkpoint, save_as,
                args.extra_args.split() if args.extra_args else ())
            row.update(stats)
            gt = pathlib.Path(args.gt) if args.gt else fam["gt"](
                args.dataset_root, seq)
            if gt.exists():
                row.update(evaluate(gt, traj, args.rpe_delta))
            else:
                row["status"] = "no-gt"
        except Exception as e:  # keep going; report the failure in-table
            row["status"] = f"error: {e}"[:60]
        rows.append(row)
        print(json.dumps(row), flush=True)

    table = fmt_table(rows)
    print(table)
    if args.out:
        p = pathlib.Path(args.out)
        stamp = time.strftime("%Y-%m-%d %H:%M")
        p.write_text(f"# Results — {args.family} ({args.mode}), {stamp}\n\n"
                     + table + "\n")
        print(f"wrote {p}")


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    main()
