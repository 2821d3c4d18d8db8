#!/usr/bin/env python
"""Real-data preflight: ONE command that takes the framework from
"zero egress, no weights" to "per-sequence ATE table" the moment network
access and/or data appear (VERDICT round-2 directive #7).

Steps (each skips cleanly if its prerequisite is absent, so the script is
safe to run — and useful — in the current zero-egress environment):

  1. egress probe      — can we resolve/reach the checkpoint host?
  2. download          — scripts/download.sh checkpoints [+ --datasets ...]
  3. checkpoint load   — convert.load_released_checkpoint on the released
                         .pth (spec: /root/reference/mast3r/model.py:21-37
                         from_pretrained; the converter parses the args
                         string exactly like the reference's eval(args)).
  4. smoke run         — 10-frame headless SLAM on the first available
                         sequence with the real weights (main.py --no-viz).
  5. results table     — scripts/results_table.py per-sequence ATE/RPE/FPS
                         (protocol: /root/reference/scripts/eval_tum.sh:35-50).

Usage:
  python scripts/preflight.py                         # checkpoints + tum
  python scripts/preflight.py --datasets tum euroc    # more families
  python scripts/preflight.py --skip-download         # data already there

Exit code 0 = every step that COULD run succeeded; the report says which
steps were skipped and why. Exit 1 = a runnable step failed.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import socket
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
CKPT_DIR = REPO / "checkpoints"
CKPT = CKPT_DIR / "MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth"
RETR = CKPT_DIR / ("MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric"
                   "_retrieval_trainingfree.pth")
CODEBOOK = CKPT_DIR / ("MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric"
                       "_retrieval_codebook.pkl")

FIRST_SEQ = {
    "tum": "rgbd_dataset_freiburg1_xyz",
    "euroc": "V1_01_easy",
    "7-scenes": "chess",
    "eth3d": "sofa_1",
}


def log(msg):
    print(f"[preflight] {msg}", flush=True)


def probe_egress(host="download.europe.naverlabs.com", timeout=5.0):
    try:
        socket.getaddrinfo(host, 443)
        with socket.create_connection((host, 443), timeout=timeout):
            return True
    except OSError as e:
        log(f"egress probe failed ({e}) — offline mode")
        return False


def run(cmd, **kw):
    log("$ " + " ".join(str(c) for c in cmd))
    return subprocess.run([str(c) for c in cmd], cwd=REPO, **kw)


def step_download(families, have_egress, report):
    if not have_egress:
        report["download"] = "skipped: no egress"
        return
    targets = ["checkpoints"] + families
    for t in targets:
        r = run(["bash", "scripts/download.sh", t])
        if r.returncode != 0:
            report["download"] = f"FAILED at {t} (rc={r.returncode})"
            raise SystemExit(1)
    report["download"] = f"ok: {' '.join(targets)}"


def step_load_checkpoint(report):
    if not CKPT.is_file():
        report["checkpoint_load"] = f"skipped: {CKPT.name} not present"
        return False
    t0 = time.time()
    from mast3r_slam_tpu.models import convert

    params, cfg = convert.load_released_checkpoint(CKPT,
                                                   img_size=(384, 512))
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    report["checkpoint_load"] = (f"ok: {n / 1e6:.1f}M params, "
                                 f"cfg={cfg.enc_depth}x{cfg.enc_embed_dim}"
                                 f"/{cfg.dec_depth}x{cfg.dec_embed_dim}, "
                                 f"{time.time() - t0:.1f}s")
    return True


def find_sequence(families):
    for fam in families:
        root = REPO / "datasets" / fam
        seq = root / FIRST_SEQ.get(fam, "")
        if seq.is_dir():
            return fam, seq
        if root.is_dir():
            subdirs = sorted(p for p in root.iterdir() if p.is_dir())
            if subdirs:
                return fam, subdirs[0]
    return None, None


def step_smoke(families, have_ckpt, report):
    fam, seq = find_sequence(families)
    if seq is None:
        report["smoke_run"] = "skipped: no dataset sequences on disk"
        return
    if not have_ckpt:
        report["smoke_run"] = "skipped: no checkpoint (dataset present)"
        return
    cfg = "configs/eval_no_calib.yaml"
    cmd = [sys.executable, "main.py", "--dataset", seq, "--config", cfg,
           "--no-viz", "--max-frames", "10", "--checkpoint", CKPT,
           "--save-as", "preflight_smoke"]
    if RETR.is_file() and CODEBOOK.is_file():
        cmd += ["--retrieval-checkpoint", RETR, "--codebook", CODEBOOK]
    else:
        cmd += ["--random-retrieval"]
    r = run(cmd)
    if r.returncode != 0:
        report["smoke_run"] = f"FAILED (rc={r.returncode})"
        raise SystemExit(1)
    report["smoke_run"] = f"ok: 10 frames of {fam}/{seq.name}"


def step_results(families, have_ckpt, report):
    fam, seq = find_sequence(families)
    if seq is None or not have_ckpt:
        report["results_table"] = "skipped: needs checkpoint + datasets"
        return
    for fam in families:
        root = REPO / "datasets" / fam
        if not root.is_dir():
            continue
        out = REPO / f"RESULTS_{fam}.md"
        cmd = [sys.executable, "scripts/results_table.py", "--family", fam,
               "--dataset-root", root, "--checkpoint", CKPT, "--out", out]
        if RETR.is_file() and CODEBOOK.is_file():
            # results_table.py has no retrieval flags of its own; forward
            # through its --extra-args passthrough to main.py (ADVICE r3)
            cmd += ["--extra-args",
                    f"--retrieval-checkpoint {RETR} --codebook {CODEBOOK}"]
        r = run(cmd)
        key = f"results_table[{fam}]"
        if r.returncode != 0:
            report[key] = f"FAILED (rc={r.returncode})"
            raise SystemExit(1)
        report[key] = f"ok -> {out.name}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="*", default=["tum"],
                    choices=list(FIRST_SEQ), help="dataset families")
    ap.add_argument("--skip-download", action="store_true")
    args = ap.parse_args()

    report = {}
    try:
        have_egress = False if args.skip_download else probe_egress()
        report["egress"] = "yes" if have_egress else "no"
        if not args.skip_download:
            step_download(args.datasets, have_egress, report)
        have_ckpt = step_load_checkpoint(report)
        step_smoke(args.datasets, have_ckpt, report)
        step_results(args.datasets, have_ckpt, report)
    finally:
        log("report:")
        print(json.dumps(report, indent=2))
    ran = [v for v in report.values() if not str(v).startswith("skipped")]
    log(f"{len(ran)} step(s) ran, "
        f"{len(report) - len(ran)} skipped (prerequisites absent)")


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    main()
