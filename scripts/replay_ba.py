#!/usr/bin/env python
"""Replay a dumped global-BA solve (scripts/debug_e2e_skips.py --dump-ba)
on the CURRENT platform and compare against the recorded on-chip output.

Separates "the BA program computes the wrong thing on the chip" (replay on
CPU with identical inputs diverges from the recorded T_out) from "the BA
inputs were already poisoned" (CPU replay reproduces the same bad poses).

Usage:
  python scripts/replay_ba.py /tmp/ba_dump008.npz [--cpu] [--traj-frames N]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--kf-bucket-floor", type=int, default=8)
    ap.add_argument("--edge-bucket-floor", type=int, default=64)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        try:
            jax.extend.backend.clear_backends()
        except Exception:
            pass

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mast3r_slam_tpu import config as config_mod

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    d = np.load(args.dump)
    n_kf, E = int(d["n_kf"]), int(d["n_edges"])
    cfg = config_mod.load_config(REPO / "configs" / "tpu_fast.yaml")
    ba_cfg = config_mod.make_ba_config(cfg)

    def bucket(n, floor):
        b = floor
        while b < n:
            b *= 2
        return b

    Kb = bucket(n_kf, args.kf_bucket_floor)
    Eb = bucket(E, args.edge_bucket_floor)
    P = d["idx"].shape[1]

    def padE(a, fill=0):
        out = np.full((Eb,) + a.shape[1:], fill, a.dtype)
        out[:E] = a
        return out

    T_in = d["T_WC"][:Kb]
    Xk = np.zeros((Kb,) + d["X"].shape[1:], d["X"].dtype)
    Xk[:n_kf] = d["X"][:n_kf]
    Ck = np.zeros((Kb, P), d["Cavg"].dtype)
    Ck[:n_kf] = d["Cavg"][:n_kf]
    mask = np.zeros(Eb, np.float32)
    mask[:E] = 1.0

    from mast3r_slam_tpu.slam import ba

    T = ba.gauss_newton_rays(
        jnp.asarray(T_in), jnp.asarray(Xk), jnp.asarray(Ck),
        jnp.asarray(padE(d["ii"])), jnp.asarray(padE(d["jj"])),
        jnp.asarray(padE(d["idx"])), jnp.asarray(padE(d["vm"])),
        jnp.asarray(padE(d["Q"])), jnp.asarray(mask),
        jnp.asarray(n_kf), ba_cfg)
    T = np.asarray(T)

    T_rec = d["T_out"][:Kb]
    diff = np.abs(T[:n_kf] - T_rec[:n_kf])
    print(f"n_kf={n_kf} E={E} Kb={Kb} Eb={Eb}")
    print("replay-vs-recorded per-kf max |dT|:",
          np.round(diff.max(axis=1), 5).tolist())
    print(f"overall max diff {diff.max():.6f}")
    dt_in = np.abs(d["T_out"][:n_kf, :3] - d["T_WC"][:n_kf, :3])
    print("recorded solve's translation movement per kf:",
          np.round(np.linalg.norm(dt_in, axis=1), 4).tolist())
    mv = np.linalg.norm(T[:n_kf, :3] - d["T_WC"][:n_kf, :3], axis=1)
    print("replayed solve's translation movement per kf:",
          np.round(mv, 4).tolist())


if __name__ == "__main__":
    main()
