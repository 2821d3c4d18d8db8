#!/usr/bin/env python
"""Real-geometry end-to-end rehearsal (VERDICT r4 directive #5).

The trained MASt3R weights are unreachable (zero egress), so the e2e FPS
headline consumes oracle geometry and accuracy proxies are synthetic. This
script removes the remaining untested seam — REAL network geometry flowing
through the full released-checkpoint -> CLI -> SLAM -> ATE pipeline — by
TRAINING a small real MASt3R architecture on the oracle scene:

  1. render a textured image sequence of the synthetic scene
     (models.oracle.render_rgb — colors are functions of world points, so
     views are photo-consistent);
  2. distill the oracle's ground-truth two-view outputs (pointmaps,
     descriptors, confidences) into a small-but-REAL MASt3R (ViT encoder +
     dual decoder + DPT/CatMLP heads) with optax AdamW;
  3. save the trained weights in the RELEASED checkpoint format
     (convert.save_released_checkpoint) and write the rendered frames as an
     RGB-dir dataset + TUM ground truth;
  4. run the production CLI (main.py --checkpoint ... --no-viz) on it —
     the SLAM consumes the NETWORK's predictions, no oracle anywhere;
  5. report trajectory ATE vs ground truth + FPS.

Everything the real TUM eval will exercise — checkpoint parsing, model
build from the args string, inference, matching, tracking, keyframing, BA,
export, evaluation — runs with real (learned) geometry. Only the weights'
provenance differs.

Usage:
  python scripts/distill_oracle.py --steps 1200 --out .rehearsal
  python scripts/distill_oracle.py --quick        # tiny smoke (CPU ok)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def make_traj(n_frames, step_scale=1.0):
    import jax.numpy as jnp

    from mast3r_slam_tpu.lie import sim3

    Ts = [sim3.identity()]
    for i in range(1, n_frames):
        xi = jnp.asarray([0.03, 0.01 * np.sin(i / 5.0), 0.008,
                          0.0, 0.012, 0.002, 0.0]) * step_scale
        Ts.append(sim3.mul(Ts[-1], sim3.exp(xi)))
    return jnp.stack(Ts)


def build(args):
    import jax
    import jax.numpy as jnp

    from mast3r_slam_tpu.models import MASt3RConfig, init_params, oracle

    h, w = (64, 96) if args.quick else (args.height, args.width)
    cfg = MASt3RConfig(
        img_size=(h, w), enc_depth=2 if args.quick else 4,
        enc_embed_dim=64 if args.quick else 128,
        enc_num_heads=4, dec_depth=2 if args.quick else 4,
        dec_embed_dim=48 if args.quick else 96, dec_num_heads=4,
        desc_dim=8 if args.quick else 16,
        feature_dim=32, last_dim=16, layer_dims=(16, 16, 16, 48),
        dtype="float32", head_dtype="float32")
    traj = make_traj(args.frames, args.step_scale)
    oparams = oracle.make_params(traj, desc_dim=cfg.desc_dim,
                                 desc_freq=args.desc_freq)
    params = init_params(jax.random.PRNGKey(args.seed), cfg)
    return cfg, traj, oparams, params


def train(args, cfg, traj, oparams, params):
    import jax
    import jax.numpy as jnp
    import optax

    from mast3r_slam_tpu.models import mast3r, oracle

    n = args.frames
    h, w = cfg.img_size

    # pre-render + pre-normalize all frames once (device-resident)
    imgs = jnp.stack([oracle.render_rgb(oparams, i, cfg)
                      for i in range(n)])
    imgs_n = (imgs - 0.5) / 0.5

    # oracle targets for a pair come from its decode (ground-truth geometry
    # in view-i's frame + the shared descriptor field)
    feats = [oracle.encode_fid(oparams, jnp.arange(n), cfg)]
    ofeat, opos = feats[0]

    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.02)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-4))
    opt_state = opt.init(params)

    def pair_targets(i, j):
        r1, r2 = oracle.decode_pair(
            oparams, jnp.take(ofeat, i, 0), jnp.take(opos, i, 0),
            jnp.take(ofeat, j, 0), jnp.take(opos, j, 0), cfg)
        return r1, r2

    def loss_fn(p, i, j):
        f, pos = mast3r.encode(p, jnp.take(imgs_n, jnp.concatenate([i, j]),
                                           0), cfg)
        b = i.shape[0]
        r1, r2 = mast3r.decode_pair(p, f[:b], pos[:b], f[b:], pos[b:], cfg)
        t1, t2 = pair_targets(i, j)

        def hub(x, d=0.1):
            a = jnp.abs(x)
            return jnp.mean(jnp.where(a < d, 0.5 * a * a / d, a - 0.5 * d))

        lx = hub(r1["pts3d"] - t1["pts3d"]) + hub(r2["pts3d"] - t2["pts3d"])
        ld = (jnp.mean((r1["desc"] - t1["desc"]) ** 2)
              + jnp.mean((r2["desc"] - t2["desc"]) ** 2))
        # confidences: push above the SLAM gates (C_conf=0, Q_conf=1.5)
        lc = (jnp.mean((r1["conf"] - 2.5) ** 2)
              + jnp.mean((r2["conf"] - 2.5) ** 2)
              + jnp.mean((r1["desc_conf"] - 3.0) ** 2)
              + jnp.mean((r2["desc_conf"] - 3.0) ** 2))
        return lx + 4.0 * ld + 0.05 * lc, (lx, ld)

    @jax.jit
    def step(p, s, key):
        k1, k2 = jax.random.split(key)
        i = jax.random.randint(k1, (args.batch,), 0, n)
        off = jax.random.randint(k2, (args.batch,), -4, 5)
        j = jnp.clip(i + off, 0, n - 1)
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, i, j)
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, l, aux

    key = jax.random.PRNGKey(7)
    t0 = time.time()
    for it in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss, aux = step(params, opt_state, k)
        if it % max(args.steps // 10, 1) == 0 or it == args.steps - 1:
            lx, ld = jax.device_get(aux)
            print(f"step {it:5d} loss {float(loss):.4f} "
                  f"(pts {float(lx):.4f} desc {float(ld):.4f}) "
                  f"[{time.time() - t0:.0f}s]", flush=True)
    return params


def write_dataset(args, cfg, traj, oparams, out: pathlib.Path):
    import PIL.Image

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.models import oracle

    rgb = out / "frames"
    rgb.mkdir(parents=True, exist_ok=True)
    for i in range(args.frames):
        img = np.asarray(oracle.render_rgb(oparams, i, cfg))
        PIL.Image.fromarray((img * 255).astype(np.uint8)).save(
            rgb / f"{i:04d}.png")
    # TUM-format ground truth: timestamp tx ty tz qx qy qz qw
    with open(out / "groundtruth.txt", "w") as f:
        for i in range(args.frames):
            T = np.asarray(sim3.to_se3(traj[i]))
            t, q = T[:3], T[3:7]
            # timestamp convention: the RGBFiles adapter stamps frame i at
            # i/30 s (io/datasets.py:196) and ate_rmse associates by
            # nearest timestamp
            f.write(f"{i / 30.0} {t[0]} {t[1]} {t[2]} "
                    f"{q[0]} {q[1]} {q[2]} {q[3]}\n")
    return rgb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--desc-freq", type=float, default=8.0)
    ap.add_argument("--step-scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=".rehearsal")
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke configuration (CI-sized)")
    ap.add_argument("--skip-slam", action="store_true",
                    help="train + export only (no CLI run)")
    args = ap.parse_args()
    if args.quick:
        args.steps = min(args.steps, 60)
        args.frames = min(args.frames, 10)

    from mast3r_slam_tpu.models import convert

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    cfg, traj, oparams, params = build(args)
    print(f"training {cfg.img_size} model on {args.frames} rendered frames "
          f"({args.steps} steps)...", flush=True)
    params = train(args, cfg, traj, oparams, params)

    ckpt = out / "distilled_released.pth"
    convert.save_released_checkpoint(params, cfg, ckpt)
    print(f"saved released-format checkpoint: {ckpt}")
    ds_dir = write_dataset(args, cfg, traj, oparams, out)
    print(f"wrote rendered dataset: {ds_dir}")

    if args.skip_slam:
        return

    # the production CLI, exactly as a real-data run would invoke it
    run_dir = "rehearsal"
    cmd = [sys.executable, str(REPO / "main.py"),
           "--dataset", str(ds_dir), "--config",
           str(REPO / "configs" / "base.yaml"), "--no-viz",
           "--checkpoint", str(ckpt), "--save-as", run_dir]
    print("running:", " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True)
    dt = time.time() - t0
    print(r.stdout[-2500:])
    if r.returncode != 0:
        print(r.stderr[-2500:])
        raise SystemExit("SLAM run failed")

    # ATE vs ground truth (the results_table evaluation path)
    sys.path.insert(0, str(REPO / "scripts"))
    import results_table

    traj_file = REPO / "logs" / run_dir / "frames.txt"
    m = results_table.evaluate(str(out / "groundtruth.txt"),
                               str(traj_file))
    m["fps"] = round(args.frames / dt, 3)
    m["wall_s"] = round(dt, 1)
    print(json.dumps({"rehearsal": m}))
    (out / "REHEARSAL.json").write_text(json.dumps(m, indent=1))


if __name__ == "__main__":
    main()
