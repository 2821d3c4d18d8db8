#!/usr/bin/env python
"""mast3r_slam_tpu driver: dense SLAM over a monocular stream.

CLI mirrors the reference (/root/reference/main.py:156-161):
    python main.py --dataset <path> --config configs/base.yaml \
        [--save-as NAME] [--no-viz] [--calib intrinsics.yaml] \
        [--checkpoint model.pth] [--max-frames N]

Without --checkpoint the model runs with random weights (useful only for
smoke/perf runs; trajectories need the released MASt3R checkpoint).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="datasets/tum/rgbd_dataset_freiburg1_desk")
    parser.add_argument("--config", default="configs/base.yaml")
    parser.add_argument("--save-as", default="default")
    parser.add_argument("--no-viz", action="store_true")
    parser.add_argument("--calib", default="")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--retrieval-checkpoint", default="")
    parser.add_argument("--codebook", default="")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--random-retrieval", action="store_true",
                        help="use a random-init retriever (smoke runs only)")
    parser.add_argument("--profile-dir", default="",
                        help="capture a jax.profiler trace to this directory")
    parser.add_argument("--serve-viz", type=int, default=None, metavar="PORT",
                        help="serve a LIVE WebGL reconstruction viewer on "
                             "this port during the run (pause/step UI; "
                             "0 picks a free port)")
    parser.add_argument("--serve-viz-host", default="127.0.0.1",
                        help="live viewer bind address (0.0.0.0 to expose "
                             "beyond localhost)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ba-backend", default="",
                        choices=["", "dense", "edge_sharded", "schur"],
                        help="override parallel.ba_backend: distribute "
                             "global BA over all visible devices")
    parser.add_argument("--coordinator", default="",
                        help="multi-host: jax.distributed coordinator "
                             "address host:port (or SLAM_COORDINATOR)")
    parser.add_argument("--num-hosts", type=int, default=None,
                        help="multi-host: total process count "
                             "(or SLAM_NUM_PROCESSES)")
    parser.add_argument("--host-id", type=int, default=None,
                        help="multi-host: this process's rank "
                             "(or SLAM_PROCESS_ID)")
    parser.add_argument("--metrics", default="",
                        help="write per-frame/per-solve metrics JSONL here")
    parser.add_argument("--save-state", default="",
                        help="checkpoint full SLAM runtime state (npz) here "
                             "at the end of the run")
    parser.add_argument("--save-state-every", type=int, default=0,
                        help="also checkpoint to --save-state every N "
                             "processed frames (crash recovery)")
    parser.add_argument("--resume", default="",
                        help="restore SLAM runtime state from a --save-state "
                             "npz before processing frames")
    parser.add_argument("--estimate-calib", action="store_true",
                        help="estimate the focal length from the first "
                             "frame's mono pointmap and run the calibrated "
                             "pipeline (unknown-camera video, e.g. MP4)")
    args = parser.parse_args(argv)

    import jax

    # multi-host bring-up must precede any device query (SURVEY.md §5.8);
    # no-op for single-process runs. Reject partially-specified flag sets:
    # a missing --num-hosts would otherwise silently run every process as
    # an independent single-host SLAM.
    import os as _os

    n_hosts = args.num_hosts
    if n_hosts is None and "SLAM_NUM_PROCESSES" in _os.environ:
        n_hosts = int(_os.environ["SLAM_NUM_PROCESSES"])
    partial_flags = (args.coordinator or args.host_id is not None)
    if partial_flags and (n_hosts is None or n_hosts <= 1):
        parser.error("--coordinator/--host-id require --num-hosts >= 2 "
                     "(or SLAM_NUM_PROCESSES)")
    if (n_hosts or 1) > 1 and not (args.coordinator
                                   or _os.environ.get("SLAM_COORDINATOR")):
        parser.error("--num-hosts > 1 requires --coordinator host:port "
                     "(or SLAM_COORDINATOR)")
    from mast3r_slam_tpu.parallel import mesh as dist_mesh_mod

    if dist_mesh_mod.init_distributed(args.coordinator or None,
                                      args.num_hosts, args.host_id):
        print(f"jax.distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} devices")

    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.io import datasets, export
    from mast3r_slam_tpu.models import MASt3RConfig, convert, init_params
    from mast3r_slam_tpu.slam import retrieval as retrieval_mod
    from mast3r_slam_tpu.slam.system import SLAMSystem

    cfg = config_mod.load_config(args.config)
    if args.ba_backend:
        cfg = dict(cfg)
        cfg["parallel"] = dict(cfg.get("parallel", {}),
                               ba_backend=args.ba_backend)
    print(f"dataset: {args.dataset}")

    use_calib = bool(cfg.get("use_calib", False))
    dataset = datasets.load_dataset(
        args.dataset, use_calib=use_calib,
        center_principle_point=bool(cfg["dataset"]["center_principle_point"]))
    dataset.subsample(int(cfg["dataset"]["subsample"]))

    if args.calib:
        import yaml

        with open(args.calib) as f:
            intr = yaml.safe_load(f)
        cfg = dict(cfg)
        cfg["use_calib"] = True
        use_calib = True
        dataset.use_calibration = True
        dataset.camera_intrinsics = datasets.Intrinsics.from_calib(
            dataset.img_size, intr["width"], intr["height"],
            intr["calibration"])

    (h, w), _ = dataset.get_img_shape()
    print(f"frame size: {h}x{w}")

    rt = cfg.get("runtime", {})
    if args.checkpoint:
        # derive the architecture from the checkpoint's instantiation
        # string (the reference's from_pretrained semantics, mast3r/
        # model.py:21-37); bare state dicts fall back to the ViT-L default
        print(f"loading checkpoint {args.checkpoint}")
        model_cfg, params = convert.load_released_checkpoint(
            args.checkpoint, img_size=(h, w),
            dtype=rt.get("model_dtype", "bfloat16"),
            head_dtype=rt.get("head_dtype", "float32"))
    else:
        model_cfg = MASt3RConfig(
            img_size=(h, w),
            dtype=rt.get("model_dtype", "bfloat16"),
            head_dtype=rt.get("head_dtype", "float32"))
        print("WARNING: no checkpoint; random weights (smoke/perf mode)")
        params = init_params(jax.random.PRNGKey(args.seed), model_cfg)

    if args.retrieval_checkpoint:
        rparams = retrieval_mod.convert_retrieval_checkpoint(
            args.retrieval_checkpoint, args.codebook or None)
    elif args.random_retrieval:
        # smoke/pipeline-exercise mode only: a random retriever produces
        # spurious loop-closure candidates
        rparams = retrieval_mod.init_retrieval_params(
            jax.random.PRNGKey(args.seed + 1),
            backbone_dim=model_cfg.enc_embed_dim)
    else:
        rparams = None   # retrieval/loop closure disabled

    K = None
    if use_calib:
        if not dataset.has_calib():
            print("[Warning] No calibration provided for this dataset!")
            sys.exit(0)
        import jax.numpy as jnp

        K = jnp.asarray(dataset.camera_intrinsics.K_frame, dtype=jnp.float32)
    elif args.estimate_calib:
        # unknown camera: estimate the focal from the first frame's mono
        # pointmap (Weiszfeld IRLS, geometry.estimate_focal), then run the
        # calibrated pipeline with the estimated pinhole model
        import jax.numpy as jnp

        from mast3r_slam_tpu import geometry
        from mast3r_slam_tpu.io.image import resize_img
        from mast3r_slam_tpu.models import mast3r as mast3r_mod

        _, img0 = dataset[0]
        img = jnp.asarray(resize_img(img0, dataset.img_size)["img"])[None]
        feat, pos = mast3r_mod.encode(params, img, model_cfg)
        X, C = mast3r_mod.inference_mono(params, feat, pos, model_cfg)
        f = float(geometry.estimate_focal(X[0], (h, w), conf=C[0, :, 0]))
        if f > 0.1 * max(h, w):
            K = jnp.asarray([[f, 0.0, w / 2.0], [0.0, f, h / 2.0],
                             [0.0, 0.0, 1.0]], jnp.float32)
            cfg = dict(cfg)
            cfg["use_calib"] = True
            use_calib = True
            print(f"estimated focal: {f:.2f} px (frame size {h}x{w})")
        else:
            print(f"estimated focal {f:.2f} px is implausible; staying in "
                  "the uncalibrated (ray-residual) pipeline")

    mesh = None
    ba_backend = cfg.get("parallel", {}).get("ba_backend", "dense")
    if ba_backend != "dense":
        if jax.device_count() > 1:
            from mast3r_slam_tpu.parallel import mesh as mesh_mod

            mesh = mesh_mod.make_mesh(jax.device_count())
            print(f"global BA: {ba_backend} over {mesh.size} devices")
        else:
            print(f"global BA: {ba_backend} requested but only one device "
                  "visible; using the dense solver")

    metrics = None
    if args.metrics:
        from mast3r_slam_tpu.utils.metrics import Metrics

        metrics = Metrics(args.metrics)

    system = SLAMSystem(params, model_cfg, cfg, (h, w),
                        retrieval_params=rparams, K=K, metrics=metrics,
                        mesh=mesh)
    start_frame = 0
    if args.resume:
        from mast3r_slam_tpu.slam import checkpoint

        checkpoint.load_state(args.resume, system)
        start_frame = system.resume_frame
        print(f"resumed SLAM state from {args.resume} "
              f"({len(system.keyframes)} keyframes, "
              f"{system.factor_graph.n_edges} edges, "
              f"next frame {start_frame})")

    viewer = None
    if args.serve_viz is not None:
        from mast3r_slam_tpu.viz_server import LiveViewer

        viewer = LiveViewer(port=args.serve_viz,
                            host=args.serve_viz_host).start()
        print(f"live viewer: http://localhost:{viewer.port}/")

    run_kwargs = dict(max_frames=args.max_frames, progress=True,
                      start_frame=start_frame,
                      checkpoint_path=args.save_state or None,
                      checkpoint_every=args.save_state_every, viewer=viewer)
    t0 = time.time()
    try:
        if args.profile_dir:
            from mast3r_slam_tpu.utils.timing import ProfilerTrace

            with ProfilerTrace(args.profile_dir):
                stats = system.run(dataset, **run_kwargs)
        else:
            stats = system.run(dataset, **run_kwargs)
    finally:
        if viewer is not None:
            viewer.stop()
    elapsed = time.time() - t0
    n = len(dataset) if args.max_frames is None else min(args.max_frames,
                                                         len(dataset))
    print(f"done: {n} frames in {elapsed:.1f}s = {n / elapsed:.2f} FPS")
    print(f"stats: {stats}")

    if args.save_state:
        from mast3r_slam_tpu.slam import checkpoint

        checkpoint.save_state(args.save_state, system)
        print(f"saved SLAM state to {args.save_state}")

    if dataset.save_results:
        save_dir = pathlib.Path("logs")
        if args.save_as != "default":
            save_dir = save_dir / args.save_as
        seq_name = pathlib.Path(args.dataset).stem
        export.save_traj(save_dir, f"{seq_name}.txt", dataset.timestamps,
                         system.keyframes)
        export.save_reconstruction(save_dir, f"{seq_name}.ply",
                                   system.keyframes, 1.5)
        export.save_keyframes(save_dir / "keyframes" / seq_name,
                              dataset.timestamps, system.keyframes)
        if not args.no_viz:
            # headless stand-in for the reference's GL viewer: offline
            # renders of the trajectory / reconstruction / keyframes
            from mast3r_slam_tpu import viz

            viz.plot_trajectory(system.keyframes,
                                save_dir / f"{seq_name}_traj.png")
            viz.render_pointcloud(system.keyframes,
                                  save_dir / f"{seq_name}_cloud.png",
                                  factor_graph=system.factor_graph)
            viz.keyframe_mosaic(system.keyframes,
                                save_dir / f"{seq_name}_keyframes.png")
            viz.export_html_viewer(system.keyframes,
                                   save_dir / f"{seq_name}_viewer.html",
                                   factor_graph=system.factor_graph)
        print(f"saved results under {save_dir}")


if __name__ == "__main__":
    main()
