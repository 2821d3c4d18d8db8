"""Dataset adapter unit tests over synthetic on-disk fixtures.

The reference has no tests for its dataloader; these lock down the
per-dataset parsing conventions (spec: dataloader.py:67-151), the
intrinsics 512-crop rescale (K_frame, :289-293), and load_dataset
autodetection (:320-338) without any real benchmark data.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mast3r_slam_tpu.io import datasets


def _png(path, h=48, w=64, gray=False):
    rng = np.random.default_rng(abs(hash(str(path))) % 2**32)
    img = rng.integers(0, 255, (h, w) if gray else (h, w, 3), np.uint8)
    cv2.imwrite(str(path), img)


def _make_tum(root, n=3):
    d = root / "tum" / "rgbd_dataset_freiburg1_test"
    (d / "rgb").mkdir(parents=True)
    lines = []
    for i in range(n):
        name = f"rgb/{1000.0 + 0.1 * i:.6f}.png"
        _png(d / name, 480 // 4, 640 // 4)  # small but 4:3
        lines.append(f"{1000.0 + 0.1 * i:.6f} {name}")
    (d / "rgb.txt").write_text("\n".join(lines) + "\n")
    return d


def test_tum_adapter_parses_and_calibrates(tmp_path):
    d = _make_tum(tmp_path)
    ds = datasets.load_dataset(str(d), use_calib=True)
    assert isinstance(ds, datasets.TUMDataset)
    assert len(ds) == 3
    assert ds.timestamps[0] == "1000.000000"
    # fr1 factory calibration applied
    assert ds.camera_intrinsics is not None
    np.testing.assert_allclose(ds.camera_intrinsics.K_orig[0, 0], 517.3)
    # distortion coefficients present for fr1
    assert np.any(ds.camera_intrinsics.distortion != 0)
    t, img = ds[1]
    assert img.dtype == np.float32 and img.max() <= 1.0
    # subsample keeps timestamps aligned with files
    ds.subsample(2)
    assert len(ds) == 2 and ds.timestamps[1] == "1000.200000"


def test_euroc_adapter_grayscale_and_always_undistort(tmp_path):
    d = tmp_path / "euroc" / "V1_01_easy"
    (d / "mav0/cam0/data").mkdir(parents=True)
    names = []
    for i in range(2):
        name = f"{100 + i}.png"
        _png(d / "mav0/cam0/data" / name, 48, 72, gray=True)
        names.append(f"{100 + i},{name}")
    (d / "mav0/cam0/data.csv").write_text("\n".join(names) + "\n")
    (d / "mav0/cam0/sensor.yaml").write_text(
        "resolution: [72, 48]\n"
        "intrinsics: [60.0, 60.0, 36.0, 24.0]\n"
        "distortion_coefficients: [-0.28, 0.07, 0.0002, 0.00002]\n")
    ds = datasets.load_dataset(str(d), use_calib=False)
    assert isinstance(ds, datasets.EurocDataset)
    # EuRoC always undistorts even in no-calib mode (dataloader.py:95-116)
    assert ds.camera_intrinsics is not None
    assert ds.use_calibration
    _, img = ds[0]
    assert img.shape == (48, 72, 3)   # grayscale promoted to RGB
    assert img.dtype == np.float32


def test_seven_scenes_natural_ordering(tmp_path):
    d = tmp_path / "7-scenes" / "chess"
    (d / "seq-01").mkdir(parents=True)
    for i in [0, 2, 10, 1]:       # lexicographic would put 10 before 2
        _png(d / "seq-01" / f"frame-{i}.color.png", 24, 32)
    ds = datasets.load_dataset(str(d), use_calib=True)
    assert isinstance(ds, datasets.SevenScenesDataset)
    order = [p.name for p in ds.rgb_files]
    assert order == ["frame-0.color.png", "frame-1.color.png",
                     "frame-2.color.png", "frame-10.color.png"]
    np.testing.assert_allclose(ds.camera_intrinsics.K_orig[0, 0], 585.0)


def test_eth3d_adapter_reads_calibration_file(tmp_path):
    d = tmp_path / "eth3d" / "train" / "sofa_1"
    (d / "rgb").mkdir(parents=True)
    lines = []
    for i in range(2):
        name = f"rgb/{i}.png"
        _png(d / name, 36, 48)
        lines.append(f"{i}.0 {name}")
    (d / "rgb.txt").write_text("\n".join(lines) + "\n")
    (d / "calibration.txt").write_text("40.0 40.0 24.0 18.0\n")
    ds = datasets.load_dataset(str(d), use_calib=True,
                               center_principle_point=False)
    assert isinstance(ds, datasets.ETH3DDataset)
    np.testing.assert_allclose(ds.camera_intrinsics.K_orig[0, 0], 40.0)


def test_rgb_dir_fallback(tmp_path):
    d = tmp_path / "some_frames"
    d.mkdir()
    for i in range(4):
        _png(d / f"{i:04d}.png", 24, 32)
    ds = datasets.load_dataset(str(d))
    assert isinstance(ds, datasets.RGBFiles)
    assert len(ds) == 4


def test_k_frame_rescale_roundtrip():
    """K_frame maps original-resolution intrinsics onto the 512-long-side
    crop: a pixel at the original principal point must land at the resized
    principal point (spec: dataloader.py:289-293)."""
    from mast3r_slam_tpu.io.image import resize_img

    W, H = 640, 480
    calib = [500.0, 510.0, 321.0, 243.5]
    intr = datasets.Intrinsics.from_calib(512, W, H, calib, use_calib=True,
                                          center_principle_point=False)
    img = np.zeros((H, W, 3), dtype=np.uint8)
    _, (scale_w, scale_h, half_w, half_h) = resize_img(
        img, 512, return_transformation=True)
    cx, cy = intr.K[0, 2], intr.K[1, 2]
    expect_u = cx / scale_w - half_w
    expect_v = cy / scale_h - half_h
    np.testing.assert_allclose(intr.K_frame[0, 2], expect_u)
    np.testing.assert_allclose(intr.K_frame[1, 2], expect_v)
    # focal scales by the resize factors
    np.testing.assert_allclose(intr.K_frame[0, 0], intr.K[0, 0] / scale_w)
    np.testing.assert_allclose(intr.K_frame[1, 1], intr.K[1, 1] / scale_h)


def test_packaged_configs_match_repo_configs():
    """The preset copies shipped inside the package (wheel/console-script
    path, config._resolve) must stay byte-identical to the repo-root
    configs/ the docs and eval scripts reference."""
    import pathlib

    import mast3r_slam_tpu

    pkg = pathlib.Path(mast3r_slam_tpu.__file__).parent / "configs"
    repo = pathlib.Path(mast3r_slam_tpu.__file__).parent.parent / "configs"
    repo_files = sorted(p.name for p in repo.glob("*.yaml"))
    pkg_files = sorted(p.name for p in pkg.glob("*.yaml"))
    assert repo_files == pkg_files and repo_files
    for name in repo_files:
        assert (pkg / name).read_bytes() == (repo / name).read_bytes(), name


def test_config_resolves_packaged_preset(tmp_path, monkeypatch):
    """load_config falls back to the packaged preset when the cwd-relative
    path is absent (installed console-script behavior)."""
    from mast3r_slam_tpu import config as config_mod

    monkeypatch.chdir(tmp_path)   # no configs/ here
    cfg = config_mod.load_config("configs/tpu_fast.yaml")
    assert int(cfg["runtime"]["tracking_window"]) == 8
    assert cfg["matching"]["max_iter"] == 0
