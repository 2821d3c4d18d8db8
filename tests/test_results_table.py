"""Results-harness (scripts/results_table.py) unit coverage: evaluation
plumbing and table emission, without the (dataset-dependent) SLAM runs."""

import importlib.util
import pathlib

import numpy as np

REPO = pathlib.Path(__file__).parents[1]

spec = importlib.util.spec_from_file_location(
    "results_table", REPO / "scripts/results_table.py")
rt = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rt)


def _write_traj(path, ts, pos):
    with open(path, "w") as f:
        for t, p in zip(ts, pos):
            f.write(f"{t} {p[0]} {p[1]} {p[2]} 0 0 0 1\n")


def test_evaluate_recovers_known_ate(tmp_path):
    rng = np.random.default_rng(0)
    n = 40
    ts = np.arange(n, dtype=float)
    gt = np.cumsum(rng.standard_normal((n, 3)) * 0.1, axis=0)
    est = 2.0 * gt + np.array([1.0, -2.0, 0.5])   # exact up to Sim3
    _write_traj(tmp_path / "gt.txt", ts, gt)
    _write_traj(tmp_path / "est.txt", ts, est)
    row = rt.evaluate(tmp_path / "gt.txt", tmp_path / "est.txt")
    assert row["ate_rmse"] < 1e-6
    assert row["n_pairs"] == n
    assert "rpe_trans" in row


def test_missing_dataset_rows_and_table(tmp_path, capsys):
    out = tmp_path / "RESULTS.md"
    rt.main(["--family", "tum", "--dataset-root", str(tmp_path / "nope"),
             "--sequences", "rgbd_dataset_freiburg1_desk",
             "--out", str(out)])
    txt = out.read_text()
    assert "rgbd_dataset_freiburg1_desk" in txt
    assert "missing" in txt
    assert txt.count("|") > 10   # header + row


def test_family_inventory_matches_reference_eval_scripts():
    """The sequence lists cover the reference's eval scripts
    (scripts/eval_tum.sh etc.)."""
    assert len(rt.FAMILIES["tum"]["sequences"]) == 9
    assert len(rt.FAMILIES["euroc"]["sequences"]) == 11
    # the reference vendors 10 of the 11 (MH_01_easy's gt is absent
    # upstream too); we ship the same set
    gt = rt.FAMILIES["euroc"]["gt"]("", "MH_02_easy")
    assert gt.exists(), "vendored euroc groundtruth missing"
    gt7 = rt.FAMILIES["7-scenes"]["gt"]("", "chess")
    assert gt7.exists(), "vendored 7-scenes groundtruth missing"
