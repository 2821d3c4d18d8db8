"""True multi-process jax.distributed bring-up + cross-process BA.

Everything else in the suite runs single-process on a virtual 8-device
mesh; this spawns TWO separate CPU processes (4 virtual devices each)
that rendezvous through mesh.init_distributed and run the edge-sharded
distributed GN over the global 8-device mesh — the actual multi-host
code path (SURVEY.md §5.8), with collectives crossing the process
boundary.
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from mast3r_slam_tpu.parallel import dist_ba, mesh as mesh_mod
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.slam import ba
import jax.numpy as jnp

assert mesh_mod.init_distributed() is True
assert jax.process_count() == 2
assert jax.device_count() == 8            # global devices across processes
assert len(jax.local_devices()) == 4

mesh = mesh_mod.make_mesh_2d(axes=("host", "edge"))
assert mesh.devices.shape == (2, 4)

# same deterministic problem in both processes
key = jax.random.PRNGKey(0)
n_kf, P = 5, 64
pts_w = jax.random.normal(key, (P, 3)) + jnp.array([0.0, 0.0, 4.0])
T_true = [sim3.identity()]
for i in range(1, n_kf):
    xi = 0.05 * jax.random.normal(jax.random.fold_in(key, i), (7,))
    T_true.append(sim3.mul(T_true[-1], sim3.exp(xi)))
T_true = jnp.stack(T_true)
Xs = jax.vmap(lambda T: sim3.act(sim3.inv(T), pts_w))(T_true)
Cs = jnp.full((n_kf, P), 5.0)
pairs = [(i, i + 1) for i in range(n_kf - 1)]
ii = jnp.array([p for a, b in pairs for p in (a, b)], jnp.int32)
jj = jnp.array([p for a, b in pairs for p in (b, a)], jnp.int32)
E = ii.shape[0]
idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (E, P))
valid = jnp.ones((E, P), bool)
Q = jnp.full((E, P), 4.0)
mask = jnp.ones((E,), jnp.float32)
noise = 0.03 * jax.random.normal(jax.random.fold_in(key, 9), (n_kf, 7))
noise = noise.at[0].set(0.0)
T_init = jax.vmap(sim3.retr)(T_true, noise)
cfg = ba.BAConfig(max_iters=5, point_chunk=64)

flat = mesh_mod.make_mesh(8)          # 1-D over all 8 global devices
pad = lambda a, fill=0: mesh_mod.pad_to_multiple(a, 8, 0, fill)
T_out = dist_ba.gauss_newton_rays_dist(
    T_init, Xs, Cs, pad(ii), pad(jj), pad(idx), pad(valid, False),
    pad(Q), pad(mask), jnp.asarray(n_kf), flat, cfg)

T_local = ba.gauss_newton_rays(T_init, Xs, Cs, ii, jj, idx, valid, Q,
                               mask, jnp.asarray(n_kf), cfg)
err = float(jnp.abs(jnp.asarray(T_out) - T_local).max())
assert err < 1e-4, err
print(f"proc {jax.process_index()} OK err={err:.2e}")
"""


def test_two_process_distributed_ba(tmp_path):
    repo = pathlib.Path(__file__).resolve().parent.parent
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   SLAM_COORDINATOR=f"127.0.0.1:{port}",
                   SLAM_NUM_PROCESSES="2",
                   SLAM_PROCESS_ID=str(pid),
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   JAX_PLATFORMS="cpu",
                   PYTHONPATH=f"{repo}:{os.environ.get('PYTHONPATH', '')}")
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "OK err=" in out
