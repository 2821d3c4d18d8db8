"""Robust-estimation weights and convergence checks (jit-safe).

Spec: /root/reference/mast3r_slam/nonlinear_optimizer.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber(r, k: float = 1.345):
    r_abs = jnp.abs(r)
    return jnp.where(r_abs < k, 1.0, k / jnp.maximum(r_abs, 1e-30))


def tukey(r, t: float = 4.6851):
    r_abs = jnp.abs(r)
    tmp = 1.0 - jnp.square(r_abs / t)
    return jnp.where(r_abs < t, tmp * tmp, 0.0)


def converged(rel_error_threshold, delta_norm_threshold, old_cost, new_cost,
              delta):
    """Traceable convergence test (spec: nonlinear_optimizer.py:5-25)."""
    safe_old = jnp.where(jnp.isfinite(old_cost) & (old_cost != 0), old_cost, 1.0)
    rel_dec = jnp.abs((old_cost - new_cost) / safe_old)
    rel_dec = jnp.where(jnp.isfinite(old_cost), rel_dec, jnp.inf)
    delta_norm = jnp.linalg.norm(delta)
    return (rel_dec < rel_error_threshold) | (delta_norm < delta_norm_threshold)
