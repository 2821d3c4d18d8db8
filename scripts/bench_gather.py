#!/usr/bin/env python
"""Gather cost model on the live chip: time jnp.take of n rows as a function
of row width and dtype. Informs the matcher design (DEVELOPMENT.md)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.utils.timing import device_sync


def timeit(name, fn, inputs, reps=4):
    out = fn(*inputs[0])
    device_sync(out)
    t0 = time.perf_counter()
    outs = [fn(*inputs[(i + 1) % len(inputs)]) for i in range(reps)]
    for o in outs:
        device_sync(o)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    n = 196608          # queries
    rows = 196608       # table rows

    for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        for width in (8, 18, 32, 64, 128, 168, 256, 336, 512):
            tabs = [jax.random.normal(jax.random.fold_in(key, i),
                                      (rows, width), dt) for i in range(3)]
            idxs = [jax.random.randint(jax.random.fold_in(key, 10 + i),
                                       (n,), 0, rows) for i in range(3)]
            f = jax.jit(lambda t, i: jnp.sum(
                jnp.take(t, i, axis=0).astype(jnp.float32), axis=-1))
            ins = [(t, i) for t, i in zip(tabs, idxs)]
            d = timeit(f"take {dt_name} width={width}", f, ins)

    # one wide gather vs k narrow gathers (window-row pattern)
    width = 24
    k = 7
    tab = jax.random.normal(key, (rows, k * width), jnp.bfloat16)
    idxs = [jax.random.randint(jax.random.fold_in(key, 30 + i),
                               (n,), 0, rows - k) for i in range(3)]

    def k_gathers(t, i):
        acc = 0.0
        for j in range(k):
            acc = acc + jnp.sum(
                jnp.take(t, i + j, axis=0).astype(jnp.float32), axis=-1)
        return acc

    timeit(f"{k} gathers of {k * width} bf16", jax.jit(k_gathers),
           [(tab, i) for i in idxs])

    # gather via one-hot matmul (MXU instead of gather unit)
    nb = 49152  # smaller n for the matmul variant (n x rows is huge)
    tabs = [jax.random.normal(jax.random.fold_in(key, i), (8192, 128),
                              jnp.bfloat16) for i in range(3)]
    idxs = [jax.random.randint(jax.random.fold_in(key, 40 + i), (nb,), 0,
                               8192) for i in range(3)]

    def onehot_mm(t, i):
        oh = jax.nn.one_hot(i, t.shape[0], dtype=jnp.bfloat16)
        return jnp.einsum("nr,rc->nc", oh, t,
                          preferred_element_type=jnp.float32)

    timeit("one-hot matmul gather 49k x 8192 x 128", jax.jit(onehot_mm),
           [(t, i) for t, i in zip(tabs, idxs)])


if __name__ == "__main__":
    main()
