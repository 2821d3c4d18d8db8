#!/usr/bin/env python
"""Does index ORDER change the ~22 ns/row random-gather latency floor?

VERDICT r4 directive #3: if sorted/near-contiguous gather indices are
substantially cheaper than random ones, the matcher/BA gathers can be
restructured as sort -> gather-in-order -> reduce -> inverse-permute-narrow
(the wide gathered row is reduced to a narrow result before un-permuting,
so the inverse permutation only moves ~8-16 B rows).

Protocol: R-delta (DEVELOPMENT.md quirk 5) — R=1 vs R=9 chains of the
gather+reduce op inside ONE jit, serialized via a data dependency that also
perturbs the *values* of the indices each rep (value-keyed result cache).
The table is an in-jit intermediate (layout-assignment realism), indices are
computed in-jit from an argument.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.utils.timing import device_sync

N = 196608          # queries  (= 512*384)
ROWS = 196608       # table rows
WIDTH = 300         # 1200 B fp32 rows (the refine window-row width class)


def build_chain(mode: str, reps: int):
    """One jit: build table in-jit, run `reps` gather+reduce ops chained by
    a data dependency that perturbs index values each rep."""

    def fn(tab_src, idx_src, salt):
        # table as an in-jit intermediate (not a jit argument) — matches the
        # production unfold build and avoids the 20x argument-layout cliff
        tab = tab_src * (1.0 + 1e-6 * salt)
        acc = jnp.float32(0.0)
        idx0 = idx_src
        for r in range(reps):
            # serialize + perturb values: depends on previous acc
            bump = (jnp.int32(acc) % 7) + r
            idx = (idx0 + bump) % ROWS
            if mode == "random":
                pass
            elif mode == "sorted":
                idx = jnp.sort(idx)
            elif mode == "sorted_unpermute":
                # the full production scheme: argsort, gather wide rows in
                # sorted order, reduce each row to a scalar, then inverse-
                # permute the narrow results back to query order
                perm = jnp.argsort(idx)
                idx_sorted = idx[perm]
                rows = jnp.take(tab, idx_sorted, axis=0)
                red = jnp.sum(rows, axis=-1)            # (N,) narrow
                out = jnp.zeros((N,), jnp.float32).at[perm].set(red)
                acc = acc + jnp.sum(out) * 1e-9
                continue
            elif mode == "iota":
                idx = (jnp.arange(N, dtype=jnp.int32) + bump) % ROWS
            elif mode == "near":
                # near-contiguous: iota + small jitter (what a sorted real
                # index stream looks like: monotone with local scatter)
                idx = jnp.clip(jnp.arange(N, dtype=jnp.int32)
                               + (idx0 % 31) - 15 + bump, 0, ROWS - 1)
            rows = jnp.take(tab, idx, axis=0)
            acc = acc + jnp.sum(rows) * 1e-9
        return acc

    return jax.jit(fn)


def time_chain(fn, args, n_timed=3):
    out = fn(*args(0))
    device_sync(out)
    ts = []
    for i in range(n_timed):
        a = args(i + 1)
        t0 = time.perf_counter()
        o = fn(*a)
        device_sync(o)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)
    tab_src = jax.random.normal(key, (ROWS, WIDTH), jnp.float32)
    idx_srcs = [jax.random.randint(jax.random.fold_in(key, 7 + i), (N,), 0,
                                   ROWS, jnp.int32) for i in range(8)]

    R_LO, R_HI = 1, 9
    print(f"rows={ROWS} width={WIDTH} ({WIDTH*4} B) queries={N}")
    for mode in ("random", "sorted", "near", "iota", "sorted_unpermute"):
        f_lo = build_chain(mode, R_LO)
        f_hi = build_chain(mode, R_HI)

        def mk(i):
            return (tab_src, idx_srcs[i % len(idx_srcs)],
                    jnp.float32(i * 13 + 1))

        t_lo = time_chain(f_lo, mk)
        t_hi = time_chain(f_hi, mk)
        per = (t_hi - t_lo) / (R_HI - R_LO) * 1000
        ns_row = per * 1e6 / N
        print(f"{mode:18s} R1={t_lo*1000:7.1f}ms R{R_HI}={t_hi*1000:7.1f}ms "
              f"-> {per:7.2f} ms/op  ({ns_row:5.1f} ns/row)")


if __name__ == "__main__":
    main()
