"""Probe: which dynamic-gather mechanisms does the remote Mosaic compiler
accept today? (Round-1 finding: tpu.dynamic_gather beyond one 8x128 vreg
and large scanned gathers crash it with HTTP 500 — DEVELOPMENT.md quirk 6.
VERDICT round-1 next-step #5 says re-attempt the Pallas matcher kernel when
this changes.)

Variants probed, each sized like the matcher's refine window rows:
  A. jnp.take of VMEM-resident rows inside a kernel (multi-vreg gather)
  B. per-row async DMA from an HBM ref at a dynamic index (fori_loop)
  C. take_along_axis on 2D equal-shape refs (the known-good single-vreg
     baseline from round 1)

Prints one line per variant: name, compile ok/fail, numeric match, and an
R-delta timing vs the XLA jnp.take baseline.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_pallas_gather.py
"""

import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 4096, 256          # table rows x row width (fp32: 2 vregs/row)
N = 1024                  # gathered rows


def baseline_xla(table, idx):
    return jnp.take(table, idx, axis=0)


def variant_a(table, idx):
    """VMEM table + jnp.take inside the kernel."""
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)


def variant_b(table, idx):
    """Table stays in HBM; one async DMA per gathered row."""
    def kernel(i_ref, t_hbm, o_ref):
        def inner(sem):
            def body(k, _):
                dma = pltpu.make_async_copy(
                    t_hbm.at[pl.ds(i_ref[k], 1), :],
                    o_ref.at[pl.ds(k, 1), :],
                    sem)
                dma.start()
                dma.wait()
                return 0
            jax.lax.fori_loop(0, N, body, 0)
        pl.run_scoped(inner, pltpu.SemaphoreType.DMA(()))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, table)


def variant_c(table, idx):
    """Known-good: take_along_axis with indices.shape == operand.shape
    restricted to one 128-lane vreg column block."""
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    idx2d = jnp.broadcast_to(idx[:, None], (N, 128)).astype(jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table[:N, :128], idx2d)


def time_fn(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    s = float(jnp.sum(out))  # sync through the relay
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    s += float(jnp.sum(out))
    return (time.time() - t0) / reps * 1e3, s


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (R, C), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, R,
                             jnp.int32)
    ref = np.asarray(baseline_xla(table, idx))

    t_base, _ = time_fn(jax.jit(baseline_xla), table, idx)
    print(f"xla_take: ok, {t_base:.2f} ms/call (incl. dispatch floor)",
          flush=True)

    for name, fn, check in [("A_vmem_take", variant_a, True),
                            ("B_dma_per_row", variant_b, True),
                            ("C_single_vreg_taa", variant_c, False)]:
        try:
            jfn = jax.jit(fn)
            out = jfn(table, idx)
            outv = np.asarray(out)
            msg = "ok"
            if check and not np.allclose(outv, ref):
                msg = "WRONG RESULT"
            t, _ = time_fn(jfn, table, idx)
            print(f"{name}: {msg}, {t:.2f} ms/call", flush=True)
        except Exception as e:
            tb = traceback.format_exc(limit=2)
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            if "--verbose" in sys.argv:
                print(tb, flush=True)


if __name__ == "__main__":
    main()
