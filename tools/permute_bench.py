"""Microbenchmarks for the wavefront compaction primitives (ROADMAP item 1).

The wavefront tracer needs, between bounce levels, a *monotone* permutation
(dead-child compaction: alive rays keep their relative order) applied to
~10-15 flat f32/int32 ray-state fields, plus a scatter-add of emissions into
the pixel accumulator.  Round 2 measured the naive 1-D `jnp.take` at
~0.6 GB/s — unusable.  This tool measures the candidate replacements on the
real TPU with the same slope method as tools/device_time.py (K ops in one
jit, input perturbed per iteration; dispatch floor cancels in t(K)-t(1)):

  * lax.sort co-sort: 1 int32 key + P payload operands (compaction IS a
    stable sort by the dead flag), for P in {2, 5, 10, 15};
  * flat per-field jnp.take (the known-bad baseline);
  * row/col gathers of packed (R, 16) / (16, R) state;
  * scatter-add of 3 emission channels at quasi-sorted pixel ids;
  * cumsum (compaction position arithmetic);
  * a Mosaic lowering probe: (1, 1024) -> (8, 128) in-kernel reshape, the
    layout step a banded one-hot-matmul gather kernel would need.

Usage: python tools/permute_bench.py [--r 4194304] [--k 5]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_ms(make_fn, x, k=5, iters=3):
    """Device ms per op by the slope method: make_fn(i) must return a jitted
    callable applying the op once to a perturbed input; we chain k of them
    inside one jit."""
    import jax
    import jax.numpy as jnp

    def repeat(n):
        @jax.jit
        def f(x):
            total = jnp.float32(0.0)
            for i in range(n):
                total = total + make_fn(x, i)
            return total
        return f

    f1, fk = repeat(1), repeat(k)
    float(f1(x))
    float(fk(x))

    def best(f):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fk) - best(f1)) / (k - 1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    r = args.r
    emit = lambda **kw: print(json.dumps(dict(r=r, **kw)), flush=True)

    # --- Mosaic reshape probe (compile-only; pass/fail is the datum) ---
    if not args.skip_probe and jax.default_backend() == "tpu":
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def probe_kernel(x_ref, o_ref):
            row = x_ref[0, :].reshape(1, 1024)      # (1, 1024)
            o_ref[:] = row.reshape(8, 128) * 2.0    # the lowering question

        try:
            x = jnp.ones((4, 1024), jnp.float32)
            out = pl.pallas_call(
                probe_kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(x)
            ok = bool(jnp.all(out == 2.0))
            emit(op="mosaic_reshape_1x1024_to_8x128", ok=ok)
        except Exception as e:  # noqa: BLE001 - the failure IS the result
            emit(op="mosaic_reshape_1x1024_to_8x128", ok=False,
                 error=type(e).__name__, detail=str(e)[:200])

        # Lane-flatten inverse at grid scale: (8,128) block -> (1,1024).
        def probe2_kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:].reshape(1, 1024) * 2.0

        try:
            x = jnp.ones((8, 128), jnp.float32)
            out = pl.pallas_call(
                probe2_kernel,
                out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
            )(x)
            emit(op="mosaic_reshape_8x128_to_1x1024",
                 ok=bool(jnp.all(out == 2.0)))
        except Exception as e:  # noqa: BLE001
            emit(op="mosaic_reshape_8x128_to_1x1024", ok=False,
                 error=type(e).__name__, detail=str(e)[:200])

    key = jax.random.PRNGKey(0)
    fields = jax.random.normal(key, (16, r), jnp.float32)
    fields = jax.device_put(fields)
    # Realistic dead flags: ~50% dead, clustered a little.
    dead = (jax.random.uniform(jax.random.PRNGKey(1), (r,)) < 0.5)
    sortkey = (dead.astype(jnp.int32) << 28) | jnp.arange(r, dtype=jnp.int32)
    sortkey = jax.device_put(sortkey)
    # Monotone compaction permutation (for the take variants).
    perm = jnp.argsort(dead.astype(jnp.int32), stable=True)
    perm = jax.device_put(perm)
    # Quasi-sorted pixel ids (children repeat the parent tile's range).
    pid = jax.device_put(jnp.arange(r, dtype=jnp.int32) // 4)

    # --- co-sort, varying payload count ---
    for p in (2, 5, 10, 15):
        def co_sort(x, i, p=p):
            ops = [sortkey] + [x[j] + jnp.float32(i) * 1e-30
                               for j in range(p)]
            out = jax.lax.sort(tuple(ops), num_keys=1, is_stable=True)
            return sum(jnp.sum(o[:8]) for o in out[1:])
        emit(op=f"co_sort_key_plus_{p}", ms=round(
            slope_ms(co_sort, fields, k=args.k), 2))

    # --- flat takes (the baseline): 10 fields through one perm ---
    def take_flat10(x, i):
        tot = jnp.float32(0.0)
        for j in range(10):
            tot = tot + jnp.sum(jnp.take(x[j] + jnp.float32(i) * 1e-30,
                                         perm)[:8])
        return tot
    emit(op="take_flat_x10", ms=round(slope_ms(take_flat10, fields,
                                               k=args.k), 2))

    # --- packed 2-D gathers ---
    rows16 = jax.device_put(fields.T)  # (r, 16) packed rows

    def take_rows(x, i):
        out = jnp.take(x + jnp.float32(i) * 1e-30, perm, axis=0)
        return jnp.sum(out[:8])
    emit(op="take_rows_rx16", ms=round(slope_ms(take_rows, rows16,
                                                k=args.k), 2))

    def take_cols(x, i):
        out = jnp.take(x + jnp.float32(i) * 1e-30, perm, axis=1)
        return jnp.sum(out[:, :8])
    emit(op="take_cols_16xr", ms=round(slope_ms(take_cols, fields,
                                                k=args.k), 2))

    # --- scatter-add emissions (3 channels, quasi-sorted ids) ---
    npix = r // 4

    def scat3(x, i):
        tot = jnp.float32(0.0)
        for j in range(3):
            acc = jnp.zeros((npix,), jnp.float32)
            acc = acc.at[pid].add(x[j] + jnp.float32(i) * 1e-30)
            tot = tot + jnp.sum(acc[:8])
        return tot
    emit(op="scatter_add_x3", ms=round(slope_ms(scat3, fields, k=args.k), 2))

    # --- cumsum (compaction positions) ---
    def cum(x, i):
        return jnp.sum(jnp.cumsum(x[0] + jnp.float32(i) * 1e-30)[:8])
    emit(op="cumsum", ms=round(slope_ms(cum, fields, k=args.k), 2))

    return 0


if __name__ == "__main__":
    sys.exit(main())
