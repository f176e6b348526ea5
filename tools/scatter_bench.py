"""Micro-bench: cost model of the emission scatter-add on TPU.

The wavefront's per-level accumulation (`acc[pid] += em`, three 1-D
scatter-adds, sorted indices) measures ~27 ms per 1M rays on v5e
(tools/wf_breakdown.py) — more than the level kernel.  This tool maps the
scatter's cost drivers so a replacement can be designed against data:

  * element-count scaling (--rays)
  * duplicate density (--dup: average rays per distinct pixel)
  * unique_indices / indices_are_sorted flags
  * accumulator size (--npix)
  * a dense-add floor (the same bytes moved with no scatter at all)
  * cumsum (the building block of run pre-reduction)
  * a contiguous dynamic_update_slice add (the level-0 replacement:
    camera-ray pids are piecewise-consecutive)

Usage: python tools/scatter_bench.py [--rays 1048576] [--npix 2073600]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(make_fn, args, k=4, iters=3):
    import jax
    import jax.numpy as jnp

    def rep(n):
        def body(*a):
            total = jnp.float32(0.0)
            for i in range(n):
                outs = make_fn(*a, jnp.float32(i) * 1e-30)
                total = total + sum(jnp.sum(o) for o in outs)
            return total
        return jax.jit(body)

    f1, fk = rep(1), rep(k)
    float(f1(*args))
    float(fk(*args))

    def best(f):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fk) - best(f1)) / (k - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--npix", type=int, default=1920 * 1080)
    ap.add_argument("--dup", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    r, npix = args.rays, args.npix
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    pid = jnp.sort(jax.random.randint(ks[0], (r,), 0, npix // args.dup,
                                      jnp.int32) * args.dup)
    uniq = jnp.minimum(jnp.arange(r, dtype=jnp.int32) * jnp.int32(
        max(npix // r, 1)), npix - 1)
    em = tuple(jax.random.uniform(ks[1 + c], (r,), jnp.float32)
               for c in range(3))
    acc = tuple(jnp.zeros((npix,), jnp.float32) for _ in range(3))

    out = {"rays": r, "npix": npix, "dup": args.dup}

    def run(name, fn, a):
        out[name + "_ms"] = round(slope_time(fn, a) * 1e3, 2)

    def scat_sorted(acc, em, pid, salt):
        e = (em[0] + salt,) + em[1:]
        return tuple(a.at[pid].add(x, indices_are_sorted=True)
                     for a, x in zip(acc, e))

    def scat_plain(acc, em, pid, salt):
        e = (em[0] + salt,) + em[1:]
        return tuple(a.at[pid].add(x) for a, x in zip(acc, e))

    def scat_unique(acc, em, pid, salt):
        e = (em[0] + salt,) + em[1:]
        return tuple(a.at[pid].add(x, indices_are_sorted=True,
                                   unique_indices=True)
                     for a, x in zip(acc, e))

    def dense_add(acc, em, salt):
        e = (em[0] + salt,) + em[1:]
        return tuple(a.at[:r].add(x) for a, x in zip(acc, e))

    def cumsum3(em, salt):
        e = (em[0] + salt,) + em[1:]
        return tuple(jnp.cumsum(x) for x in e)

    def dus_add(acc, em, salt):
        # level-0 shape: contiguous window add at a traced offset
        e = (em[0] + salt,) + em[1:]
        start = jnp.int32(salt * 0).astype(jnp.int32)
        return tuple(
            jax.lax.dynamic_update_slice(
                a, jax.lax.dynamic_slice(a, (start,), (r,)) + x, (start,))
            for a, x in zip(acc, e))

    from raytpu.kernels.wavefront import _scatter_emissions

    # live-channel layouts: all live, and only the first quarter live
    # (dead tail, like a deep compacted level)
    live_all = em
    q = r // 4
    mask_q = (jnp.arange(r) < q).astype(jnp.float32)
    live_q = tuple(x * mask_q for x in em)

    def seg_cond(acc, em_, live, salt):
        # the shipped scatter (prefix-switch form): n_live derived from the
        # live mask's prefix length
        e = (em_[0] + salt,) + em_[1:]
        n_live = jnp.sum((live[0] != 0).astype(jnp.int32))
        return _scatter_emissions(acc, e, pid, npix, sorted_ids=True,
                                  n_live=n_live)

    def switch_prefix(acc, em_, n_alive, salt):
        # dead rays sorted to the tail with exactly-zero emissions: scatter
        # only a static prefix >= n_alive, chosen by lax.switch over 8
        # power-of-8ths lengths.
        e = (em_[0] + salt,) + em_[1:]
        segs = 8
        step = r // segs
        branch_idx = jnp.minimum((n_alive + step - 1) // step,
                                 segs).astype(jnp.int32)

        def mk(k):
            n = k * step
            if n == 0:
                return lambda a, e_: a
            return lambda a, e_: tuple(
                x.at[pid[:n]].add(y[:n], indices_are_sorted=True)
                for x, y in zip(a, e_))

        return jax.lax.switch(branch_idx, [mk(k) for k in range(segs + 1)],
                              acc, e)

    def scat_window3(acc3, em_, pid_, salt):
        # ONE scatter-add with a (3,)-channel window per index instead of
        # three scalar scatters: operand (3, npix), updates (3, r) — both
        # lane-dense layouts — shared sorted indices.  Tests whether the
        # ~3 ns/element cost is per scatter INDEX (then this is 3x fewer
        # billable elements) or per scalar (then it's neutral).
        e = (em_[0] + salt,) + em_[1:]
        upd = jnp.stack(e, axis=0)                  # (3, r)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(0,), inserted_window_dims=(1,),
            scatter_dims_to_operand_dims=(1,))
        return (jax.lax.scatter_add(acc3, pid_[:, None], upd, dn,
                                    indices_are_sorted=True),)

    acc3 = jnp.zeros((3, npix), jnp.float32)

    n_all = jnp.int32(r)
    n_q = jnp.int32(q)
    run("scat_window3", scat_window3, (acc3, em, pid))
    run("scat_sorted", scat_sorted, (acc, em, pid))
    run("scat_plain", scat_plain, (acc, em, pid))
    run("scat_unique_sorted", scat_unique, (acc, em, uniq))
    run("dense_add", dense_add, (acc, em))
    run("cumsum3", cumsum3, (em,))
    run("dus_add", dus_add, (acc, em))
    run("seg_cond_all_live", seg_cond, (acc, em, live_all))
    run("seg_cond_quarter_live", seg_cond, (acc, em, live_q))
    run("switch_prefix_all_live", switch_prefix, (acc, em, n_all))
    run("switch_prefix_quarter_live", switch_prefix, (acc, em, n_q))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
