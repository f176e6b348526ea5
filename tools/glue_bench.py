"""Microbench the wavefront glue alternatives on the real TPU.

The 1080p d6 profile shows the between-kernel glue dominating: five
16-operand `lax.sort`s at 91 ms each and ~20 uniform 37 ms fusions, vs
260 ms total in the level kernels.  This tool slope-times the candidate
replacements at the real shapes:

  * sort16: the current 16-operand co-sort (key + 14 state + pid);
  * sort2+gather: 2-operand (key, iota) sort, then one AoS row gather
    (rays, 16) + unstack — moves the state once through a wide gather
    instead of co-sorting every operand;
  * scatter3: three (rays,) scatter-adds into (npix,) accumulators
    (sorted and unsorted index variants);
  * segsum: sorted-pid alternative via jax.ops.segment_sum.

Usage: python tools/glue_bench.py [--rays 4194304] [--npix 2073600]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STATE = 14


def slope_time(fn, args, k=4, iters=3):
    import jax
    import jax.numpy as jnp

    def rep(n):
        def body(*a):
            total = jnp.float32(0.0)
            for i in range(n):
                salt = jnp.float32(i) * 1e-30
                outs = fn(*a, salt)
                total = total + sum(jnp.sum(o.astype(jnp.float32))
                                    for o in outs)
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
    ap.add_argument("--rays", type=int, default=1 << 22)
    ap.add_argument("--npix", type=int, default=1920 * 1080)
    ap.add_argument("--cap", type=int, default=1 << 21)
    ap.add_argument("--only", default="",
                    help="comma list: sort16,sort2gather,sort2,gather,"
                         "scatter,segsum,scatter_rgb (default all)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    want = lambda tag: only is None or tag in only

    import jax
    import jax.numpy as jnp
    import numpy as np

    r, cap, npix = args.rays, args.cap, args.npix
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 30, r, dtype=np.int32))
    state = tuple(jnp.asarray(rng.random(r, dtype=np.float32))
                  for _ in range(N_STATE))
    pid = jnp.asarray(rng.integers(0, npix, r, dtype=np.int32))
    em = tuple(jnp.asarray(rng.random(cap, dtype=np.float32))
               for _ in range(3))
    pid_sorted = jnp.sort(pid[:cap])
    pid_rand = pid[:cap]
    acc = tuple(jnp.zeros((npix,), jnp.float32) for _ in range(3))
    out = {}

    def sort16(key, pid, *rest):
        salt, state = rest[-1], rest[:-1]
        state = (state[0] + salt,) + state[1:]  # break CSE via a float operand
        o = jax.lax.sort((key,) + state + (pid,), num_keys=1,
                         is_stable=False)
        return tuple(x[:cap] for x in o[1:])

    if want("sort16"):
        out["sort16_ms"] = slope_time(sort16, (key, pid) + state) * 1e3

    def sort2gather(key, pid, *rest):
        salt, state = rest[-1], rest[:-1]
        state = (state[0] + salt,) + state[1:]
        iota = jax.lax.iota(jnp.int32, r)
        k2, perm = jax.lax.sort(
            (key.astype(jnp.float32) + salt, iota), num_keys=1,
            is_stable=False)
        perm = perm[:cap]
        aos = jnp.stack(state + (pid.view(jnp.float32),), axis=1)
        picked = jnp.take(aos, perm, axis=0)
        outs = tuple(picked[:, i] for i in range(N_STATE))
        return outs + (picked[:, N_STATE].view(jnp.int32),)

    if want("sort2gather"):
        out["sort2gather_ms"] = slope_time(
            sort2gather, (key, pid) + state) * 1e3

    def sort2_only(key, salt):
        iota = jax.lax.iota(jnp.int32, r)
        return jax.lax.sort((key.astype(jnp.float32) + salt, iota),
                            num_keys=1, is_stable=False)

    if want("sort2"):
        out["sort2_ms"] = slope_time(sort2_only, (key,)) * 1e3

    def gather_only(pid, salt, *state):
        state = (state[0] + salt,) + state[1:]
        aos = jnp.stack(state + (pid.view(jnp.float32),), axis=1)
        picked = jnp.take(aos, pid[:cap], axis=0, mode="clip")
        return (picked,)

    if want("gather"):
        out["aos_gather_ms"] = slope_time(
            lambda pid, *rest: gather_only(pid, rest[-1], *rest[:-1]),
            (pid,) + state) * 1e3

    def scatter3(pidv, a0, a1, a2, e0, e1, e2, sorted_ids, salt):
        accs = (a0 + salt, a1, a2)
        return tuple(
            a.at[pidv].add(e, indices_are_sorted=sorted_ids)
            for a, e in zip(accs, (e0, e1, e2)))

    if want("scatter"):
        for tag, pv, flag in (("scatter3_sorted", pid_sorted, True),
                              ("scatter3_unsorted", pid_rand, False)):
            fn = lambda pv, a0, a1, a2, e0, e1, e2, salt, _f=flag: scatter3(
                pv, a0, a1, a2, e0, e1, e2, _f, salt)
            out[tag + "_ms"] = slope_time(fn, (pv,) + acc + em) * 1e3

    def scatter_rgb(pidv, accv, e0, e1, e2, salt):
        ev = jnp.stack((e0 + salt, e1, e2), axis=1)
        return (accv.at[pidv].add(ev, indices_are_sorted=True),)

    if want("scatter_rgb"):
        acc2 = jnp.zeros((npix, 3), jnp.float32)
        out["scatter_rgb_sorted_ms"] = slope_time(
            scatter_rgb, (pid_sorted, acc2) + em) * 1e3

    def seg3(pidv, a0, a1, a2, e0, e1, e2, salt):
        accs = (a0 + salt, a1, a2)
        es = (e0 + salt, e1, e2)
        return tuple(
            a + jax.ops.segment_sum(e, pidv, num_segments=npix,
                                    indices_are_sorted=True)
            for a, e in zip(accs, es))

    if want("segsum"):
        out["segsum3_sorted_ms"] = slope_time(
            seg3, (pid_sorted,) + acc + em) * 1e3

    out = {k: round(v, 2) for k, v in out.items()}
    out.update(rays=r, cap=cap, npix=npix)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
