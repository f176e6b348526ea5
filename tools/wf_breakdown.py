"""Per-stage device-time breakdown of the wavefront tracer's level loop.

Times each building block in isolation by the same K-in-one-jit slope
method as tools/device_time.py: level kernel (spawn and leaf forms),
compaction sort, tile-wise pid duplication, and emission scatter-add,
at a given ray count and sphere count.

Usage: python tools/wf_breakdown.py [--rays 1048576] [--spheres 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(fn, args, k=4, iters=3):
    """Device seconds per call by the K-in-one-jit slope method.
    fn must accept (*args, salt) and return arrays; salt breaks CSE."""
    import jax
    import jax.numpy as jnp

    def rep(n):
        def body(*a):
            total = jnp.float32(0.0)
            for i in range(n):
                outs = fn(*a, jnp.float32(i) * 1e-30)
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
    ap.add_argument("--spheres", type=int, default=256)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytpu.kernels.trace_pallas import _scene_tables
    from raytpu.kernels.wavefront import (
        N_STATE, WF_BLOCK, _compact, _dup_tilewise, _scatter_emissions,
        _wf_level_call)
    from raytpu.scene import random_scene

    scene = random_scene(args.spheres, seed=args.seed)
    n = int(scene.spheres.pos.shape[0])
    n_lights = int(scene.lights.pos.shape[0])
    scene_tbl, lights_tbl, bg_tbl = _scene_tables(scene)

    r = args.rays
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, N_STATE + 1)
    state = tuple(jax.random.uniform(ks[i], (r,), jnp.float32, -1.0, 1.0)
                  for i in range(N_STATE))
    pid = jnp.arange(r, dtype=jnp.int32) % (r // 2)
    em = tuple(jax.random.uniform(ks[N_STATE], (r,), jnp.float32)
               for _ in range(3))
    acc = tuple(jnp.zeros((r,), jnp.float32) for _ in range(3))
    children = tuple(jnp.concatenate([s, s]) for s in state)
    pid2 = jnp.concatenate([pid, pid])
    interpret = jax.default_backend() != "tpu"

    out = {"rays": r, "spheres": n, "lights": n_lights}

    def level_spawn(scene_tbl, lights_tbl, bg_tbl, state, salt):
        st = (state[0] + salt,) + state[1:]
        em3, ch = _wf_level_call(scene_tbl, lights_tbl, bg_tbl, st,
                                 n, n_lights, True, interpret)
        return em3 + ch

    def level_leaf(scene_tbl, lights_tbl, bg_tbl, state, salt):
        st = (state[0] + salt,) + state[1:]
        em3, _ = _wf_level_call(scene_tbl, lights_tbl, bg_tbl, st,
                                n, n_lights, False, interpret)
        return em3

    def compact(children, pid2, salt):
        ch = (children[0] + salt,) + children[1:]
        st, np_, dr, nl = _compact(ch, pid2, r)
        return st + (np_.astype(jnp.float32), dr.astype(jnp.float32)[None],
                     nl.astype(jnp.float32)[None])

    def scatter(acc, em, pid, salt):
        e = (em[0] + salt,) + em[1:]
        return _scatter_emissions(acc, e, pid, r // 2, sorted_ids=True,
                                  n_live=jnp.int32(r))

    def scatter_eighth(acc, em, pid, salt):
        e = (em[0] + salt,) + em[1:]
        return _scatter_emissions(acc, e, pid, r // 2, sorted_ids=True,
                                  n_live=jnp.int32(r // 8))

    def scatter_window(acc, em, salt):
        from raytpu.kernels.wavefront import _scatter_window
        e = (em[0] + salt,) + em[1:]
        acc_np = tuple(a[:r // 2] for a in acc)
        return _scatter_window(acc_np, e, jnp.int32(0), r // 2)

    def dup(pid, salt):
        return (_dup_tilewise(pid, r // WF_BLOCK).astype(jnp.float32)
                + salt,)

    out["level_spawn_ms"] = round(slope_time(
        level_spawn, (scene_tbl, lights_tbl, bg_tbl, state)) * 1e3, 2)
    out["level_leaf_ms"] = round(slope_time(
        level_leaf, (scene_tbl, lights_tbl, bg_tbl, state)) * 1e3, 2)
    out["compact_2x_ms"] = round(slope_time(compact, (children, pid2))
                                 * 1e3, 2)
    out["scatter_ms"] = round(slope_time(scatter, (acc, em, pid)) * 1e3, 2)
    out["scatter_eighth_live_ms"] = round(
        slope_time(scatter_eighth, (acc, em, pid)) * 1e3, 2)
    out["scatter_window_ms"] = round(
        slope_time(scatter_window, (acc, em)) * 1e3, 2)
    out["dup_ms"] = round(slope_time(dup, (pid,)) * 1e3, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
