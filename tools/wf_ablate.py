"""Wavefront frame timing + per-level liveness probe (config 5).

Reports the warm frame time, the live-ray count per level after each
compaction (the capacity/scatter-policy driver), and solo slope timings
of each level op on the real first-chunk state.  CAVEAT discovered in
round 3: solo-benched op costs UNDERSTATE the same ops composed into one
program by ~2x (a standalone one-chunk program costs the same per chunk
as the full in-scan frame, tools/chunk_profile.py) — use the profiler
trace in chunk_profile.py for in-frame attribution, and these probes
only for liveness and relative comparisons.

Usage: python tools/wf_ablate.py [--width 1920 --height 1080 --max-depth 6
                                  --spheres 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--alias-factor", type=int, default=3)
    ap.add_argument("--spheres", type=int, default=256)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--chunk-rays", type=int, default=1 << 20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import raytpu.kernels.wavefront as wf
    from raytpu.config import RenderConfig
    from raytpu.scene import random_scene

    interpret = jax.default_backend() != "tpu"
    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.max_depth,
                       alias_factor=args.alias_factor)
    scene = random_scene(args.spheres, seed=args.seed)
    out = {"config": f"{args.width}x{args.height} d{args.max_depth} "
                     f"N{args.spheres}"}

    def frame():
        img = wf.render_pixels_wavefront(scene, cfg,
                                         chunk_rays=args.chunk_rays,
                                         interpret=interpret)
        return float(jnp.sum(img))

    def timed(name):
        frame()  # compile
        t0 = time.perf_counter()
        frame()
        out[name] = round(time.perf_counter() - t0, 2)

    timed("full_s")

    # (A monkeypatch-the-scatter-to-a-no-op ablation used to live here; it
    # reported a 0.0 s scatter share that a device profiler trace later
    # contradicted — the real instrument is tools/chunk_profile.py, which
    # names every op's device time inside one chunk.)

    # --- per-level liveness for the first chunk ---
    spp = cfg.samples_per_pixel
    total = cfg.num_pixels * spp
    chunk = wf._align_up(min(args.chunk_rays, total),
                         wf._lcm(wf.WF_BLOCK, spp))
    cap = wf._align_up(int(2 * chunk), wf.WF_BLOCK)
    scene_tbl, lights_tbl, bg_tbl = wf._scene_tables(scene)
    npix = cfg.num_pixels
    ids = jnp.arange(chunk, dtype=jnp.int32)
    pid = ids // spp
    sample = ids % spp
    si = sample // cfg.alias_factor
    sj = sample % cfg.alias_factor
    dx, dy, dz = wf._camera_dirs(cfg, pid, si, sj)
    zero = jnp.zeros_like(dx)
    one = jnp.ones_like(dx)
    state = (zero, zero, zero, dx, dy, dz, one, one, one, zero - 1.0)
    n = args.spheres
    n_lights = int(scene.lights.pos.shape[0])
    def slope(fn, args, k=3):
        def rep(m):
            def body(*a):
                tot = jnp.float32(0.0)
                for i in range(m):
                    outs = fn(*a, jnp.float32(i) * 1e-30)
                    tot = tot + sum(jnp.sum(o) for o in outs)
                return tot
            return jax.jit(body)

        f1, fk = rep(1), rep(k)
        float(f1(*args)), float(fk(*args))

        def best(f):
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                float(f(*args))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(fk) - best(f1)) / (k - 1)

    lv = []
    for level in range(cfg.max_depth):
        spawn_t = slope(
            lambda st0, salt: (lambda em, ch: em + ch)(
                *wf._wf_level_call(scene_tbl, lights_tbl, bg_tbl,
                                   (st0 + salt,) + state[1:], n, n_lights,
                                   True, interpret)),
            (state[0],))
        _, children = wf._wf_level_call(scene_tbl, lights_tbl, bg_tbl,
                                        state, n, n_lights, True, interpret)
        pid2 = wf._dup_tilewise(pid, state[0].shape[0] // wf.WF_BLOCK)
        keep = min(2 * state[0].shape[0], cap)
        sort_t = slope(
            lambda c0, salt: wf._compact((c0 + salt,) + children[1:],
                                         pid2, keep)[0],
            (children[0],))
        state, pid, ndrop, n_live = wf._compact(children, pid2, keep)
        lv.append({"level": level + 1, "rays": int(state[0].shape[0]),
                   "n_live": int(n_live), "dropped": int(ndrop),
                   "spawn_ms": round(spawn_t * 1e3, 1),
                   "compact_ms": round(sort_t * 1e3, 1)})
    leaf_t = slope(
        lambda st0, salt: wf._wf_level_call(
            scene_tbl, lights_tbl, bg_tbl, (st0 + salt,) + state[1:],
            n, n_lights, False, interpret)[0],
        (state[0],))
    lv.append({"level": cfg.max_depth, "leaf_ms": round(leaf_t * 1e3, 1)})
    out["first_chunk_levels"] = lv
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
