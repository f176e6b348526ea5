"""Config-5 wavefront (chunk, capacity) frontier probe on real TPU.

For each (chunk_rays, capacity_factor) point: compile, render one warm
config-5 frame (1920x1080 d6 N256 alias3), report wall seconds and the
dropped-ray counter.  The zero-drop point with the best time is what
bench.py should ship.  Round-4 context: pixel-major STRIDED chunks give
every chunk frame-average liveness, so the frontier should sit at a
lower capacity than the contiguous pixel-major order (which needed 2.0)
and the round-3 sample-major order (512K x 1.5).

Usage: python tools/wf_frontier.py --points 524288:1.25 524288:1.5 ...
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
    ap.add_argument("--points", nargs="+",
                    default=["524288:1.25", "524288:1.5", "262144:1.25",
                             "262144:1.5"])
    ap.add_argument("--ad", action="store_true",
                    help="probe the AD (train-step) path instead")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--num-lights", type=int, default=None,
                    help="override the scene's light count (bench_all's "
                         "config-5 scene uses 4 with the default seed)")
    ap.add_argument("--compact", default="auto",
                    choices=["auto", "global", "blocked"],
                    help="compaction mode (round 5: auto resolves to "
                         "blocked for forward probes; blocked's zero-drop "
                         "frontier sits one capacity notch above global's "
                         "— seam fillers)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytpu.config import RenderConfig
    from raytpu.kernels.wavefront import render_pixels_wavefront
    from raytpu.scene import random_scene

    cfg = RenderConfig(width=1920, height=1080, max_depth=6,
                       alias_factor=3)
    kw = {} if args.num_lights is None else dict(num_lights=args.num_lights)
    scene = random_scene(256, seed=args.seed, **kw)
    results = []
    for pt in args.points:
        ch_s, cap_s = pt.split(":")
        chunk, cap = int(ch_s), float(cap_s)

        def fn():
            img, info = render_pixels_wavefront(
                scene, cfg, chunk_rays=chunk, capacity_factor=cap,
                compact_mode=args.compact, return_info=True)
            return float(jnp.sum(img)), int(info["dropped"])

        t0 = time.perf_counter()
        chks, _ = fn()  # compile
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        chks, dropped = fn()
        dt = time.perf_counter() - t0
        rec = {"chunk": chunk, "cap": cap, "s": round(dt, 2),
               "dropped": dropped, "compile_s": round(t_compile, 1),
               "checksum": chks}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    best = min((r for r in results if r["dropped"] == 0),
               key=lambda r: r["s"], default=None)
    print(json.dumps({"best_zero_drop": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
