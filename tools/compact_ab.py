"""Config-5 d6 A/B: global co-sort vs block-local compaction
(compact_mode="blocked", _compact_blocked).  One JSON line per point.

Usage: python tools/compact_ab.py [--points 131072:0.875 131072:1.0]
"""
import argparse, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytpu.config import RenderConfig
from raytpu.kernels.wavefront import render_pixels_wavefront
from raytpu.scene import random_scene

ap = argparse.ArgumentParser()
ap.add_argument("--points", nargs="+", default=["131072:0.875"])
ap.add_argument("--seed", type=int, default=3)
args = ap.parse_args()

cfg = RenderConfig(width=1920, height=1080, max_depth=6, alias_factor=3)
scene = random_scene(256, seed=args.seed)

for pt in args.points:
    ch_s, cap_s = pt.split(":")
    chunk, capf = int(ch_s), float(cap_s)
    for mode in ("global", "blocked"):
        def fn():
            img, info = render_pixels_wavefront(
                scene, cfg, chunk_rays=chunk, capacity_factor=capf,
                compact_mode=mode, return_info=True)
            return float(jnp.sum(img)), int(info["dropped"])
        t0 = time.perf_counter()
        s, dropped = fn()   # compile
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            s, dropped = fn()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"mode": mode, "chunk": chunk, "cap": capf,
                          "frame_s": round(min(ts), 3),
                          "dropped": dropped, "sum": s,
                          "compile_s": round(compile_s, 1)}), flush=True)
