"""Golden-residual experiment: does GPU-compiler FMA contraction explain the
~2.1% of testPPM.ppm bytes the strict oracle misses?

Renders the golden frame with the native oracle under each FMA-contraction
mask (rt_oracle.cpp g_fma_mask bits: 1=dots, 2=radicands, 4=c-r^2,
8=fresnel-num, 16=point-madd) and reports the byte-exact fraction vs the
reference's own GPU render.  The winning mask (or the absence of one) is the
evidence BASELINE.md's residual paragraph cites.

Usage: python tools/fma_study.py [--masks 0,1,2,3,...] [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from raytpu.config import RenderConfig
from raytpu.image import max_colour_value, read_ppm, tone_map
from raytpu.native import render_native, set_fma_mask
from raytpu.scene import default_scene

GOLDEN = "/root/reference/raytracer_gamma/testPPM.ppm"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--masks", default=",".join(str(m) for m in range(32)))
    ap.add_argument("--cap", type=int, default=5)
    args = ap.parse_args()

    golden = read_ppm(GOLDEN).astype(int)
    cfg = RenderConfig()  # the reference workload: 800x600, alias 3
    scene = default_scene(bg_opacity=0.0)

    results = []
    for mask in [int(m) for m in args.masks.split(",")]:
        set_fma_mask(mask)
        t0 = time.time()
        img = render_native(scene, cfg, cap=args.cap, fresnel_double=False)
        ours = tone_map(img).astype(int)
        err = np.abs(ours - golden)
        by_pix = err.max(axis=-1)
        exact = float((by_pix == 0).mean())
        results.append((mask, exact, float(err.mean())))
        print(f"mask {mask:2d}: byte-exact {exact:.4f}  mae {err.mean():.4f}"
              f"  frac>1 {(by_pix > 1).mean():.4f}"
              f"  maxv {max_colour_value(img):.8g}  ({time.time()-t0:.0f}s)")
    set_fma_mask(0)

    best = max(results, key=lambda r: r[1])
    base = next(r for r in results if r[0] == 0)
    print(f"\nbaseline mask 0: {base[1]:.4f} byte-exact")
    print(f"best: mask {best[0]} at {best[1]:.4f} byte-exact "
          f"({(best[1]-base[1])*100:+.2f} pp)")


if __name__ == "__main__":
    main()
