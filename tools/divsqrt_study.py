"""Golden-residual experiment, part 2: is the ~2.1% byte residual vs
testPPM.ppm explained by the author GPU's float division/sqrt precision?

The FMA half (tools/fma_study.py) ruled contraction out.  OpenCL on
pre-IEEE-strict consumer hardware only guarantees <= 2.5 ulp for '/' and
<= 3 ulp for sqrt, and the common lowerings are reciprocal-multiply and
rsqrt-multiply.  Two experiments against the reference's own GPU render:

1. CANDIDATE LOWERINGS: render with a/b -> a*(1/b) and/or
   sqrt(x) -> x*(1/sqrt(x)) at every hot-path site (rt_oracle.cpp
   g_approx_mask bits 0/1).  If one matches the author's GPU, byte
   exactness jumps.

2. SENSITIVITY OVERLAP: nudge every quotient/sqrt by exactly 1 ulp
   (bits 2-5) and measure which pixels change.  If the baseline's
   mismatching pixels are concentrated inside the 1-ulp-sensitive set,
   the residual is consistent with sub-ulp rounding differences at
   div/sqrt sites — evidence the 97.9% ceiling is rounding-determined
   rather than a semantic gap.

Usage: python tools/divsqrt_study.py [--masks 0,1,2,3,4,8,16,32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pure-CPU study (the native oracle + numpy); keep the scene pytree off the
# remote-TPU backend, whose tunnel may not even be up.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from raytpu.config import RenderConfig
from raytpu.image import read_ppm, tone_map
from raytpu.native import render_native, set_approx_mask
from raytpu.scene import default_scene

GOLDEN = "/root/reference/raytracer_gamma/testPPM.ppm"

LABELS = {
    0: "baseline (IEEE div/sqrt)",
    1: "div -> a*(1/b)",
    2: "sqrt -> x*(1/sqrt x)",
    3: "both lowerings",
    4: "div +1 ulp",
    8: "div -1 ulp",
    16: "sqrt +1 ulp",
    32: "sqrt -1 ulp",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--masks", default="0,1,2,3,4,8,16,32")
    ap.add_argument("--cap", type=int, default=5)
    args = ap.parse_args()

    golden = read_ppm(GOLDEN).astype(int)
    cfg = RenderConfig()  # 800x600 alias 3, the reference workload
    scene = default_scene(bg_opacity=0.0)

    renders = {}
    for mask in [int(m) for m in args.masks.split(",")]:
        set_approx_mask(mask)
        t0 = time.time()
        img = render_native(scene, cfg, cap=args.cap, fresnel_double=False)
        ours = tone_map(img).astype(int)
        renders[mask] = ours
        err = np.abs(ours - golden)
        by_pix = err.max(axis=-1)
        print(f"mask {mask:2d} [{LABELS.get(mask, '?'):26s}]: "
              f"byte-exact {(by_pix == 0).mean():.4f}  "
              f"mae {err.mean():.4f}  frac>1 {(by_pix > 1).mean():.4f}  "
              f"({time.time() - t0:.0f}s)")
    set_approx_mask(0)

    if 0 not in renders:
        return 0
    base = renders[0]
    mismatch = (np.abs(base - golden).max(axis=-1) > 0)  # vs golden
    print(f"\nbaseline mismatch: {mismatch.mean():.4f} of pixels")
    print("sensitivity overlap (pixels CHANGED by a 1-ulp nudge):")
    flip_any = np.zeros_like(mismatch)
    for mask in (4, 8, 16, 32):
        if mask not in renders:
            continue
        flip = (np.abs(renders[mask] - base).max(axis=-1) > 0)
        flip_any |= flip
        inm = flip[mismatch].mean() if mismatch.any() else 0.0
        outm = flip[~mismatch].mean()
        print(f"  mask {mask:2d} [{LABELS[mask]:12s}]: flips "
              f"{flip.mean():.4f} of all pixels; covers {inm:.4f} of "
              f"mismatches vs {outm:.4f} of matching pixels "
              f"({inm / max(outm, 1e-12):.1f}x enrichment)")
    inm = flip_any[mismatch].mean() if mismatch.any() else 0.0
    outm = flip_any[~mismatch].mean()
    print(f"  ANY 1-ulp nudge:  flips {flip_any.mean():.4f}; covers "
          f"{inm:.4f} of mismatches vs {outm:.4f} of matching "
          f"({inm / max(outm, 1e-12):.1f}x enrichment)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
