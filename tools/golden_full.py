"""Full-frame strict-oracle render vs testPPM_CPU.ppm with the exact
reference tone map (no fitted scale).  Writes the oracle PPM next to a diff
report."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from raytpu.config import RenderConfig
from raytpu.image import max_colour_value, read_ppm, tone_map, write_ppm
from raytpu.oracle import render_oracle
from raytpu.scene import default_scene

GOLDEN = read_ppm("/root/reference/raytracer_gamma/testPPM_CPU.ppm")


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    bgo = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    cfg = RenderConfig()
    scene = default_scene(bg_opacity=bgo)
    t0 = time.time()
    img = render_oracle(scene, cfg, cap=cap)
    print(f"rendered in {time.time()-t0:.0f}s; maxv={max_colour_value(img):.8g} "
          f"nan%={100*np.isnan(img).any(axis=-1).mean():.3f}")
    ours = tone_map(img)
    write_ppm(ours, f"/tmp/oracle_cap{cap}_bgo{bgo}.ppm")
    err = np.abs(ours.astype(int) - GOLDEN.astype(int))
    by_pix = err.max(axis=-1)
    print(f"byte diff: mae={err.mean():.4f} max={err.max()} "
          f"frac>0={(by_pix>0).mean():.4f} frac>1={(by_pix>1).mean():.4f} "
          f"frac>2={(by_pix>2).mean():.4f} frac>5={(by_pix>5).mean():.4f}")
    ys, xs = np.nonzero(by_pix > 5)
    if len(ys):
        print(f"{len(ys)} pixels with err>5; sample:")
        for y, x in list(zip(ys, xs))[:10]:
            print(f"  ({y},{x}) ours={ours[y,x]} golden={GOLDEN[y,x]}")


if __name__ == "__main__":
    main()
