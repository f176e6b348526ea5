"""Diagnose the pixel regions where the strict oracle disagrees with the CPU
golden: cluster them, identify which sphere the primary ray hits, and probe
candidate UB settings on representative pixels."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import raytpu.oracle as O
from raytpu.config import RenderConfig
from raytpu.image import read_ppm
from raytpu.scene import default_scene

F = np.float32
GOLDEN = read_ppm("/root/reference/raytracer_gamma/testPPM_CPU.ppm")
OURS = read_ppm("/tmp/oracle_cap5_bgo0.0.ppm")
MAXV = 6.9550253e-05  # from the full render


def pixel_colour(y, x, cap, root_bgo, inner_bgo):
    cfg = RenderConfig()
    scene = default_scene()
    sc = O.OracleScene(scene, inner_bgo)
    gid = np.asarray([y * cfg.width + x])
    acc = np.zeros((1, 3), F)
    w = F(1.0 / 9.0)
    for i in range(3):
        for j in range(3):
            d = O.camera_dirs_oracle(cfg, i, j)[gid]
            o = np.zeros((1, 3), F)
            acc += w * O._trace(o, d, np.ones((1, 3), F), np.zeros((1, 3), F),
                                np.ones(1, F), np.full(1, F(root_bgo)), 0,
                                np.zeros((1, 3), F), sc, cap)
    return acc[0]


def main():
    err = np.abs(OURS.astype(int) - GOLDEN.astype(int)).max(axis=-1)
    bad = err > 5
    print(f"bad pixels: {bad.sum()}")
    # coarse clustering: 20x20 blocks with any bad pixel
    blocks = bad.reshape(30, 20, 40, 20).any(axis=(1, 3))
    ys, xs = np.nonzero(blocks)
    print("bad 20x20 blocks (row_block, col_block):")
    print(sorted(set(zip((ys * 20).tolist(), (xs * 20).tolist()))))

    # primary-hit object for representative bad pixels
    cfg = RenderConfig()
    scene = default_scene()
    sc = O.OracleScene(scene, 0.0)
    ys, xs = np.nonzero(bad)
    reps = [(int(ys[k]), int(xs[k])) for k in
            np.linspace(0, len(ys) - 1, 8).astype(int)]
    for y, x in reps:
        gid = np.asarray([y * cfg.width + x])
        d = O.camera_dirs_oracle(cfg, 1, 1)[gid]
        found, t, point, normal, sq, idx = O._calc_intersection(
            np.zeros((1, 3), F), d, sc)
        print(f"({y},{x}) golden={GOLDEN[y,x]} ours={OURS[y,x]} "
              f"hit={bool(found[0])} sphere={int(idx[0]) if found[0] else -1}")

    # probe settings on the first few representatives
    print("\nper-pixel probes (byte prediction with fixed maxv):")
    settings = [(5, 0.0, 0.0), (5, 1.0, 0.0), (5, 0.0, 1.0), (5, 1.0, 1.0),
                (6, 0.0, 0.0), (6, 1.0, 1.0), (5, 0.3, 0.3), (5, 0.5, 0.5)]
    for y, x in reps[:4]:
        print(f"pixel ({y},{x}) golden={GOLDEN[y,x]}:")
        for cap, r, i_ in settings:
            c = pixel_colour(y, x, cap, r, i_)
            byte = np.minimum(np.where(np.isnan(c), 1.0, np.minimum(c, 1.0))
                              * 255.0 / MAXV, 255).astype(int)
            print(f"  cap={cap} root={r} inner={i_}: {byte} lin={c}")


if __name__ == "__main__":
    main()
