"""Refined UB-knob scan at cap=5: separate root vs refract-internal bg
opacity, finer values, and error-location analysis for the best candidate."""

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


def render_rows(cfg, rows, cap, root_bgo, inner_bgo):
    scene = default_scene()
    sc = O.OracleScene(scene, inner_bgo)  # used inside calculateRefraction
    sel = (np.asarray(rows)[:, None] * cfg.width
           + np.arange(cfg.width)[None, :]).ravel()
    acc = np.zeros((sel.size, 3), F)
    weight = F(1.0) / F(cfg.alias_factor**2)
    for i in range(cfg.alias_factor):
        for j in range(cfg.alias_factor):
            dirs = O.camera_dirs_oracle(cfg, i, j)[sel]
            b = dirs.shape[0]
            o = np.zeros((b, 3), F)
            intensity = np.ones((b, 3), F)
            med_matte = np.zeros((b, 3), F)
            med_ior = np.ones(b, F)
            med_op = np.full(b, F(root_bgo), F)  # root medium opacity
            acc += weight * O._trace(o, dirs, intensity, med_matte, med_ior,
                                     med_op, 0, np.zeros((b, 3), F), sc, cap)
    return acc.reshape(len(rows), cfg.width, 3)


def score(img, golden_rows):
    g = golden_rows.astype(np.float64)
    c = np.where(np.isnan(img), 1.0, np.minimum(img.astype(np.float64), 1.0))
    s = (c * g).sum() / max((c * c).sum(), 1e-12)
    pred = np.clip(c * s, 0, 255)
    err = np.abs(pred - g)
    return err, dict(mae=err.mean(), frac_gt2=(err > 2).mean(),
                     maxv=255.0 / s)


def main():
    cfg = RenderConfig()
    rows = np.linspace(0, cfg.height - 1, 40).astype(int)
    golden_rows = GOLDEN[rows]

    results = []
    for root_bgo in [0.0, 0.25, 0.5, 0.75, 1.0]:
        for inner_bgo in [0.0, 1.0]:
            img = render_rows(cfg, rows, 5, root_bgo, inner_bgo)
            err, s = score(img, golden_rows)
            results.append((s["mae"], root_bgo, inner_bgo, s))
            print(f"root={root_bgo:.2f} inner={inner_bgo:.2f}: mae={s['mae']:.3f} "
                  f"frac>2={s['frac_gt2']:.4f} maxv={s['maxv']:.6f}")
    results.sort()
    _, root_bgo, inner_bgo, _ = results[0]
    print(f"\nbest: root={root_bgo} inner={inner_bgo}; error locations:")
    img = render_rows(cfg, rows, 5, root_bgo, inner_bgo)
    err, _ = score(img, golden_rows)
    bad = np.argwhere(err.max(axis=-1) > 2)
    print(f"{len(bad)} bad pixels of {err.shape[0]*err.shape[1]}")
    for r, cix in bad[:25]:
        print(f"  row={rows[r]:3d} col={cix:3d} oracle={img[r,cix]} "
              f"golden={golden_rows[r,cix]}")


if __name__ == "__main__":
    main()
