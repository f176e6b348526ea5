"""Characterize the three remaining reference goldens (VERDICT round-3
item 5): testPPM_2.ppm, testPPM_CPU_2.ppm, testPPM_GPU.ppm
(/root/reference/raytracer_gamma/, README.md:4).

Findings (reproduced by running this script):

1. testPPM_CPU_2.ppm is BYTE-IDENTICAL to testPPM_CPU.ppm — the CPU-golden
   pin (tests/test_native.py::test_native_cpu_golden_pinned) covers both.
2. testPPM_2.ppm and testPPM_GPU.ppm agree with each other at 97.8%
   byte-exact (mae 0.07) — one older-revision render family, distinct
   from testPPM.ppm (91.6% mutual, mae ~3.1: the diff concentrates on the
   two transparent/glossy spheres, where the old renders are ~2x darker).
3. Best strict-semantics match (stock oracle knobs, full frame, reference
   tone map): cap=5, bg_opacity=0, float Fresnel — 0.885 byte-exact /
   mae 3.12 vs testPPM_GPU (cap=6 scores worse: 0.884/4.08 and introduces
   0.52% NaN pixels).  CAUTION when scoring: a least-squares-fitted tone
   scale is poisoned by NaN->1.0 pixels (it made an all-black prediction
   "win"); always score through the reference tone map with the subset
   max bracketed.
4. Closest single-mutation hypothesis for the old revision: the refracted
   child's intensity scaled by transparency TWICE (`transp2` below) —
   0.899 exact / mae 2.0 vs testPPM_GPU (row subset), vs 0.874/4.0 stock.
   Combinations (no gloss term, no reflection) only reach ~0.90, so the
   old code differed structurally beyond one line; not worth chasing
   further.  The regression pins therefore use the STOCK strict oracle at
   its best config (finding 3), like the CPU-golden pin.

Run: python tools/fit_old_goldens.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import inspect

import numpy as np

import raytpu.oracle as O
from raytpu.config import RenderConfig
from raytpu.image import read_ppm, tone_map
from raytpu.native import render_native
from raytpu.scene import default_scene

F = np.float32
REF = "/root/reference/raytracer_gamma"


def pairwise():
    names = ["testPPM", "testPPM_2", "testPPM_CPU", "testPPM_CPU_2",
             "testPPM_GPU"]
    imgs = {n: read_ppm(f"{REF}/{n}.ppm").astype(np.int64) for n in names}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            err = np.abs(imgs[a] - imgs[b])
            bp = err.max(axis=-1)
            print(f"{a} vs {b}: exact={(bp == 0).mean():.4f} "
                  f"mae={err.mean():.4f}")


def stock_sweep():
    cfg = RenderConfig()
    goldens = {n: read_ppm(f"{REF}/{n}.ppm").astype(np.int64)
               for n in ("testPPM_2", "testPPM_GPU")}
    for bgo in (0.0, 1.0):
        scene = default_scene(bg_opacity=bgo)
        for cap in (5, 6):
            img = render_native(scene, cfg, cap=cap, fresnel_double=False)
            ours = tone_map(img).astype(np.int64)
            for n, g in goldens.items():
                err = np.abs(ours - g)
                bp = err.max(axis=-1)
                print(f"bgo={bgo} cap={cap} vs {n}: "
                      f"exact={(bp == 0).mean():.4f} mae={err.mean():.4f}")


def hypothesis_sweep():
    """Single-line semantic mutations of the numpy oracle's _trace, scored
    on a row subset (with the global-max rows 242-246 bracketed so the
    reference tone map normalizes correctly)."""
    cfg = RenderConfig()
    rows = sorted(set(np.linspace(0, 599, 40).astype(int).tolist())
                  | {242, 243, 244, 245, 246})
    goldens = {n: read_ppm(f"{REF}/{n}.ppm")[rows].astype(np.int64)
               for n in ("testPPM_2", "testPPM_GPU")}

    def render_rows(cap):
        scene = default_scene(bg_opacity=0.0)
        sel = (np.asarray(rows)[:, None] * cfg.width
               + np.arange(cfg.width)[None, :]).ravel()
        acc = np.zeros((sel.size, 3), F)
        w = F(1.0) / F(9.0)
        for i in range(3):
            for j in range(3):
                dirs = O.camera_dirs_oracle(cfg, i, j)[sel]
                acc += w * O.trace_oracle(scene, np.zeros(3, F), dirs,
                                          cap=cap, fresnel_double=False)
        return acc.reshape(len(rows), cfg.width, 3)

    def score(img):
        finite = img[~np.isnan(img)]
        maxv = max(float(finite.max()), 0.0) or 1.0
        clamped = np.where(np.isnan(img), 1.0, np.minimum(img, 1.0))
        ours = (clamped * 255.0 / maxv).astype(np.int64) & 0xFF
        return {n: (lambda e: f"exact={(e.max(axis=-1) == 0).mean():.4f} "
                              f"mae={e.mean():.3f}")(np.abs(ours - g))
                for n, g in goldens.items()}

    src = inspect.getsource(O._trace)
    orig = O._trace
    mods = {
        "transp2": ("refr_in_i = transparency[:, None] * intensity",
                    "refr_in_i = (transparency * transparency)[:, None]"
                    " * intensity"),
        "noglossterm": ("refl_col = refl_col + med_opacity[:, None]"
                        " * mat_gloss\n    ", ""),
        "noopacmatte": ("\n    calc = opacity[:, None] * calc\n", "\n"),
        "norefl": ("refl_col = intensity * refl_col",
                   "refl_col = F(0.0) * refl_col"),
    }

    def make(*names):
        s = src
        for n in names:
            a, b = mods[n]
            s2 = s.replace(a, b)
            assert s2 != s, n
            s = s2
        ns = dict(vars(O))
        exec(s, ns)
        return ns["_trace"]

    for names in [(), ("transp2",), ("transp2", "noglossterm"),
                  ("transp2", "norefl"), ("transp2", "noopacmatte")]:
        O._trace = make(*names) if names else orig
        t0 = time.time()
        print(f"{names or 'stock'}: {score(render_rows(5))} "
              f"({time.time() - t0:.0f}s)")
    O._trace = orig


if __name__ == "__main__":
    print("== pairwise golden comparison ==")
    pairwise()
    print("== stock-knob sweep (native oracle, full frame) ==")
    stock_sweep()
    print("== old-revision hypothesis sweep (numpy oracle, row subset) ==")
    hypothesis_sweep()
