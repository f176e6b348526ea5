"""Floor-free device-time measurement + MFU accounting.

Every wall-clock number this repo reports includes a ~28 ms per-dispatch
tunnel floor (CLAUDE.md).  This tool measures the *device* time of a render
by the slope method: run K frames inside ONE jitted computation (a python
loop of kernel calls whose scene input is perturbed by i*1e-30 per iteration
so XLA cannot hoist/CSE the repeated call), fetch one scalar, and report
(t(K) - t(1)) / (K - 1) — the dispatch floor and the host round-trip cancel
in the difference.

MFU accounting (forward): the bounce tree visits 2^(depth+1)-1 nodes per
camera ray; each node costs ~(35 + 22*L + 12)*N + ~160 VPU flops
(closest-hit quadratic+selects, shadow quadratics per light, containment,
shading/refraction/reflection math — raytracer.h:145-194, :272-309,
:245-270 vectorized).  Peak is the v5e VPU fp32 rate (8 sublanes x 128
lanes x 4 ALUs x 940 MHz ~= 3.85 Tflop/s); the MXU is idle in this
workload, so "MFU" here is VPU utilization.

Usage: python tools/device_time.py [--spheres N] [--width W] ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_VPU_FP32_FLOPS = 8 * 128 * 4 * 940e6  # ~3.85 Tflop/s


def node_flops(n_spheres: int, n_lights: int) -> float:
    """Approximate VPU flops per bounce-tree node per ray (closest-hit
    quadratic + selects; root-free sign-test shadow; containment)."""
    return (35 + 18 * n_lights + 12) * n_spheres + 160


def tree_flops(cfg, n_spheres: int, n_lights: int) -> float:
    """Approximate VPU flops per frame for the full forward bounce tree."""
    nodes = 2 ** (cfg.max_depth + 1) - 1
    return cfg.rays_per_frame * nodes * node_flops(n_spheres, n_lights)


def repeat_fn(render_fn, scene, k: int):
    """Jit k sequential renders with an un-hoistable scene perturbation."""
    import jax
    import jax.numpy as jnp

    def body(s):
        total = jnp.float32(0.0)
        for i in range(k):
            sph = dataclasses.replace(
                s.spheres, radius=s.spheres.radius + jnp.float32(i * 1e-30))
            si = dataclasses.replace(s, spheres=sph)
            total = total + jnp.sum(render_fn(si))
        return total

    return jax.jit(body)


def device_frame_seconds(render_fn, scene, k: int = 5, iters: int = 3):
    """(slope seconds-per-frame, one-frame wall seconds incl. dispatch)."""
    f1 = repeat_fn(render_fn, scene, 1)
    fk = repeat_fn(render_fn, scene, k)
    float(f1(scene))  # compile
    float(fk(scene))

    def best(f):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(scene))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = best(f1)
    tk = best(fk)
    return (tk - t1) / (k - 1), t1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--max-depth", type=int, default=4)
    ap.add_argument("--alias-factor", type=int, default=3)
    ap.add_argument("--spheres", type=int, default=0,
                    help="random scene with N spheres (default: golden scene)")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "jnp", "wavefront"])
    ap.add_argument("--chunk-rays", type=int, default=1 << 20,
                    help="wavefront backend: camera rays per scan chunk")
    ap.add_argument("--capacity-factor", type=float, default=2.0,
                    help="wavefront backend: live-ray capacity as a "
                         "multiple of chunk-rays")
    ap.add_argument("--streams", type=int, default=1,
                    help="wavefront backend: independent chunk pipelines "
                         "per scan step")
    args = ap.parse_args()

    import jax

    from raytpu.config import RenderConfig
    from raytpu.scene import default_scene, random_scene

    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.max_depth,
                       alias_factor=args.alias_factor)
    scene = (random_scene(args.spheres, seed=args.seed) if args.spheres
             else default_scene())
    n = int(scene.spheres.pos.shape[0])
    n_lights = int(scene.lights.pos.shape[0])

    if args.backend == "pallas":
        from raytpu.kernels.trace_pallas import render_pixels_pallas
        interpret = jax.default_backend() != "tpu"
        fn = lambda s: render_pixels_pallas(s, cfg, interpret=interpret)
    elif args.backend == "wavefront":
        from raytpu.kernels.wavefront import render_pixels_wavefront
        interpret = jax.default_backend() != "tpu"
        fn = lambda s: render_pixels_wavefront(
            s, cfg, chunk_rays=args.chunk_rays,
            capacity_factor=args.capacity_factor, streams=args.streams,
            interpret=interpret)
    else:
        import jax.numpy as jnp

        from raytpu.trace import render_pixels
        gid = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
        fn = lambda s: render_pixels(s, cfg, gid)

    dev_s, wall_s = device_frame_seconds(fn, scene, k=args.k)
    flops = tree_flops(cfg, n, n_lights)
    out = dict(
        config=f"{args.width}x{args.height} d{args.max_depth} "
               f"alias{args.alias_factor} N{n}",
        device_ms=round(dev_s * 1e3, 2),
        wall_ms=round(wall_s * 1e3, 2),
        dispatch_floor_ms=round((wall_s - dev_s) * 1e3, 2),
        device_mrays_per_s=round(cfg.rays_per_frame / dev_s / 1e6, 2),
        est_vpu_tflops=round(flops / dev_s / 1e12, 3),
        est_vpu_mfu=round(flops / dev_s / V5E_VPU_FP32_FLOPS, 4),
        backend=args.backend,
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
