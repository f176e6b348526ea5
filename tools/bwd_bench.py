"""Device-time breakdown of the fused training step (slope method).

Measures, floor-free (K-in-one-jit slope, tools/device_time.py):
  * the forward kernel alone,
  * the backward kernel alone (gradient of sum(render * g)),
  * the full packed training step (loss + grads).

This is the harness for backward-kernel optimization work: bwd/fwd ratio
and the step's non-kernel glue fall out of the three numbers.

Usage: python tools/bwd_bench.py [--width 640] [--height 480] ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(make_fn, scene, k=4, iters=3):
    """Device seconds per call: make_fn(k) -> jitted fn(scene) running k
    salted repetitions; returns (t(k) - t(1)) / (k - 1)."""
    f1, fk = make_fn(1), make_fn(k)
    float(f1(scene))
    float(fk(scene))

    def best(f):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(scene))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fk) - best(f1)) / (k - 1)


def salted(scene, i):
    import jax.numpy as jnp
    sph = dataclasses.replace(
        scene.spheres, radius=scene.spheres.radius + jnp.float32(i * 1e-30))
    return dataclasses.replace(scene, spheres=sph)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--max-depth", type=int, default=4)
    ap.add_argument("--alias-factor", type=int, default=3)
    ap.add_argument("--spheres", type=int, default=0,
                    help="random scene with N spheres (default: golden)")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytpu.config import RenderConfig
    from raytpu.grad import _loss_and_grad_pallas_packed, pack_target
    from raytpu.kernels.trace_pallas import (_grad_pixels_pallas_tbl,
                                             _forward_tiles)
    from raytpu.scene import default_scene, random_scene

    interpret = jax.default_backend() != "tpu"
    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.max_depth,
                       alias_factor=args.alias_factor)
    scene = (random_scene(args.spheres, seed=args.seed) if args.spheres
             else default_scene())
    target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    tpk = pack_target(cfg, target)

    def tree_sum(t):
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(t))

    def make_fwd(k):
        def body(s):
            total = jnp.float32(0.0)
            for i in range(k):
                total = total + jnp.sum(
                    _forward_tiles(salted(s, i), cfg, interpret, 0,
                                   cfg.num_pixels))
            return total
        return jax.jit(body)

    g_tbl = jnp.ones_like(tpk)

    def make_bwd(k):
        def body(s):
            total = jnp.float32(0.0)
            for i in range(k):
                gs = _grad_pixels_pallas_tbl(salted(s, i), cfg, g_tbl,
                                             interpret, 0, cfg.num_pixels)
                total = total + tree_sum(gs)
            return total
        return jax.jit(body)

    def make_step(k):
        def body(s):
            total = jnp.float32(0.0)
            for i in range(k):
                loss, grads = _loss_and_grad_pallas_packed(
                    salted(s, i), cfg, tpk, interpret)
                total = total + loss + tree_sum(grads)
            return total
        return jax.jit(body)

    out = {"config": (f"{args.width}x{args.height} d{args.max_depth} "
                      f"alias{args.alias_factor} "
                      f"N{int(scene.spheres.pos.shape[0])}")}
    t_fwd = slope(make_fwd, scene, k=args.k)
    out["fwd_device_ms"] = round(t_fwd * 1e3, 2)
    t_bwd = slope(make_bwd, scene, k=args.k)
    out["bwd_device_ms"] = round(t_bwd * 1e3, 2)
    t_step = slope(make_step, scene, k=args.k)
    out["step_device_ms"] = round(t_step * 1e3, 2)
    out["bwd_over_fwd"] = round(t_bwd / t_fwd, 2)
    out["step_device_mrays_per_s"] = round(
        cfg.rays_per_frame / t_step / 1e6, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
