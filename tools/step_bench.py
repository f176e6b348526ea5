"""Training-step breakdown at BASELINE config 3: forward kernel alone,
flat-layout fused step, and the packed native-layout step.

Wall times of single-dispatch programs; the ~28 ms tunnel floor is common
to all three, so the DIFFERENCES are device time: loss-glue cost =
flat_step - fwd - bwd_kernel, packed win = flat_step - packed_step.

Usage: python tools/step_bench.py [--width 640] [--height 480] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(f, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--max-depth", type=int, default=4)
    ap.add_argument("--alias-factor", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytpu.config import RenderConfig
    from raytpu.grad import (_loss_and_grad_pallas,
                             _loss_and_grad_pallas_packed, pack_target)
    from raytpu.kernels.trace_pallas import render_pixels_pallas
    from raytpu.scene import default_scene

    interpret = jax.default_backend() != "tpu"
    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.max_depth,
                       alias_factor=args.alias_factor)
    scene = default_scene()
    target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    tpk = pack_target(cfg, target)

    f_fwd = jax.jit(lambda s: jnp.sum(
        render_pixels_pallas(s, cfg, interpret=interpret)))
    out = {}

    def run(name, f, fetch):
        t0 = time.perf_counter()
        fetch(f(scene))
        out[name + "_compile_s"] = round(time.perf_counter() - t0, 1)
        dt = best_of(lambda: fetch(f(scene)))
        out[name + "_ms"] = round(dt * 1e3, 2)
        return dt

    t_fwd = run("fwd", f_fwd, float)
    t_flat = run("flat_step",
                 lambda s: _loss_and_grad_pallas(s, cfg, target, interpret),
                 lambda r: float(r[0]))
    t_packed = run("packed_step",
                   lambda s: _loss_and_grad_pallas_packed(s, cfg, tpk,
                                                          interpret),
                   lambda r: float(r[0]))

    out["config"] = (f"{args.width}x{args.height} d{args.max_depth} "
                     f"alias{args.alias_factor}")
    out["packed_win_ms"] = round((t_flat - t_packed) * 1e3, 2)
    out["nonfwd_flat_ms"] = round((t_flat - t_fwd) * 1e3, 2)
    out["nonfwd_packed_ms"] = round((t_packed - t_fwd) * 1e3, 2)
    rays = cfg.rays_per_frame
    out["packed_step_mrays_per_s_wall"] = round(rays / t_packed / 1e6, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
