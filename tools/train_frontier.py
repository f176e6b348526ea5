"""Config-5 train-step (chunk, capacity) probe on real TPU.

The round-3 config-5 training number (28-38 s/step) ran the AD wavefront
at chunk 1M x capacity 2.0 — untuned while the forward's round-4
frontier moved to 128K x 0.875 (3 s/frame).  The AD scan carries the
same level arrays (plus checkpoint residuals), so the same working-set
levers should apply; capacity that DROPS rays also biases the gradient,
so only zero-drop points are candidates (drops are checked through the
forward path at the same setting).

Usage: python tools/train_frontier.py --points 131072:1.0 131072:0.875
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", nargs="+",
                    default=["131072:1.0", "131072:0.875"])
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--compact", default="auto",
                    choices=["auto", "global", "blocked"],
                    help="AD compaction: blocked = _compact_blocked_ad "
                         "(round 5); auto resolves to global for AD")
    args = ap.parse_args()

    import jax.numpy as jnp

    from raytpu.config import RenderConfig
    from raytpu.grad import loss_and_grad_wavefront
    from raytpu.scene import random_scene

    cfg = RenderConfig(width=1920, height=1080, max_depth=6,
                       alias_factor=3)
    scene = random_scene(256, seed=3)
    target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    for pt in args.points:
        ch_s, cap_s = pt.split(":")
        chunk, cap = int(ch_s), float(cap_s)

        def fn():
            # A probe point is allowed to drop (on_drop="ignore") — the
            # count is REPORTED so only zero-drop points become tunings.
            loss, g, info = loss_and_grad_wavefront(
                scene, cfg, target, chunk_rays=chunk, capacity_factor=cap,
                on_drop="ignore", return_info=True,
                compact_mode=args.compact)
            # Device->host scalar fetch: the only reliable barrier here.
            gs = sum(float(jnp.sum(jnp.abs(x)))
                     for x in jax.tree_util.tree_leaves(g))
            return float(loss), gs, info["dropped"]

        import jax
        t0 = time.perf_counter()
        loss, gs, dropped = fn()  # compile
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(max(args.iters, 1)):
            t0 = time.perf_counter()
            loss, gs, dropped = fn()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"chunk": chunk, "cap": cap,
                          "compact": args.compact,
                          "step_s": round(min(ts), 2),
                          "compile_s": round(t_compile, 1),
                          "loss": loss, "gsum": gs,
                          "dropped": dropped}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
