"""Collective-overlap study: where does the gradient psum sit in the
compiled sharded training step?

The framework's ONE collective is the psum of scene-parameter cotangents
over the pixel axis, inserted by differentiating through the shard_mapped
render (raytpu/grad.py).  With a single physical chip, overlap cannot be
*timed*; what CAN be verified is the compiled schedule's shape:

  * how many all-reduces the optimized HLO contains (should be O(#leaves)
    or fewer after XLA fuses them — NOT one per pixel tile);
  * how large they are (scene cotangents only: ~12 N + 6 L + 5 floats —
    trivially latency-bound, nothing to overlap);
  * where they sit relative to the backward computation (tail position =
    nothing meaningful to hide, confirming the design note that forward
    needs zero collectives and training's communication is negligible).

Run on the 8-device CPU mesh (the same virtual mesh CI uses):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/overlap_study.py [--backend jnp]

(The Pallas backend compiles on CPU only in interpret mode, which the
sharded-grad path enables automatically off-TPU.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jnp",
                    choices=["jnp", "pallas", "wavefront"])
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--max-depth", type=int, default=2)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count="
                          + str(args.devices))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from raytpu.config import RenderConfig
    from raytpu.grad import _sharded_grad_fn
    from raytpu.parallel.mesh import make_mesh
    from raytpu.scene import default_scene

    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.max_depth, alias_factor=1)
    scene = default_scene()
    mesh = make_mesh()
    # Returns ((loss, dropped), grads) since round 5; the HLO study only
    # needs the compiled text, so the aux change is shape-only here.
    fn = _sharded_grad_fn(cfg, mesh, args.backend,
                          interpret=args.backend != "jnp")
    gid = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    lowered = fn.lower(scene, gid, target)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    lines = hlo.splitlines()
    # Instructions live inside computations; all-reduce call sites in the
    # entry schedule are what the runtime executes in order.
    ar_lines = [i for i, l in enumerate(lines) if "all-reduce" in l
                and "=" in l]
    total = len(lines)
    import re

    shapes = []
    byts = 0
    for i in ar_lines:
        head = lines[i].split("all-reduce", 1)[0]
        for m in re.finditer(r"f32\[([0-9,]*)\]", head):
            dims = m.group(1)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            byts += 4 * n
            shapes.append(f"f32[{dims}]")
    report = {
        "backend": args.backend,
        "devices": int(mesh.devices.size),
        "hlo_lines": total,
        "all_reduce_sites": len(ar_lines),
        "first_all_reduce_line_frac": (round(ar_lines[0] / total, 3)
                                       if ar_lines else None),
        "last_all_reduce_line_frac": (round(ar_lines[-1] / total, 3)
                                      if ar_lines else None),
        "all_reduce_shapes": sorted(set(shapes)),
        "all_reduce_bytes_total": byts,
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
