"""Per-shard wavefront load balance at config-5 geometry (CPU study).

Under data-parallel rendering each device gets a CONTIGUOUS pixel block
(raytpu/parallel/mesh.py render_sharded).  The wavefront's per-level live
-ray count varies across the frame (hot strips cross many spheres), so
block shards can carry unequal loads two ways:

  * wall-clock: the step finishes when the hottest shard finishes;
  * capacity: the zero-drop capacity_factor is set by the hottest
    CHUNK of the hottest shard, and every shard pays that array size.

Round 4 fixed the intra-shard version of this with strided chunk->pixel
assignment (raytpu/kernels/wavefront.py `_unstripe` docstring): within a
shard, every chunk now sees shard-average liveness.  This tool measures
what remains BETWEEN shards: per-shard live-children counts per level
(the capacity driver) and their max/mean imbalance, on the CPU backend
via the interpret-mode level kernels at a scaled config-5 (same scene,
same depth; resolution and alias reduced to keep CPU time sane — the
geometry-driven imbalance is what transfers).

Usage: python tools/shard_balance.py [--width 960 --height 540
         --max-depth 6 --spheres 256 --shards 8 --alias 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--alias", type=int, default=1)
    ap.add_argument("--spheres", type=int, default=256)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--interleave", action="store_true",
                    help="measure the strided pixel-sharding option "
                         "(shard s owns pixels {s + k*shards}) instead "
                         "of contiguous blocks")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import raytpu.kernels.wavefront as wf
    from raytpu.config import RenderConfig
    from raytpu.scene import random_scene

    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.max_depth, alias_factor=args.alias)
    scene = random_scene(args.spheres, seed=args.seed)
    n = args.spheres
    n_lights = int(scene.lights.pos.shape[0])
    scene_tbl, lights_tbl, bg_tbl = wf._scene_tables(scene)
    npix = cfg.num_pixels
    spp = cfg.samples_per_pixel
    shard_px = npix // args.shards

    rays = shard_px * spp
    rays_p = wf._align_up(rays, wf.WF_BLOCK)

    @jax.jit
    def shard_live_counts(offset):
        """Live-children count per level for one shard's full ray set.
        Children are compacted to cap = 2x rays between levels — lossless
        (live children <= 2x live parents <= cap), so the counts are the
        true demand, not post-drop survivors."""
        ids = jnp.minimum(jnp.arange(rays_p, dtype=jnp.int32), rays - 1)
        in_range = jnp.arange(rays_p, dtype=jnp.int32) < rays
        pid = ids // spp
        sample = ids % spp
        si = sample // cfg.alias_factor
        sj = sample % cfg.alias_factor
        gp = (offset + pid * args.shards if args.interleave
              else offset + pid)
        dx, dy, dz = wf._camera_dirs(cfg, jnp.minimum(gp, npix - 1),
                                     si, sj)
        zero = jnp.zeros_like(dx)
        one = jnp.where(in_range, jnp.float32(1.0), jnp.float32(0.0))
        state = (zero, zero, zero, dx, dy, dz, one, one, one, zero - 1.0)
        sid = pid
        counts = []
        for _level in range(cfg.max_depth):
            _, children = wf._wf_level_call(
                scene_tbl, lights_tbl, bg_tbl, state, n, n_lights,
                True, True)
            ir, ig, ib = children[6], children[7], children[8]
            alive = (ir != 0) | (ig != 0) | (ib != 0)
            counts.append(jnp.sum(alive.astype(jnp.int32)))
            r = state[0].shape[0]
            sid2 = wf._dup_tilewise(sid, r // wf.WF_BLOCK)
            state, sid, _, _ = wf._compact(children, sid2,
                                           min(2 * r, 2 * rays_p))
        return jnp.stack(counts)

    per_shard = []
    for s in range(args.shards):
        off = s if args.interleave else s * shard_px
        c = [int(x) for x in shard_live_counts(jnp.int32(off))]
        per_shard.append(c)
        print(f"shard {s}: {c}", file=sys.stderr, flush=True)

    levels = list(range(1, cfg.max_depth + 1))
    by_level = list(zip(*per_shard))
    stats = {}
    for lv, vals in zip(levels, by_level):
        mx, mn = max(vals), min(vals)
        mean = sum(vals) / len(vals)
        stats[f"L{lv}"] = {
            "max": mx, "mean": round(mean, 1),
            "max_over_mean": round(mx / max(mean, 1), 3),
            # live children per camera ray: the capacity_factor each
            # shard would need at chunk == shard (upper bound; real
            # chunks stripe inside the shard and see the shard average)
            "cap_need_max": round(mx / rays, 3),
            "cap_need_min": round(mn / rays, 3),
        }
    out = {"config": f"{args.width}x{args.height} d{cfg.max_depth} "
                     f"N{args.spheres} alias{args.alias}",
           "shards": args.shards, "rays_per_shard": rays,
           "levels": stats}
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
