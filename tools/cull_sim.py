"""Host-side simulation of per-tile sphere culling for the wavefront tracer.

Mirrors the wavefront loop (wavefront.py) with the jnp tracer on CPU and
measures, per bounce level, how many spheres each (WF_BLOCK)-ray kernel tile
would keep live under the culling masks in raytpu.kernels.culling:

  * beam_live_mask on the tile's (origin, direction) interval bounds
    (closest-hit + containment loops), and
  * segment_hull_live_mask per light on the tile's conservative hit box
    (the union of beam-live spheres' bounding boxes — every hit point lies
    on a beam-live sphere's surface), for the shadow loops.

It also compares camera-ray orderings at level 0 (row-major pixel ids give a
tile a 2-pixel-tall full-width fan; square pixel blocks give a narrow cone)
and the effect of the spatial (cell, octant) sort key at deeper levels.

The output answers: what fraction of the N-sphere loop work survives
culling, i.e. the speedup ceiling for the culled wavefront kernels.

Usage: python tools/cull_sim.py [--width 1920] [--height 1080] [--depth 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def block_order_ids(width: int, height: int, bw: int, bh: int):
    """Pixel ids reordered so consecutive runs cover bw x bh blocks."""
    import numpy as np

    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    lin = (ys * width + xs)
    by, bx = ys // bh, xs // bw
    key = (((by * ((width + bw - 1) // bw)) + bx) * (bw * bh)
           + (ys % bh) * bw + (xs % bw))
    return lin.ravel()[np.argsort(key.ravel(), kind="stable")].astype(np.int32)


def tile_stats(live, tag, level, out):
    import numpy as np

    counts = np.asarray(live.sum(axis=1))
    out.append(dict(level=level, tag=tag,
                    tiles=int(counts.size),
                    mean=float(counts.mean()),
                    p50=float(np.percentile(counts, 50)),
                    p90=float(np.percentile(counts, 90)),
                    max=int(counts.max())))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--spheres", type=int, default=256)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=1 << 20)
    ap.add_argument("--tile", type=int, default=4096)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from raytpu.config import RenderConfig
    from raytpu.kernels import culling
    from raytpu.scene import random_scene
    from raytpu.trace import _trace_level, camera_rays

    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.depth, alias_factor=1)
    scene = random_scene(args.spheres, seed=args.seed)
    pos = np.asarray(scene.spheres.pos)
    rad = np.asarray(scene.spheres.radius)
    lo, span = culling.scene_bounds(pos, rad)
    lights = np.asarray(scene.lights.pos)
    n = args.spheres
    tile = args.tile
    results = []

    def measure(origin, direction, alive, level, tag):
        """Per-tile culling stats over flat (R,) SoA fields."""
        r = origin.shape[0]
        r_pad = (r // tile) * tile
        o = origin[:r_pad]
        d = direction[:r_pad]
        bounds = culling.tile_bounds(
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]], tile)
        beam = np.asarray(culling.beam_live_mask(bounds, pos, rad,
                                                 inflate=1e-3))
        tile_stats(beam, tag + ":beam", level, results)

        # Hit box per tile = union of beam-live spheres' boxes.
        blo = np.where(beam[:, :, None], (pos - rad[:, None])[None],
                       np.inf).min(axis=1)
        bhi = np.where(beam[:, :, None], (pos + rad[:, None])[None],
                       -np.inf).max(axis=1)
        any_live = beam.any(axis=1)
        blo = np.where(any_live[:, None], blo, 0.0).astype(np.float32)
        bhi = np.where(any_live[:, None], bhi, 0.0).astype(np.float32)
        hit_bounds = [(blo[:, 0], bhi[:, 0]), (blo[:, 1], bhi[:, 1]),
                      (blo[:, 2], bhi[:, 2])]
        shadow = np.zeros_like(beam)
        for l in range(lights.shape[0]):
            m = np.asarray(culling.segment_hull_live_mask(
                hit_bounds, lights[l], pos, rad, inflate=1e-3))
            shadow |= m
        shadow &= any_live[:, None]
        tile_stats(shadow, tag + ":shadow", level, results)
        union = beam | shadow
        tile_stats(union, tag + ":union", level, results)
        frac_alive = float(np.asarray(alive[:r_pad]).reshape(
            -1, tile).any(axis=1).mean())
        results[-1]["tile_live_frac"] = frac_alive

    # ---- Level 0: compare pixel orderings ----
    chunk = min(args.chunk, cfg.num_pixels)
    gid_row = jnp.arange(chunk, dtype=jnp.int32)
    side = int(np.sqrt(tile))
    gid_blk = jnp.asarray(
        block_order_ids(args.width, args.height, side, side)[:chunk])
    d_row = camera_rays(cfg, 0, 0, gid_row)
    d_blk = camera_rays(cfg, 0, 0, gid_blk)
    o0 = jnp.zeros((chunk, 3), jnp.float32)
    alive0 = jnp.ones((chunk,), bool)
    measure(o0, d_row, alive0, 0, "rowmajor")
    measure(o0, d_blk, alive0, 0, "block64")

    # ---- Deeper levels: mirror the wavefront loop (block order) ----
    cap = 2 * chunk
    b = chunk
    med_matte = jnp.broadcast_to(scene.bg.matte, (b, 3))
    med_ior = jnp.broadcast_to(scene.bg.ior, (b,))
    med_op = jnp.broadcast_to(scene.bg.opacity, (b,))
    state = (o0, d_blk, jnp.ones((b, 3), jnp.float32),
             med_matte, med_ior, med_op)
    level_fn = jax.jit(lambda *s: _trace_level(scene, *s, spawn=True)[1])
    for level in range(1, args.depth + 1):
        children = level_fn(*state)
        origin, direction, intensity = children[0], children[1], children[2]
        alive = jnp.any(intensity != 0, axis=-1)
        # Spatial sort: (dead, cell|octant) — what the culled wavefront uses.
        key = culling.bin_key(origin[:, 0], origin[:, 1], origin[:, 2],
                              direction[:, 0], direction[:, 1],
                              direction[:, 2], lo, span)
        key = jnp.where(alive, key, 1 << 20)
        order = jnp.argsort(key, stable=True)
        sorted_state = tuple(c[order] for c in children)
        alive_s = alive[order]
        measure(sorted_state[0], sorted_state[1], alive_s, level, "spatial")
        # Fine variant: normalized direction quantized 4 bins/axis (6 bits)
        # below the cell — tests whether octant-wide direction intervals
        # were the culling killer at deep levels.
        dn = direction / jnp.maximum(
            jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-20)
        db = sum(jnp.clip(((dn[:, i] + 1) * 2).astype(jnp.int32), 0, 3)
                 << (2 * i) for i in range(3))
        cell = culling.spatial_cell(origin[:, 0], origin[:, 1],
                                    origin[:, 2], lo, span)
        fkey = jnp.where(alive, (cell << 6) | db, 1 << 20)
        forder = jnp.argsort(fkey, stable=True)
        fo, fd = children[0][forder], children[1][forder]
        fa = alive[forder]
        measure(fo, fd, fa, level, "fine4096")
        r1 = fo.shape[0] // 1024 * 1024
        b1 = culling.tile_bounds(
            [fo[:r1, 0], fo[:r1, 1], fo[:r1, 2],
             fd[:r1, 0], fd[:r1, 1], fd[:r1, 2]], 1024)
        import numpy as _np
        beam1 = _np.asarray(culling.beam_live_mask(b1, pos, rad,
                                                   inflate=1e-3))
        tile_stats(beam1, "fine1024:beam", level, results)
        # No-sort baseline (what the current wavefront does under capacity).
        measure(origin, direction, alive, level, "nosort")
        n_alive = int(alive.sum())
        keep = min(cap, origin.shape[0])
        state = tuple(c[:keep] for c in sorted_state)
        print(f"level {level}: rays {origin.shape[0]} alive {n_alive}",
              file=sys.stderr)

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
