"""Per-tile conservative sphere culling: tested building blocks, NOT wired
into the shipped wavefront.

These pieces were built for tile-granular sphere culling over the
wavefront's sorted ray order, then MEASURED and left unwired
(tools/cull_sim.py; BASELINE.md "acceleration-structure study"): interval
beam tests cull only block-ordered *camera* tiles at level 0 (37/256
spheres live on config 5), and after one bounce the per-tile direction
spread defeats them at every granularity tried (137-253/256 live even
with fine direction keys at 1024-ray tiles).  The shipped compaction key
is (dead | pixel_id) — wavefront.py:_compact — not the spatial bin_key
below.  The blocks stay here, tested, for a future sparser/coherent-er
scene where they would pay; tools/probe_mosaic.py proves the kernel-side
pieces (dynamic-bound fori, per-tile SMEM tables) lower on Mosaic.

Everything here runs in XLA between Pallas kernel launches:

  * `bin_key` — a per-ray spatial sort key (dead | origin cell | direction
    octant) — the compaction key a culling-enabled wavefront would use at
    levels >= 1;
  * `tile_bounds` — per-tile interval bounds of ray origin/direction;
  * `beam_live_mask` — a conservative (tiles, N) liveness test: sphere s is
    marked dead for a tile only when NO ray with origin in the tile's
    origin box and direction in its direction box can intersect s.  The
    proof is interval arithmetic on the reference's own quadratic
    (raySphere, raytracer.h:96-118): with a = |d|^2 > 0, if every origin is
    strictly outside the sphere (c_lo > 0) then both roots share c/a's
    sign, so a forward hit needs b < 0 AND a real radicand; dead iff
    c_lo > 0 and (b_lo >= 0 or max b^2 < 4 a_lo c_lo).  The t < 1000
    render-distance cap is ignored (conservative);
  * `pack_tile_scene` — per-tile scene tables with live spheres packed
    first (stable order, so the packed prefix preserves the reference's
    lowest-index tie-break in calcIntersection's strict '<' running min,
    raytracer.h:163-170) plus a per-tile live count for the kernel's
    dynamic-bound sphere loops.

Culling applies to the closest-hit and containment loops only: a sphere
that no tile ray can reach can neither be the closest hit nor contain a
probe point that lies on a tile ray.  Shadow occluders are NOT a subset of
beam-reachable spheres, so shadow loops keep the full table (the packed
table is a permutation, so iterating all N entries is exact for them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32

# Spatial grid for the sort key: 8x8x8 cells over the scene's sphere bounds.
CELL_BITS = 3  # per axis
N_CELLS = 1 << (3 * CELL_BITS)

# Sort-key layout (int32): [dead:1][cell:9][octant:3] above the tile-local
# ordering; wavefront.py packs pixel ids separately.
_OCTANT_BITS = 3


def direction_octant(dx, dy, dz):
    """Sign octant of a direction, 0..7."""
    return ((dx < 0).astype(jnp.int32)
            + 2 * (dy < 0).astype(jnp.int32)
            + 4 * (dz < 0).astype(jnp.int32))


def scene_bounds(sphere_pos, sphere_rad):
    """Static (lo, hi) numpy bounds of the scene's spheres (host-side)."""
    pos = np.asarray(sphere_pos, np.float32)
    rad = np.asarray(sphere_rad, np.float32)[:, None]
    lo = (pos - rad).min(axis=0)
    hi = (pos + rad).max(axis=0)
    span = np.maximum(hi - lo, 1e-3)
    return lo.astype(np.float32), span.astype(np.float32)


def spatial_cell(x, y, z, lo, span):
    """Row-major cell id over an 8^3 grid spanning the scene bounds;
    points outside clamp to the boundary cells."""
    n = 1 << CELL_BITS
    cx = jnp.clip(((x - lo[0]) / span[0] * n).astype(jnp.int32), 0, n - 1)
    cy = jnp.clip(((y - lo[1]) / span[1] * n).astype(jnp.int32), 0, n - 1)
    cz = jnp.clip(((z - lo[2]) / span[2] * n).astype(jnp.int32), 0, n - 1)
    return (cx << (2 * CELL_BITS)) | (cy << CELL_BITS) | cz


def bin_key(ox, oy, oz, dx, dy, dz, lo, span):
    """Spatial sort key: (origin cell << 3) | direction octant, 12 bits."""
    cell = spatial_cell(ox, oy, oz, lo, span)
    return (cell << _OCTANT_BITS) | direction_octant(dx, dy, dz)


def tile_bounds(fields, tile_size: int):
    """Per-tile (min, max) of each flat (R,) field; R % tile_size == 0.

    Returns a list of (lo, hi) pairs of shape (tiles,)."""
    out = []
    for fld in fields:
        t = fld.reshape(-1, tile_size)
        out.append((t.min(axis=1), t.max(axis=1)))
    return out


def _interval_prod(alo, ahi, blo, bhi):
    """Interval product [alo,ahi] * [blo,bhi]."""
    c0, c1, c2, c3 = alo * blo, alo * bhi, ahi * blo, ahi * bhi
    lo = jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3))
    hi = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))
    return lo, hi


def _interval_sq(lo, hi):
    """Interval square: [0 if straddles else min^2, max^2]."""
    m = jnp.maximum(jnp.abs(lo), jnp.abs(hi))
    straddles = (lo <= 0) & (hi >= 0)
    lo2 = jnp.where(straddles, f32(0.0),
                    jnp.minimum(lo * lo, hi * hi))
    return lo2, m * m


def beam_live_mask(bounds, sphere_pos, sphere_rad, inflate=0.0):
    """Conservative liveness of each sphere for each ray tile.

    bounds: [(o_lo,o_hi) x3, (d_lo,d_hi) x3] per-tile interval arrays
    (tiles,), as from `tile_bounds` over (ox,oy,oz,dx,dy,dz).
    sphere_pos (N,3), sphere_rad (N,).  `inflate` grows radii (used to
    cover the containment probe's +-0.01*d offset and the 1e-6 epsilon).

    Returns (tiles, N) bool — True means "some ray in this tile may hit".
    """
    (oxl, oxh), (oyl, oyh), (ozl, ozh), \
        (dxl, dxh), (dyl, dyh), (dzl, dzh) = bounds
    sx, sy, sz = (sphere_pos[:, 0][None, :], sphere_pos[:, 1][None, :],
                  sphere_pos[:, 2][None, :])
    rad = sphere_rad[None, :] + f32(inflate)

    col = lambda v: v[:, None]  # (tiles, 1)

    # e = o - s per component, interval
    exl, exh = col(oxl) - sx, col(oxh) - sx
    eyl, eyh = col(oyl) - sy, col(oyh) - sy
    ezl, ezh = col(ozl) - sz, col(ozh) - sz

    # c = |e|^2 - r^2
    ex2l, ex2h = _interval_sq(exl, exh)
    ey2l, ey2h = _interval_sq(eyl, eyh)
    ez2l, ez2h = _interval_sq(ezl, ezh)
    c_lo = ex2l + ey2l + ez2l - rad * rad

    # a = |d|^2
    dx2l, _ = _interval_sq(col(dxl), col(dxh))
    dy2l, _ = _interval_sq(col(dyl), col(dyh))
    dz2l, _ = _interval_sq(col(dzl), col(dzh))
    a_lo = dx2l + dy2l + dz2l

    # b = 2 sum d_i e_i
    bxl, bxh = _interval_prod(col(dxl), col(dxh), exl, exh)
    byl, byh = _interval_prod(col(dyl), col(dyh), eyl, eyh)
    bzl, bzh = _interval_prod(col(dzl), col(dzh), ezl, ezh)
    b_lo = f32(2.0) * (bxl + byl + bzl)
    b_hi = f32(2.0) * (bxh + byh + bzh)
    _, b2_hi = _interval_sq(b_lo, b_hi)

    outside = c_lo > 0
    never_toward = b_lo >= 0
    never_real = b2_hi < f32(4.0) * a_lo * c_lo
    dead = outside & (never_toward | never_real)
    return ~dead


def segment_hull_live_mask(hit_bounds, light_pos, sphere_pos, sphere_rad,
                           inflate=0.0):
    """Conservative occluder liveness per (tile, light): True unless NO
    segment from the tile's hit-point box to the light can pass through the
    sphere.

    The shadow test (hasClearLineOfSight, raytracer.h:272-309) casts a
    segment from hit point P to light L.  A sphere can block some tile ray
    only if it intersects the convex hull of box(P) and the point L, i.e.
    iff distance(hull, center) <= r.  We bound that distance from below:
    for each t in [0,1], points are (1-t)*B + t*L with B in the box; the
    hull's distance to center s >= max over axes of the 1-D hull distance
    ... instead we use the standard conservative form: the hull is
    contained in the box swept toward L, whose distance to s we lower-bound
    by interval arithmetic on |(1-t)(B - s) + t(L - s)|^2 over t in [0,1]
    treated per-component (each component's range is the convex span of
    its endpoints' ranges).

    hit_bounds: [(lo,hi) x3] per-tile arrays for hit x/y/z.
    light_pos: (3,) scalars.  Returns (tiles, N) bool.
    """
    (hxl, hxh), (hyl, hyh), (hzl, hzh) = hit_bounds
    sx, sy, sz = (sphere_pos[:, 0][None, :], sphere_pos[:, 1][None, :],
                  sphere_pos[:, 2][None, :])
    rad = sphere_rad[None, :] + f32(inflate)
    col = lambda v: v[:, None]

    # Per component, the segment's coordinate lies in the convex span of
    # [box_lo, box_hi] and light coordinate: [min(lo, L), max(hi, L)].
    gxl = jnp.minimum(col(hxl), light_pos[0]) - sx
    gxh = jnp.maximum(col(hxh), light_pos[0]) - sx
    gyl = jnp.minimum(col(hyl), light_pos[1]) - sy
    gyh = jnp.maximum(col(hyh), light_pos[1]) - sy
    gzl = jnp.minimum(col(hzl), light_pos[2]) - sz
    gzh = jnp.maximum(col(hzh), light_pos[2]) - sz
    dx2, _ = _interval_sq(gxl, gxh)
    dy2, _ = _interval_sq(gyl, gyh)
    dz2, _ = _interval_sq(gzl, gzh)
    dist2_lo = dx2 + dy2 + dz2
    return dist2_lo <= rad * rad


def pack_tile_scene(live, scene_tbl):
    """Pack live spheres first, per tile.

    live: (tiles, N) bool; scene_tbl: (rows, N) float32 (the kernel's
    scene value table, trace_pallas._scene_tables layout).

    Returns (tiles_tbl (tiles, rows, N) f32, counts (tiles,) i32).  The
    permutation is stable (live spheres keep ascending sphere order, so
    running-min tie-breaks match the unculled loop exactly; dead spheres
    follow, also in order, and are provably unreachable for this tile).
    """
    order = jnp.argsort(~live, axis=1, stable=True)         # (tiles, N)
    counts = jnp.sum(live, axis=1).astype(jnp.int32)
    # Gather columns: tiles_tbl[t, :, i] = scene_tbl[:, order[t, i]].
    tiles_tbl = jnp.take(scene_tbl, order, axis=1)          # (rows,tiles,N)
    tiles_tbl = jnp.transpose(tiles_tbl, (1, 0, 2))
    return tiles_tbl, counts
