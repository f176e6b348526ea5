"""Conservativeness proofs-by-sampling for the wavefront culling module.

The contract culling must keep: a sphere marked dead for a tile can NEVER
be hit (beam mask) / never occlude (segment mask) for ANY ray in the
tile's bounds — otherwise culled renders would differ from the dense
kernel.  These tests hammer that with adversarial random tiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.kernels.culling import (
    beam_live_mask,
    bin_key,
    pack_tile_scene,
    scene_bounds,
    segment_hull_live_mask,
    tile_bounds,
)

jax.config.update("jax_platforms", "cpu")


def _ray_hits_sphere(o, d, c, r):
    """Reference hit test (raySphere semantics, eps root cutoff)."""
    p = o - c
    a = d @ d
    b = 2.0 * (d @ p)
    cc = p @ p - r * r
    rad = b * b - 4 * a * cc
    if rad < 0:
        return False
    root = np.sqrt(rad)
    for u in ((-b + root) / (2 * a), (-b - root) / (2 * a)):
        if u > 1e-5:
            return True
    return False


def _random_tiles(rng, n_tiles, rays_per_tile, coherent=True, targets=None):
    """Tiles of rays with tunable coherence (tight boxes exercise culling;
    loose boxes exercise conservativeness).  With `targets` (M, 3), half
    the tiles aim at a random target so hits actually occur."""
    origins, dirs = [], []
    for t in range(n_tiles):
        o0 = rng.uniform(-40, 40, 3)
        if targets is not None and t % 2 == 0:
            d0 = targets[rng.integers(len(targets))] - o0
        else:
            d0 = rng.normal(size=3)
        d0 /= np.linalg.norm(d0)
        o_spread = 10 ** rng.uniform(-2, 1 if coherent else 2)
        d_spread = 10 ** rng.uniform(-3, -0.5 if coherent else 0.5)
        o = o0 + rng.uniform(-o_spread, o_spread, (rays_per_tile, 3))
        d = d0 + rng.uniform(-d_spread, d_spread, (rays_per_tile, 3))
        origins.append(o)
        dirs.append(d)
    return np.asarray(origins, np.float32), np.asarray(dirs, np.float32)


def test_beam_mask_conservative():
    rng = np.random.default_rng(0)
    n_tiles, rpt, n_sph = 24, 16, 40
    pos = rng.uniform(-45, 45, (n_sph, 3)).astype(np.float32)
    rad = rng.uniform(0.3, 6.0, n_sph).astype(np.float32)
    o, d = _random_tiles(rng, n_tiles, rpt, targets=pos)

    fields = [jnp.asarray(o[..., i].reshape(-1)) for i in range(3)] + \
             [jnp.asarray(d[..., i].reshape(-1)) for i in range(3)]
    live = np.asarray(beam_live_mask(tile_bounds(fields, rpt),
                                     jnp.asarray(pos), jnp.asarray(rad)))
    assert live.shape == (n_tiles, n_sph)

    n_hits = 0
    for t in range(n_tiles):
        for s in range(n_sph):
            hit_any = any(_ray_hits_sphere(o[t, i], d[t, i], pos[s], rad[s])
                          for i in range(rpt))
            if hit_any:
                n_hits += 1
                assert live[t, s], (
                    f"tile {t} can hit sphere {s} but culling killed it")
    assert n_hits > 10  # the test actually exercised hits


def test_beam_mask_culls_something():
    """Coherent tiles in a sparse scene must actually kill most pairs."""
    rng = np.random.default_rng(1)
    n_tiles, rpt = 16, 16
    o, d = _random_tiles(rng, n_tiles, rpt, coherent=True)
    pos = rng.uniform(-45, 45, (64, 3)).astype(np.float32)
    rad = rng.uniform(0.3, 2.0, 64).astype(np.float32)
    fields = [jnp.asarray(o[..., i].reshape(-1)) for i in range(3)] + \
             [jnp.asarray(d[..., i].reshape(-1)) for i in range(3)]
    live = np.asarray(beam_live_mask(tile_bounds(fields, rpt),
                                     jnp.asarray(pos), jnp.asarray(rad)))
    assert live.mean() < 0.5


def test_segment_mask_conservative():
    rng = np.random.default_rng(2)
    n_tiles, ppt, n_sph = 16, 16, 32
    pts = rng.uniform(-30, 30, (n_tiles, 1, 3)) + \
        rng.uniform(-3, 3, (n_tiles, ppt, 3))
    pts = pts.astype(np.float32)
    light = rng.uniform(-60, 60, 3).astype(np.float32)
    pos = rng.uniform(-45, 45, (n_sph, 3)).astype(np.float32)
    rad = rng.uniform(0.5, 6.0, n_sph).astype(np.float32)

    fields = [jnp.asarray(pts[..., i].reshape(-1)) for i in range(3)]
    live = np.asarray(segment_hull_live_mask(
        tile_bounds(fields, ppt), jnp.asarray(light),
        jnp.asarray(pos), jnp.asarray(rad)))

    def seg_hits(p, l, c, r):
        # closest point of segment [p, l] to c within distance r?
        v = l - p
        t = np.clip(np.dot(c - p, v) / np.dot(v, v), 0.0, 1.0)
        q = p + t * v
        return np.linalg.norm(q - c) <= r

    n_hits = 0
    for t in range(n_tiles):
        for s in range(n_sph):
            any_block = any(seg_hits(pts[t, i], light, pos[s], rad[s])
                            for i in range(ppt))
            if any_block:
                n_hits += 1
                assert live[t, s]
    assert n_hits > 5


def test_pack_tile_scene_stable_prefix():
    rng = np.random.default_rng(3)
    tiles, n, rows = 5, 12, 4
    live = rng.random((tiles, n)) < 0.4
    tbl = rng.normal(size=(rows, n)).astype(np.float32)
    packed, counts = pack_tile_scene(jnp.asarray(live), jnp.asarray(tbl))
    packed, counts = np.asarray(packed), np.asarray(counts)
    assert packed.shape == (tiles, rows, n)
    for t in range(tiles):
        idx_live = np.flatnonzero(live[t])
        assert counts[t] == len(idx_live)
        # live prefix in ascending sphere order (tie-break preservation)
        np.testing.assert_array_equal(packed[t, :, :counts[t]],
                                      tbl[:, idx_live])
        # remainder is the dead spheres, also in order (a permutation)
        idx_dead = np.flatnonzero(~live[t])
        np.testing.assert_array_equal(packed[t, :, counts[t]:],
                                      tbl[:, idx_dead])


def test_bin_key_groups_by_cell_and_octant():
    lo, span = scene_bounds(np.array([[0.0, 0.0, 0.0], [8.0, 8.0, 8.0]]),
                            np.array([1.0, 1.0]))
    ox = jnp.asarray(np.array([0.0, 0.1, 8.0], np.float32))
    oy = jnp.zeros(3, jnp.float32)
    oz = jnp.zeros(3, jnp.float32)
    dx = jnp.asarray(np.array([1.0, 1.0, -1.0], np.float32))
    dy = jnp.ones(3, jnp.float32)
    dz = jnp.ones(3, jnp.float32)
    k = np.asarray(bin_key(ox, oy, oz, dx, dy, dz, lo, span))
    assert k[0] == k[1]          # same cell, same octant
    assert k[0] != k[2]          # different cell and octant
    assert (k >= 0).all() and (k < (1 << 12)).all()
