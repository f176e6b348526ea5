"""MXU closest-hit experiment (ROADMAP #3 / VERDICT r4 next-step 6).

The wavefront level kernels are 52% of a chunk and sit at ~0.35 est. VPU
MFU — compare/select-bound, not flop-bound (BASELINE.md round-2 studies).
The one untested idea against that ceiling: compute the ray-sphere
quadratic coefficients on the MXU.  With P = O - S,

    b = 2 (D.O - D.S_i),   c = |O|^2 - 2 O.S_i + (|S_i|^2 - r_i^2),

so the per-(ray, sphere) dot products D.S_i and O.S_i are two
(N, 3) x (3, B) matmuls per ray block — the only MXU-shaped work in the
whole tracer — and the per-iteration VPU body shrinks from ~19 coefficient
flops to ~6 (the sqrt/select tail is identical in both forms).

This tool A/Bs two standalone Pallas kernels producing (min_t, winner idx)
per ray over N spheres (the production argmin contract,
trace_pallas._closest_hit_idx; raySphere semantics raytracer.h:81-141):

  A: the production form — fori over spheres, coefficients recomputed
     per iteration from SMEM scalars, rays as (BR, 128) tiles;
  B: the MXU form — rays lane-flattened to (3, B) once, two dot_generals
     into a VMEM scratch, then the same fori reading precomputed
     dot-product rows (pl.ds on the scratch ref; values can't be
     dynamically sliced — CLAUDE.md Mosaic notes).

Reports device time by the K-in-one-jit slope method with a FLOAT salt
per iteration (integer salts CSE away — tools/glue_bench.py lesson) and
cross-checks the two kernels' argmin agreement (FMA/reassociation can
flip near-threshold winners on a measure-zero set; agreement is counted,
not asserted bitwise).

Run (TPU): python tools/mxu_level_bench.py [--n 256] [--rays 2097152]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128
_BIG_T = 1e30
_MAX_DIST = 10000.0
_EPS_RAY = 1e-5


def _kernels(n: int, br: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    B = br * LANES

    def kernel_a(scene_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 t_ref, idx_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        a = dx * dx + dy * dy + dz * dz
        inv2a = f32(1.0) / jnp.where(a == 0, f32(1.0), f32(2.0) * a)

        def body(i, carry):
            min_t, idx = carry
            cx = scene_ref[0, i]
            cy = scene_ref[1, i]
            cz = scene_ref[2, i]
            rad = scene_ref[3, i]
            px, py, pz = ox - cx, oy - cy, oz - cz
            b = f32(2.0) * (dx * px + dy * py + dz * pz)
            c = (px * px + py * py + pz * pz) - rad * rad
            radicand = b * b - f32(4.0) * a * c
            has_real = radicand >= 0
            root = jnp.sqrt(jnp.maximum(radicand, f32(0.0)))
            u0 = (-b + root) * inv2a
            u1 = (-b - root) * inv2a
            t0 = jnp.where(has_real & (u0 > _EPS_RAY), u0, f32(_BIG_T))
            t1 = jnp.where(has_real & (u1 > _EPS_RAY), u1, f32(_BIG_T))
            t = jnp.minimum(t0, t1)
            better = (t < f32(_BIG_T)) & (t < min_t)
            return (jnp.where(better, t, min_t),
                    jnp.where(better, f32(i), idx))

        big = jnp.full(ox.shape, f32(_MAX_DIST))
        neg = jnp.full(ox.shape, f32(-1.0))
        min_t, idx = jax.lax.fori_loop(0, n, body, (big, neg))
        t_ref[:] = min_t
        idx_ref[:] = idx

    def kernel_b(cc_ref, st_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                 dz_ref, t_ref, idx_ref, g1_ref, g2_ref):
        flat = lambda r: r[:].reshape(1, B)
        om = jnp.concatenate([flat(ox_ref), flat(oy_ref), flat(oz_ref)],
                             axis=0)
        dm = jnp.concatenate([flat(dx_ref), flat(dy_ref), flat(dz_ref)],
                             axis=0)
        st = st_ref[:]                      # (N, 3) pre-transposed centers
        dn = (((1,), (0,)), ((), ()))
        g1_ref[:] = jax.lax.dot_general(st, dm, dn,
                                        preferred_element_type=f32)
        g2_ref[:] = jax.lax.dot_general(st, om, dn,
                                        preferred_element_type=f32)
        doto = jnp.sum(dm * om, axis=0, keepdims=True)
        oo = jnp.sum(om * om, axis=0, keepdims=True)
        a = jnp.sum(dm * dm, axis=0, keepdims=True)
        inv2a = f32(1.0) / jnp.where(a == 0, f32(1.0), f32(2.0) * a)

        def body(i, carry):
            min_t, idx = carry
            g1 = g1_ref[pl.ds(i, 1), :]
            g2 = g2_ref[pl.ds(i, 1), :]
            b = f32(2.0) * (doto - g1)
            c = oo - f32(2.0) * g2 + cc_ref[0, i]
            radicand = b * b - f32(4.0) * a * c
            has_real = radicand >= 0
            root = jnp.sqrt(jnp.maximum(radicand, f32(0.0)))
            u0 = (-b + root) * inv2a
            u1 = (-b - root) * inv2a
            t0 = jnp.where(has_real & (u0 > _EPS_RAY), u0, f32(_BIG_T))
            t1 = jnp.where(has_real & (u1 > _EPS_RAY), u1, f32(_BIG_T))
            t = jnp.minimum(t0, t1)
            better = (t < f32(_BIG_T)) & (t < min_t)
            return (jnp.where(better, t, min_t),
                    jnp.where(better, f32(i), idx))

        big = jnp.full((1, B), f32(_MAX_DIST))
        neg = jnp.full((1, B), f32(-1.0))
        min_t, idx = jax.lax.fori_loop(0, n, body, (big, neg))
        t_ref[:] = min_t.reshape(br, LANES)
        idx_ref[:] = idx.reshape(br, LANES)

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def run_a(scene_tbl, rays, interpret=False):
        rows = rays[0].shape[0] // LANES
        tiles = rows // br
        r2 = tuple(x.reshape(rows, LANES) for x in rays)
        blk = pl.BlockSpec((br, LANES), lambda t: (t, 0),
                           memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel_a, grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk] * 6,
            out_specs=(blk, blk),
            out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((rows, LANES), jnp.float32)),
            interpret=interpret,
        )(scene_tbl, *r2)
        return tuple(o.reshape(-1) for o in outs)

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def run_b(scene_tbl, rays, interpret=False):
        rows = rays[0].shape[0] // LANES
        tiles = rows // br
        r2 = tuple(x.reshape(rows, LANES) for x in rays)
        # Host-side prep (once per scene): transposed centers + the
        # per-sphere constant |S|^2 - r^2 as an SMEM row.
        st = scene_tbl[:3].T                          # (N, 3)
        cc = (jnp.sum(st * st, axis=1)
              - scene_tbl[3] * scene_tbl[3]).reshape(1, n)
        blk = pl.BlockSpec((br, LANES), lambda t: (t, 0),
                           memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel_b, grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)] + [blk] * 6,
            out_specs=(blk, blk),
            out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((rows, LANES), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((n, B), jnp.float32),
                            pltpu.VMEM((n, B), jnp.float32)],
            interpret=interpret,
        )(cc, st, *r2)
        return tuple(o.reshape(-1) for o in outs)

    return run_a, run_b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--rays", type=int, default=1 << 21)
    ap.add_argument("--block-rows", type=int, default=16,
                    help="ray rows per grid step (B = rows*128; the MXU "
                         "form's scratch is 2 * N * B floats)")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode correctness check only")
    args = ap.parse_args()

    import numpy as np

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from raytpu.config import RenderConfig
    from raytpu.kernels.trace_pallas import _scene_tables
    from raytpu.scene import random_scene
    from raytpu.trace import camera_rays

    interpret = jax.default_backend() != "tpu"
    n, r = args.n, args.rays
    scene = random_scene(n, seed=args.seed)
    scene_tbl, _, _ = _scene_tables(scene)

    # Real camera rays (config-5 geometry) so hit rates and winner
    # distributions match the production workload, tiled to `rays`.
    cfg = RenderConfig(width=1920, height=1080, max_depth=6)
    gid = jnp.arange(r, dtype=jnp.int32) % cfg.num_pixels
    d = camera_rays(cfg, 0, 0, gid)          # camera at the origin
    z = jnp.zeros((r,), jnp.float32)
    rays = (z, z, z, d[:, 0], d[:, 1], d[:, 2])

    run_a, run_b = _kernels(n, args.block_rows)

    ta, ia = run_a(scene_tbl, rays, interpret=interpret)
    tb, ib = run_b(scene_tbl, rays, interpret=interpret)
    ta, ia, tb, ib = (np.asarray(x) for x in (ta, ia, tb, ib))
    agree = float((ia == ib).mean())
    tdiff = float(np.max(np.abs(np.where(ta < _MAX_DIST, ta, 0)
                                - np.where(tb < _MAX_DIST, tb, 0))))
    out = dict(n=n, rays=r, block_rows=args.block_rows,
               idx_agree_frac=round(agree, 6),
               max_t_diff=tdiff)

    if not interpret:
        def slope(run):
            def rep(k):
                def body(rays0):
                    total = jnp.float32(0.0)
                    for i in range(k):
                        salted = (rays0[0] + jnp.float32(i * 1e-30),
                                  ) + rays0[1:]
                        t, idx = run(scene_tbl, salted, interpret=False)
                        total = total + jnp.sum(t * 1e-30) + jnp.sum(idx)
                    return total
                return jax.jit(body)

            f1, fk = rep(1), rep(args.k)
            float(f1(rays)), float(fk(rays))

            def best(f):
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(f(rays))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            return (best(fk) - best(f1)) / (args.k - 1)

        sa = slope(run_a)
        sb = slope(run_b)
        out.update(
            a_fori_ms=round(sa * 1e3, 3),
            b_mxu_ms=round(sb * 1e3, 3),
            a_grays_per_s=round(r / sa / 1e9, 2),
            b_grays_per_s=round(r / sb / 1e9, 2),
            b_over_a=round(sb / sa, 3),
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
