"""Microbench sphere-loop body variants inside a real Pallas kernel.

Answers two questions before touching the production kernels:
  * is the closest-hit body sqrt-bound (does an rsqrt form help)?
  * does trimming ~3 mul/adds from the quadratic setup (the 2s / |s|^2-r^2
    precompute trick) actually move device time, or do those ops hide
    under the sqrt/select critical path?

Variants, each a fori loop over N spheres on a (ROWS, 128) ray block:
  base     — the production _ray_sphere_t body (sub + dot + sqrt + selects)
  trim     — precomputed 2s and |s|^2 - r^2 rows (3 fewer mul/add per pair)
  rsqrt    — base but root = D * rsqrt(D)
  nosqrt   — base with the sqrt removed entirely (upper bound of any win)
  shadowb  — the root-free shadow body (no sqrt at all)
  shadowt  — shadow body with the same trim

Usage: python tools/body_bench.py [--spheres 256] [--rays 1048576]
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
ROWS = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spheres", type=int, default=256)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    n = args.spheres
    r = args.rays
    rows_total = r // LANES
    tiles = rows_total // ROWS

    def make_kernel(variant):
        def kernel(tbl_ref, *refs):
            (ox, oy, oz, dx, dy, dz), out = refs[:6], refs[6]
            o = tuple(x[:] for x in (ox, oy, oz))
            d = tuple(x[:] for x in (dx, dy, dz))
            a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            inv2a = f32(1.0) / (f32(2.0) * a)
            o2 = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]
            b0 = f32(2.0) * (d[0] * o[0] + d[1] * o[1] + d[2] * o[2])
            big = jnp.full(a.shape, f32(1e4))

            def sqrt_pos(x):
                pos = x > 0
                return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, f32(1.0))),
                                 f32(0.0))

            def body_base(i, carry):
                min_t, idx = carry
                sx, sy, sz, rad = (tbl_ref[0, i], tbl_ref[1, i],
                                   tbl_ref[2, i], tbl_ref[3, i])
                px, py, pz = o[0] - sx, o[1] - sy, o[2] - sz
                b = f32(2.0) * (d[0] * px + d[1] * py + d[2] * pz)
                c = (px * px + py * py + pz * pz) - rad * rad
                radicand = b * b - f32(4.0) * a * c
                has = radicand >= 0
                if variant == "nosqrt":
                    root = radicand
                elif variant == "rsqrt":
                    pos = radicand > 0
                    root = jnp.where(
                        pos, radicand * jax.lax.rsqrt(
                            jnp.where(pos, radicand, f32(1.0))), f32(0.0))
                else:
                    root = sqrt_pos(radicand)
                u0 = (-b + root) * inv2a
                u1 = (-b - root) * inv2a
                t0 = jnp.where(has & (u0 > f32(1e-5)), u0, f32(1e4))
                t1 = jnp.where(has & (u1 > f32(1e-5)), u1, f32(1e4))
                t = jnp.minimum(t0, t1)
                better = t < min_t
                return (jnp.where(better, t, min_t),
                        jnp.where(better, i, idx))

            def body_trim(i, carry):
                min_t, idx = carry
                s2x, s2y, s2z, s2r = (tbl_ref[4, i], tbl_ref[5, i],
                                      tbl_ref[6, i], tbl_ref[7, i])
                b = b0 - (d[0] * s2x + d[1] * s2y + d[2] * s2z)
                c = (o2 + s2r) - (o[0] * s2x + o[1] * s2y + o[2] * s2z)
                radicand = b * b - f32(4.0) * a * c
                has = radicand >= 0
                root = sqrt_pos(radicand)
                u0 = (-b + root) * inv2a
                u1 = (-b - root) * inv2a
                t0 = jnp.where(has & (u0 > f32(1e-5)), u0, f32(1e4))
                t1 = jnp.where(has & (u1 > f32(1e-5)), u1, f32(1e4))
                t = jnp.minimum(t0, t1)
                better = t < min_t
                return (jnp.where(better, t, min_t),
                        jnp.where(better, i, idx))

            def body_shadow(i, blocked):
                sx, sy, sz, rad = (tbl_ref[0, i], tbl_ref[1, i],
                                   tbl_ref[2, i], tbl_ref[3, i])
                ex, ey, ez = o[0] - sx, o[1] - sy, o[2] - sz
                b = f32(2.0) * (d[0] * ex + d[1] * ey + d[2] * ez)
                c = (ex * ex + ey * ey + ez * ez) - rad * rad
                q_eps = (a * f32(1e-5) + b) * f32(1e-5) + c
                q_c = a * f32(1e6) + b * f32(1e3) + c
                neg_e, neg_c = q_eps < 0, q_c < 0
                radicand = b * b - f32(4.0) * a * c
                mb = -b
                vin = (mb > a * f32(2e-5)) & (mb < a * f32(2e3))
                hit = (neg_e != neg_c) | (~neg_e & ~neg_c
                                         & (radicand >= 0) & vin)
                return jnp.where(hit, f32(1.0), blocked)

            def body_shadow_trim(i, blocked):
                s2x, s2y, s2z, s2r = (tbl_ref[4, i], tbl_ref[5, i],
                                      tbl_ref[6, i], tbl_ref[7, i])
                b = b0 - (d[0] * s2x + d[1] * s2y + d[2] * s2z)
                c = (o2 + s2r) - (o[0] * s2x + o[1] * s2y + o[2] * s2z)
                q_eps = (a * f32(1e-5) + b) * f32(1e-5) + c
                q_c = a * f32(1e6) + b * f32(1e3) + c
                neg_e, neg_c = q_eps < 0, q_c < 0
                radicand = b * b - f32(4.0) * a * c
                mb = -b
                vin = (mb > a * f32(2e-5)) & (mb < a * f32(2e3))
                hit = (neg_e != neg_c) | (~neg_e & ~neg_c
                                         & (radicand >= 0) & vin)
                return jnp.where(hit, f32(1.0), blocked)

            if variant in ("base", "trim", "rsqrt", "nosqrt"):
                body = body_trim if variant == "trim" else body_base
                min_t, idx = jax.lax.fori_loop(
                    0, n, body,
                    (big, jnp.full(a.shape, -1, jnp.int32)))
                out[:] = min_t + idx.astype(f32)
            else:
                body = (body_shadow_trim if variant == "shadowt"
                        else body_shadow)
                out[:] = jax.lax.fori_loop(
                    0, n, body, jnp.zeros(a.shape, f32))

        return kernel

    rng = np.random.default_rng(0)
    tbl = np.zeros((8, n), np.float32)
    tbl[0:3] = rng.uniform(-40, 40, (3, n))
    tbl[3] = rng.uniform(0.5, 3.0, n)
    tbl[4:7] = 2.0 * tbl[0:3]
    tbl[7] = (tbl[0] ** 2 + tbl[1] ** 2 + tbl[2] ** 2) - tbl[3] ** 2
    tbl = jnp.asarray(tbl)
    fields = tuple(jnp.asarray(rng.standard_normal(r).astype(np.float32))
                   for _ in range(6))

    out = {}
    for variant in ("base", "trim", "rsqrt", "nosqrt", "shadowb", "shadowt"):
        fn = pl.pallas_call(
            make_kernel(variant),
            grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        )

        @jax.jit
        def run(tbl, *fields, _fn=fn):
            x = _fn(tbl, *(f.reshape(rows_total, LANES) for f in fields))
            return jnp.sum(x)

        def timed(salt):
            fs = (fields[0] + salt,) + fields[1:]
            return float(run(tbl, *fs))

        timed(jnp.float32(0.0))  # compile
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            timed(jnp.float32(i) * 1e-30)
            ts.append(time.perf_counter() - t0)
        out[variant + "_ms"] = round(min(ts) * 1e3, 2)

    out.update(spheres=n, rays=r)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
