"""Can f32-encoded residuals carry a differentiated lax.cond through
Mosaic?  (VERDICT r4 next-step 3 / ROADMAP #5.)

The full-tree backward was rejected in round 3 partly because
differentiating through the liveness conds produces a transposed scf.if
whose RESIDUAL outputs include vector-i1 masks (select predicates from
jnp.where / jnp.minimum inside the branch), which Mosaic fails to
legalize ("failed to legalize operation 'scf.if'", v5e).  The untried
middle ground: write the branch so every value the transpose needs is
f32 — masks as (cmp).astype(f32) consumed by exact arithmetic blending
a*m + b*(1-m) (exact for finite operands: a*1=a, b*0=0, a+0=a) — so the
partial-eval residual set crossing the cond boundary is f32-only.

Three kernels, each jax.vjp-ing THROUGH a result-carrying lax.cond whose
live branch mimics one bounce level's op mix:

  where_form  — jnp.where / jnp.minimum (i1 residuals; expected to fail)
  blend_form  — f32-mask blending (f32 residuals; the experiment)
  nocond      — the blend branch with no cond (control; must pass)

Run (TPU): python tools/probe_cond_f32_residuals.py
Each variant prints PASS / the first Mosaic error line; off-TPU runs
interpret mode (all pass — the question is Mosaic legalization only).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def _branch_where(x):
    """One bounce level's op mix, select-heavy (the production form)."""
    t0 = x * f32(2.0) + f32(1.0)
    t1 = x * x - f32(0.5)
    t = jnp.minimum(t0, t1)                      # i1 residual (le mask)
    ok = t > f32(0.25)
    root = jnp.sqrt(jnp.maximum(x * x + f32(1e-3), f32(0.0)))
    y = jnp.where(ok, t * root, x * f32(0.0))    # i1 residual (pred)
    denom = jnp.where(x == 0, f32(1.0), x)       # i1 residual (guard)
    y = y + jnp.where(x == 0, f32(0.0), y / denom)
    return y


def _branch_blend(x):
    """The same function with every mask f32 and every select an exact
    arithmetic blend — the residual set is f32-only."""
    t0 = x * f32(2.0) + f32(1.0)
    t1 = x * x - f32(0.5)
    mmin = (t0 <= t1).astype(f32)
    t = t0 * mmin + t1 * (f32(1.0) - mmin)
    ok = (t > f32(0.25)).astype(f32)
    root = jnp.sqrt(x * x + f32(1e-3))           # argument > 0 by design
    y = (t * root) * ok                          # + 0 * dead — elided
    mz = (x == 0).astype(f32)
    denom = f32(1.0) * mz + x * (f32(1.0) - mz)  # exact guard blend
    y = y + (y / denom) * (f32(1.0) - mz)
    return y


def _make_kernel(branch, guarded: bool):
    def kernel(x_ref, y_ref, g_ref):
        x = x_ref[:]

        def fn(x_):
            if not guarded:
                return jnp.sum(branch(x_))

            def live(v):
                return jnp.sum(branch(v))

            def dead(v):
                return jnp.sum(v * f32(0.0))

            return jax.lax.cond(jnp.max(x_) > 0, live, dead, x_)

        y, vjp = jax.vjp(fn, x)
        (gx,) = vjp(f32(1.0))
        y_ref[0, 0] = y
        g_ref[:] = gx

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "interpret"))
def _run(x, variant: str, interpret: bool):
    branch = _branch_where if variant.startswith("where") else _branch_blend
    guarded = variant != "nocond"
    return pl.pallas_call(
        _make_kernel(branch, guarded),
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct(x.shape, jnp.float32)),
        interpret=interpret,
    )(x)


def main():
    interpret = jax.default_backend() != "tpu"
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 128)).astype(np.float32))
    # Eager reference gradient (pure jnp, no pallas).
    ref_y, ref_vjp = jax.vjp(lambda v: jnp.sum(_branch_blend(v)), x)
    (ref_g,) = ref_vjp(f32(1.0))

    results = {}
    for variant in ("nocond", "where_form", "blend_form"):
        try:
            y, g = _run(x, variant, interpret)
            ok_y = abs(float(y[0, 0]) - float(ref_y)) <= 1e-3 * abs(
                float(ref_y))
            gerr = float(jnp.max(jnp.abs(g - ref_g)))
            results[variant] = {
                "status": "PASS",
                "y_matches_ref": bool(ok_y),
                "max_grad_err_vs_ref": gerr,
            }
        except Exception as e:  # noqa: BLE001 - we want the Mosaic error
            msg = str(e)
            first = next((l for l in msg.splitlines()
                          if "legalize" in l or "error" in l.lower()),
                         msg.splitlines()[0] if msg else repr(e))
            results[variant] = {"status": "FAIL", "error": first[:300]}
            if os.environ.get("PROBE_VERBOSE"):
                traceback.print_exc()
    print(json.dumps({"interpret": interpret, "results": results}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
