"""Reduced repros for the Mosaic/Pallas-TPU issues hit building raytpu.

Each repro is a minimal pallas_call distilled from a failure that cost
real debugging time in the trace kernels (CLAUDE.md "Mosaic gotchas";
BASELINE.md depth-6 post-mortem).  Run one by name:

    python tools/mosaic_repros.py transpose_hang   # WARNING: hangs compile
    python tools/mosaic_repros.py dynamic_slice_values
    python tools/mosaic_repros.py cond_vector_select
    python tools/mosaic_repros.py sublane_flatten

Observed on jax 0.8.x / libtpu v5e (remote-compile path).  Status of each:

* transpose_hang — `jnp.transpose` of a 2-D VMEM value inside a kernel
  never returns from Mosaic compilation (no error, no timeout).  The
  workaround everywhere in raytpu is to pass pre-transposed tables as
  kernel inputs (trace_pallas._scene_tables).
* dynamic_slice_values — `jax.lax.dynamic_slice` on a VALUE (loaded
  array) fails to lower ("not implemented"), while the same slice
  expressed on the REF via `pl.ds` works; raytpu uses ref slicing only.
* cond_vector_select — a result-carrying `lax.cond` whose branches
  return vectors reaches Mosaic as a vector-operand `arith.select` on a
  scalar i1 predicate, which fails to legalize; the ref-writing
  `pl.when` form of the same branch lowers fine (wavefront.py kernels).
* sublane_flatten — reshaping (R, 128) -> (R*128, 1) (sublane-major
  flatten) fails to lower while (R, 128) -> (1, R*128) (lane-major)
  works; the backward kernel's gather tables are laid out lane-major
  because of this.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(kernel, out_shape, *args, **kw):
    return pl.pallas_call(kernel, out_shape=out_shape, **kw)(*args)


def transpose_hang():
    """In-kernel 2-D transpose of a VMEM value: compile never returns."""

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (1, 0))

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    print("compiling (expected: HANGS on the remote Mosaic compiler)...")
    out = _run(kernel, jax.ShapeDtypeStruct((128, 8), jnp.float32), x)
    print("unexpectedly returned", np.asarray(out).sum())


def dynamic_slice_values():
    """dynamic_slice on a loaded VALUE: no TC lowering (ref slicing works)."""

    def kernel(i_ref, x_ref, o_ref):
        x = x_ref[:]                       # VALUE
        o_ref[:] = jax.lax.dynamic_slice(x, (i_ref[0], 0), (8, 128))

    x = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    i = jnp.array([8], jnp.int32)
    try:
        out = _run(kernel, jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   i, x,
                   in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                             pl.BlockSpec(memory_space=pltpu.VMEM)],
                   out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        print("value dynamic_slice lowered:", np.asarray(out)[0, 0])
    except Exception as e:
        print("value dynamic_slice FAILED to lower:\n", str(e)[:400])

    def kernel_ref(i_ref, x_ref, o_ref):
        o_ref[:] = x_ref[pl.ds(i_ref[0], 8), :]   # REF slice: works

    out = _run(kernel_ref, jax.ShapeDtypeStruct((8, 128), jnp.float32),
               i, x,
               in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                         pl.BlockSpec(memory_space=pltpu.VMEM)],
               out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    assert float(np.asarray(out)[0, 0]) == 8 * 128
    print("ref pl.ds slice lowered fine")


def cond_vector_select():
    """Result-carrying lax.cond -> vector arith.select: fails to legalize;
    the pl.when ref-writing form of the same branch works."""

    def kernel_cond(x_ref, o_ref):
        alive = jnp.max(x_ref[:]) > 0

        o_ref[:] = jax.lax.cond(
            alive, lambda: x_ref[:] * 2.0,
            lambda: jnp.zeros(x_ref.shape, jnp.float32))

    x = jnp.ones((8, 128), jnp.float32)
    try:
        out = _run(kernel_cond, jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   x)
        print("cond form lowered:", np.asarray(out)[0, 0])
    except Exception as e:
        print("cond form FAILED:\n", str(e)[:400])

    def kernel_when(x_ref, o_ref):
        alive = jnp.max(x_ref[:]) > 0

        @pl.when(alive)
        def _():
            o_ref[:] = x_ref[:] * 2.0

        @pl.when(jnp.logical_not(alive))
        def _():
            o_ref[:] = jnp.zeros(o_ref.shape, jnp.float32)

    out = _run(kernel_when, jax.ShapeDtypeStruct((8, 128), jnp.float32), x)
    assert float(np.asarray(out)[0, 0]) == 2.0
    print("pl.when form lowered fine")


def sublane_flatten():
    """(R,128)->(R*128,1) reshape fails; (R,128)->(1,R*128) works."""

    def kernel_bad(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(8 * 128, 1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    try:
        out = _run(kernel_bad, jax.ShapeDtypeStruct((8 * 128, 1),
                                                    jnp.float32), x)
        print("sublane flatten lowered:", np.asarray(out)[1, 0])
    except Exception as e:
        print("sublane flatten FAILED:\n", str(e)[:400])

    def kernel_ok(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(1, 8 * 128)

    out = _run(kernel_ok, jax.ShapeDtypeStruct((1, 8 * 128), jnp.float32), x)
    assert float(np.asarray(out)[0, 1]) == 1.0
    print("lane flatten lowered fine")


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else ""
    repros = dict(transpose_hang=transpose_hang,
                  dynamic_slice_values=dynamic_slice_values,
                  cond_vector_select=cond_vector_select,
                  sublane_flatten=sublane_flatten)
    if name not in repros:
        print(__doc__)
        sys.exit(1)
    repros[name]()
