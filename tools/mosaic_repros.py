"""Reduced repros for the Mosaic/Pallas-TPU issues hit building raytpu.

Each repro is a minimal pallas_call distilled from a failure that cost
real debugging time in the trace kernels (CLAUDE.md "Mosaic gotchas";
BASELINE.md depth-6 post-mortem).  Run one by name:

    python tools/mosaic_repros.py transpose_hang   # WARNING: hangs compile
    python tools/mosaic_repros.py dynamic_slice_values
    python tools/mosaic_repros.py cond_vector_select
    python tools/mosaic_repros.py sublane_flatten
    python tools/mosaic_repros.py lane_dynamic_gather

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


def lane_dynamic_gather():
    """Per-lane dynamic VMEM addressing: the primitive a ONE-PASS stable
    compaction needs (pack live lanes to the block front at computed
    ranks) and the reason the wavefront keeps the 11-operand lax.sort
    between bounce levels (ROADMAP.md #2).  Both directions of the
    permutation are tried on a VALUE inside the kernel:

      * gather  out[i] = x[idx[i]]  (jnp.take along the packed axis)
      * scatter via a dimension-numbers scatter on the value

    Arbitrary in-register permutation with vector indices has no Mosaic
    lowering (the working alternatives are the sort network, one-hot
    matmuls — O(n^2) per block — or whole-ref pl.ds row slices at SCALAR
    indices, which is what the backward kernel's table gathers use)."""

    def kernel_gather(x_ref, i_ref, o_ref):
        x = x_ref[:]
        idx = i_ref[:]
        o_ref[:] = jnp.take_along_axis(x, idx, axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1), 1)
    try:
        out = _run(kernel_gather,
                   jax.ShapeDtypeStruct((8, 128), jnp.float32), x, idx)
        print("lane-dynamic gather lowered:", np.asarray(out)[0, 0])
    except Exception as e:
        print("lane-dynamic gather FAILED to lower:\n", str(e)[:400])

    def kernel_scatter(x_ref, i_ref, o_ref):
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        flat = x_ref[:].reshape(1, 8 * 128)[0]
        ids = i_ref[:].reshape(1, 8 * 128)[0][:, None]
        o_ref[:] = jax.lax.scatter(
            jnp.zeros((8 * 128,), jnp.float32), ids, flat, dn
        ).reshape(8, 128)

    try:
        out = _run(kernel_scatter,
                   jax.ShapeDtypeStruct((8, 128), jnp.float32), x, idx)
        print("lane-dynamic scatter lowered:", np.asarray(out)[0, 0])
    except Exception as e:
        print("lane-dynamic scatter FAILED to lower:\n", str(e)[:400])


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else ""
    repros = dict(transpose_hang=transpose_hang,
                  dynamic_slice_values=dynamic_slice_values,
                  cond_vector_select=cond_vector_select,
                  sublane_flatten=sublane_flatten,
                  lane_dynamic_gather=lane_dynamic_gather)
    if name not in repros:
        print(__doc__)
        sys.exit(1)
    repros[name]()
