"""TPU probes for the culled-wavefront kernel's two Mosaic risk items.

1. `lax.fori_loop` with a TRACED upper bound (read from an SMEM scalar)
   inside a Pallas kernel — the culled sphere loops need a per-tile trip
   count.
2. A per-grid-step-blocked SMEM input: BlockSpec((1, ROWS, N), t -> (t,0,0),
   memory_space=SMEM) — the per-tile packed scene tables.

Prints PROBE1_OK / PROBE2_OK (or the exception) so the kernel design can
be committed to before the integration work.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, N, LANES = 4, 64, 128
TILES = 4


def probe1():
    def kernel(cnt_ref, x_ref, o_ref):
        n = cnt_ref[0]

        def body(i, acc):
            return acc + x_ref[:] * jnp.float32(1.0 + i)

        o_ref[:] = jax.lax.fori_loop(0, n, body,
                                     jnp.zeros(x_ref.shape, jnp.float32))

    x = jnp.ones((8, LANES), jnp.float32)
    cnt = jnp.array([3], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
    )(cnt, x)
    expect = 1.0 + 2.0 + 3.0
    assert np.allclose(np.asarray(out), expect), out[0, 0]
    print("PROBE1_OK dynamic-bound fori_loop")


def probe2():
    def kernel(tbl_ref, cnt_ref, x_ref, o_ref):
        # Scalar read from the blocked SMEM table + dynamic-bound loop;
        # counts come in unblocked (a (1,1) SMEM block violates the
        # divisible-by-8 rule) and are indexed by program_id.
        n = cnt_ref[pl.program_id(0)]

        def body(i, acc):
            return acc + x_ref[:] * tbl_ref[0, 1, i]

        o_ref[:] = jax.lax.fori_loop(0, n, body,
                                     jnp.zeros(x_ref.shape, jnp.float32))

    tbl = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.float32)[None, None, :], (TILES, ROWS, N)
    ) + jnp.arange(TILES, dtype=jnp.float32)[:, None, None] * 1000.0
    cnt = jnp.full((TILES,), 2, jnp.int32)
    x = jnp.ones((TILES * 8, LANES), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((1, ROWS, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES * 8, LANES), jnp.float32),
    )(tbl, cnt, x)
    out = np.asarray(out)
    for t in range(TILES):
        expect = (t * 1000.0 + 0.0) + (t * 1000.0 + 1.0)
        assert np.allclose(out[t * 8], expect), (t, out[t * 8, 0], expect)
    print("PROBE2_OK blocked SMEM table + per-tile count")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("1", "both"):
        probe1()
    if which in ("2", "both"):
        probe2()
