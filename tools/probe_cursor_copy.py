"""Probe: sequential-grid Pallas kernel writing a static-size block at a
DYNAMIC row offset into a revisited full-array output (the cursor-copy
pattern for block-local compaction)."""
import functools, json, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BS_ROWS = 8          # block rows per grid step
T = 4                # grid steps
OUT_ROWS = 24        # < T*BS_ROWS: forces overlap + skip

def kernel(starts_ref, ok_ref, x_ref, o_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.full(o_ref.shape, -1.0, jnp.float32)

    @pl.when(ok_ref[t] > 0)
    def _():
        s = starts_ref[t]
        o_ref[pl.ds(s, BS_ROWS), :] = x_ref[:]

@functools.partial(jax.jit, static_argnames=("interpret",))
def run(starts, ok, x, interpret=False):
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((BS_ROWS, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((OUT_ROWS + BS_ROWS, LANES), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS + BS_ROWS, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(starts, ok, x)

interpret = jax.default_backend() != "tpu"
x = jnp.arange(T * BS_ROWS * LANES, dtype=jnp.float32).reshape(
    T * BS_ROWS, LANES)
# non-aligned starts on purpose (rows 0, 5, 11, 26->skip)
starts = jnp.asarray([0, 5, 11, 26], jnp.int32)
ok = jnp.asarray([1, 1, 1, 0], jnp.int32)
out = np.asarray(run(starts, ok, x, interpret=interpret))
want = np.full((OUT_ROWS + BS_ROWS, LANES), -1.0, np.float32)
for t, (s, o) in enumerate(zip([0, 5, 11, 26], [1, 1, 1, 0])):
    if o:
        want[s:s + BS_ROWS] = np.asarray(x[t * BS_ROWS:(t + 1) * BS_ROWS])
print(json.dumps({"interpret": interpret,
                  "exact": bool(np.array_equal(out, want)),
                  "max_diff": float(np.abs(out - want).max())}))
