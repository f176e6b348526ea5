"""Bisect which wavefront-v2 glue op crashes the TPU worker at 1080p
shapes.  Stages run separately with a sync + print between each, so the
crash log shows the last op that survived.

    python tools/probe_glue_crash.py [stage]

Stages: sort2 (4M 2-op sort), take (4M,15 row gather to 2M),
scatter (2M,3 scatter-add into 2073600x3), all.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 22
CAP = 1 << 21
NPIX = 1920 * 1080
N_STATE = 14


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 30, R, dtype=np.int32))
    print("data ready", flush=True)

    if which in ("sort2", "all"):
        @jax.jit
        def f_sort(key):
            iota = jax.lax.iota(jnp.int32, R)
            k2, perm = jax.lax.sort((key, iota), num_keys=1,
                                    is_stable=False)
            return perm

        perm = f_sort(key)
        print("sort2 ok", sync(perm), flush=True)

    if which in ("take", "all"):
        state = tuple(jnp.asarray(rng.random(R, dtype=np.float32))
                      for _ in range(N_STATE + 1))

        @jax.jit
        def f_take(perm, *state):
            aos = jnp.stack(state, axis=1)
            return jnp.take(aos, perm[:CAP], axis=0)

        perm = jnp.asarray(rng.permutation(R).astype(np.int32))
        picked = f_take(perm, *state)
        print("take ok", sync(picked), flush=True)

    if which in ("scatter", "all"):
        pid = jnp.sort(jnp.asarray(
            rng.integers(0, NPIX, CAP, dtype=np.int32)))
        em = tuple(jnp.asarray(rng.random(CAP, dtype=np.float32))
                   for _ in range(3))
        acc = jnp.zeros((NPIX, 3), jnp.float32)

        @jax.jit
        def f_scat(acc, pid, e0, e1, e2):
            ev = jnp.stack((e0, e1, e2), axis=1)
            return acc.at[pid].add(ev, indices_are_sorted=True)

        out = f_scat(acc, pid, *em)
        print("scatter ok", sync(out), flush=True)

    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
