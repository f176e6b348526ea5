"""Micro-bench: exact segmented pre-reduction of the emission scatter.

The round-4 in-frame trace (tools/chunk_profile.py) attributes ~44% of a
wavefront chunk to the per-level emission scatter-adds even in their
live-prefix-switch form (~12 ms/level at cap 786K).  The scatter's cost
is ~3 ns per scattered ELEMENT, value-independent — so the only lever
left is scattering FEWER elements.  The emissions of one level are keyed
by an already PID-SORTED ray array (the previous level's compaction), and
a chunk's rays cover at most chunk//samples_per_pixel + 2 distinct pixels
(contiguous ids mod npix), i.e. ~58K distinct pids for 1.5M rays at the
benchmark config: a 12-26x reduction is available by summing each pid's
run first and scattering one element per run.

Exact pipeline measured here (all lane-dense 1-D ops):
  1. seg-scan: log2(r) roll/compare/add steps turn (em, pid-sorted) into
     run-inclusive sums; the run's LAST element holds its total.
  2. boundary mask: pid != roll(pid, -1).
  3. boundary compaction: one 4-operand co-sort by (not-boundary, pid) —
     run totals land in a sorted prefix of length <= n_unique.
  4. short scatter: scatter-add only a static prefix of
     ceil(chunk/samples)+pad elements.

Compared against the shipped switch-prefix scatter and the plain scatter
(both at the same element count), and each stage solo.  Solo numbers
understate composed programs ~2-3x (CLAUDE.md) — this tool SELECTS a
candidate; only an end-to-end frame A/B decides.

Usage: python tools/segsum_bench.py [--rays 1572864] [--uniq 58256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scatter_bench import slope_time  # noqa: E402  (same slope harness)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=3 * (1 << 19))
    ap.add_argument("--uniq", type=int, default=(1 << 19) // 9 + 2)
    ap.add_argument("--npix", type=int, default=1920 * 1080)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    r, npix = args.rays, args.npix
    uniq = args.uniq
    # Sorted pids over a contiguous ~uniq-pixel window, ~r/uniq rays per
    # pid (the post-compaction distribution, roughly).
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    pid = jnp.sort(jax.random.randint(ks[0], (r,), 0, uniq, jnp.int32))
    em = tuple(jax.random.uniform(ks[1 + c], (r,), jnp.float32)
               for c in range(3))
    acc = tuple(jnp.zeros((npix,), jnp.float32) for _ in range(3))

    steps = max(1, (r - 1).bit_length())
    # static scatter prefix: next multiple of 1024 >= uniq
    pref = -(-uniq // 1024) * 1024

    out = {"rays": r, "uniq": uniq, "npix": npix, "segscan_steps": steps,
           "prefix": pref}

    def run(name, fn, a):
        out[name + "_ms"] = round(slope_time(fn, a) * 1e3, 2)

    def segscan(em_, pid_, salt):
        e = [em_[0] + salt, em_[1], em_[2]]
        for k in range(steps):
            sh = 1 << k
            same = pid_ == jnp.roll(pid_, sh)
            # positions < sh wrap around; their "same" compare is against
            # the array tail — mask by index
            ok = same & (jnp.arange(r, dtype=jnp.int32) >= sh)
            e = [x + jnp.where(ok, jnp.roll(x, sh), jnp.float32(0.0))
                 for x in e]
        return tuple(e)

    def boundary(em_, pid_, salt):
        e = segscan(em_, pid_, salt)
        last = pid_ != jnp.roll(pid_, -1)
        last = last | (jnp.arange(r, dtype=jnp.int32) == r - 1)
        return tuple(jnp.where(last, x, jnp.float32(0.0)) for x in e), last

    def full_pipeline(acc_, em_, pid_, salt):
        bs, last = boundary(em_, pid_, salt)
        sort_key = jnp.where(last, pid_, jnp.int32(1 << 30))
        srt = jax.lax.sort((sort_key,) + bs, num_keys=1, is_stable=False)
        kp = jnp.minimum(srt[0][:pref], jnp.int32(npix - 1))
        return tuple(a.at[kp].add(x[:pref]) for a, x in zip(acc_, srt[1:]))

    def small_sort_only(em_, pid_, salt):
        e = (em_[0] + salt,) + em_[1:]
        srt = jax.lax.sort((pid_,) + e, num_keys=1, is_stable=False)
        return srt[1:]

    def prefix_scatter_only(acc_, em_, pid_, salt):
        e = (em_[0] + salt,) + em_[1:]
        return tuple(a.at[pid_[:pref]].add(x[:pref])
                     for a, x in zip(acc_, e))

    def scat_sorted_full(acc_, em_, pid_, salt):
        e = (em_[0] + salt,) + em_[1:]
        return tuple(a.at[pid_].add(x, indices_are_sorted=True)
                     for a, x in zip(acc_, e))

    def scat_plain_full(acc_, em_, pid_, salt):
        e = (em_[0] + salt,) + em_[1:]
        return tuple(a.at[pid_].add(x) for a, x in zip(acc_, e))

    run("segscan", segscan, (em, pid))
    run("boundary", lambda em_, pid_, s: boundary(em_, pid_, s)[0],
        (em, pid))
    run("full_pipeline", full_pipeline, (acc, em, pid))
    run("small_sort_4op", small_sort_only, (em, pid))
    run("prefix_scatter", prefix_scatter_only, (acc, em, pid))
    run("scat_sorted_full", scat_sorted_full, (acc, em, pid))
    run("scat_plain_full", scat_plain_full, (acc, em, pid))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
