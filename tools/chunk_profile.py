"""Device-profiler attribution of one wavefront chunk (the real
instrument for "where does the frame go?").

Builds a standalone one-chunk program (camera -> level loop -> compaction
-> emission accumulation, exactly the scan body of
raytpu/kernels/wavefront.py), captures a jax.profiler trace — which DOES
work through the remote-TPU tunnel — and prints per-op device time
summed over the traced runs.  Round-3 findings from this tool:

  * a standalone chunk costs the same per chunk as the full in-scan
    frame (the scan adds nothing), while solo slope benches of the same
    ops sum to ~half — solo numbers understate composed-program cost;
  * the lax.switch prefix scatters traced at 10-13 ms each vs ~6 ms for
    a SOLO-benched plain scatter — but the end-to-end A/B went the OTHER
    way (plain everywhere: 7.71 s vs 5.78 s at 1080p d6), because the
    plain scatter's in-frame cost is itself ~3x its solo figure.  Use
    this tool to ATTRIBUTE time within one build; never mix its in-frame
    numbers with solo-bench numbers of an alternative — A/B the real
    builds end to end.

Usage: python tools/chunk_profile.py [--width 1920 --height 1080
         --max-depth 6 --spheres 256 --chunk-rays 524288
         --capacity-factor 1.5]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--alias-factor", type=int, default=3)
    ap.add_argument("--spheres", type=int, default=256)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--chunk-rays", type=int, default=1 << 19)
    ap.add_argument("--capacity-factor", type=float, default=1.5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--compact", default="global",
                    choices=["global", "blocked"],
                    help="compaction form to attribute (round 5: blocked "
                         "is the shipped forward default)")
    ap.add_argument("--ad", action="store_true",
                    help="attribute one TRAINING chunk instead: "
                         "value_and_grad of the chunk's emission sum "
                         "w.r.t. the scene tables (per-level custom-VJP "
                         "kernels + glue transposes — the scan/checkpoint "
                         "recompute is not included, so a full step is "
                         "~2x the forward part of this trace plus it)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import raytpu.kernels.wavefront as wf
    from raytpu.config import RenderConfig
    from raytpu.scene import random_scene

    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.max_depth,
                       alias_factor=args.alias_factor)
    scene = random_scene(args.spheres, seed=args.seed)
    n = args.spheres
    n_lights = int(scene.lights.pos.shape[0])
    chunk = wf._align_up(min(args.chunk_rays,
                             cfg.num_pixels * cfg.samples_per_pixel),
                         wf._lcm(wf.WF_BLOCK, cfg.samples_per_pixel))
    cap = wf._align_up(int(args.capacity_factor * chunk), wf.WF_BLOCK)
    npix = cfg.num_pixels
    scene_tbl, lights_tbl, bg_tbl = wf._scene_tables(scene)
    interpret = jax.default_backend() != "tpu"

    def one_chunk(stbl, ltbl, btbl, start):
        # Match the SHIPPED path op-for-op (pixel-major ids, ws-sized
        # window accumulator folded once into the slot accumulator — the
        # round-4 rerun of this tool first profiled a plain-scatter
        # variant by mistake and attributed 57% of the chunk to scatter
        # fusions the real frame did not run).
        acc = tuple(jnp.zeros((npix,), jnp.float32) for _ in range(3))
        ids = start + jnp.arange(chunk, dtype=jnp.int32)
        spp = cfg.samples_per_pixel
        total = npix * spp
        ws = chunk // spp
        in_range = ids < total
        ids = jnp.minimum(ids, total - 1)
        pid = ids // spp
        sample = ids % spp
        si = sample // cfg.alias_factor
        sj = sample % cfg.alias_factor
        dx, dy, dz = wf._camera_dirs(cfg, pid, si, sj)
        zero = jnp.zeros_like(dx)
        one = jnp.where(in_range, wf.f32(1.0), wf.f32(0.0))
        state = (zero, zero, zero, dx, dy, dz, one, one, one,
                 zero + wf.f32(-1.0))
        w0 = start // spp
        accw = None
        seg_extra = 0
        for level in range(cfg.max_depth + 1):
            spawn = level < cfg.max_depth
            if args.ad:
                em, ch = wf._wf_level_ad(n, n_lights, spawn, interpret)(
                    stbl, ltbl, btbl, state)
                children = ch if spawn else None
            else:
                em, children = wf._wf_level_call(
                    stbl, ltbl, btbl, state, n, n_lights, spawn, interpret)
            if level == 0:
                accw = tuple(x.reshape(ws, spp).sum(axis=1) for x in em)
            else:
                accw = wf._segsum_scatter(accw, em, pid - w0, ws,
                                          min(ws + seg_extra,
                                              pid.shape[0]),
                                          spp * 2 ** level,
                                          args.compact == "blocked",
                                          interpret)
            if not spawn:
                break
            r = state[0].shape[0]
            pid2 = wf._dup_tilewise(pid, r // wf.WF_BLOCK)
            keep = min(2 * r, cap)
            if args.compact == "blocked":
                if args.ad:
                    state, pid, _, _ = wf._compact_blocked_ad(
                        children, pid2, keep, interpret)
                else:
                    state, pid, _, _ = wf._compact_blocked(children, pid2,
                                                           keep, interpret)
                seg_extra = 2 * ((2 * r) // (2 * wf.WF_BLOCK)) + 1
            elif args.ad:
                state, pid, _, _ = wf._compact_ad(children, pid2, keep)
            else:
                state, pid, _, _ = wf._compact(children, pid2, keep)
        acc = tuple(
            jax.lax.dynamic_update_slice(
                a, jax.lax.dynamic_slice(a, (w0,), (ws,)) + w, (w0,))
            for a, w in zip(acc, accw))
        return sum(jnp.sum(a) for a in acc)

    if args.ad:
        def step(stbl, ltbl, btbl, start):
            val, grads = jax.value_and_grad(
                lambda s, l, b: one_chunk(s, l, b, start),
                argnums=(0, 1, 2))(stbl, ltbl, btbl)
            return val + sum(jnp.sum(g) for g in grads)

        f = jax.jit(step)
    else:
        f = jax.jit(one_chunk)
    float(f(scene_tbl, lights_tbl, bg_tbl, jnp.int32(0)))  # compile

    tracedir = tempfile.mkdtemp(prefix="raytpu_trace_")
    with jax.profiler.trace(tracedir):
        for i in range(args.reps):
            float(f(scene_tbl, lights_tbl, bg_tbl, jnp.int32(i * chunk)))

    files = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print(json.dumps({"error": "no trace produced", "dir": tracedir}))
        return 1
    with gzip.open(files[0]) as fh:
        tr = json.load(fh)
    ev = tr.get("traceEvents", [])
    procs = {e.get("pid"): e["args"].get("name") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"
             and "args" in e}
    dur = collections.Counter()
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in str(procs.get(e.get("pid"), ""))):
            dur[e.get("name", "?")] += e["dur"]
    out = {"config": f"{args.width}x{args.height} d{args.max_depth} "
                     f"N{args.spheres} chunk={chunk} cap={cap}",
           "reps": args.reps,
           "per_op_ms_per_rep": {
               name: round(us / 1e3 / args.reps, 2)
               for name, us in dur.most_common(args.top)}}
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
