"""Render drivers: single-device jit, multi-chip shard_map, timing.

This is the reference host driver (main.cpp:94-508) rebuilt TPU-first: scene
construction is a pytree (raytpu.scene), "kernel launch geometry"
(main.cpp:296-334) becomes a pixel-axis sharding over a device mesh, the
blocking buffer uploads/readbacks become jax device placement, and the
wall-clock timing around enqueue+finish (main.cpp:352-374) becomes
block_until_ready timing with a rays/s derivation.

Two compute backends share one semantics contract:
  * "jnp"    — the XLA-fused tracer (raytpu.trace); runs anywhere, is the
               differentiable path.
  * "pallas" — the fused TPU kernel (raytpu.kernels); the fast forward path.
  * "wavefront" — per-level kernels + sorted ray compaction
               (raytpu.kernels.wavefront); the large-scene/deep-depth
               forward path (shards over the pixel axis like the others —
               each device runs its own wavefront loop on its pixel
               window, zero collectives).
  * "auto"   — on TPU: wavefront for large deep scenes (>= 128 spheres,
               depth >= 4 — the measured crossover), fused pallas kernel
               otherwise; jnp off-TPU.
"""

from __future__ import annotations

import functools
import time
import warnings

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from raytpu.config import RenderConfig
from raytpu.parallel.mesh import PIXEL_AXIS, make_mesh
from raytpu.trace import render_image, render_pixels


# Measured crossover, re-swept in round 5 after blocked compaction moved
# it (BASELINE.md round-5 crossover study, v5e, 640x480 + 1080p cells):
# the wavefront now wins whenever the per-ray tree work is non-trivial —
# N x 2^depth >= ~512 fits every measured cell (N=64 d4: 386 vs 179 ms;
# N=256 d2: 443 vs 217; N=24 d6: 525 vs 227; N=64 d2: 132 vs 131 tie)
# — while the dense kernel keeps small scenes (N=3 d4: 36 vs 219;
# N=16 d4: 75 vs 168).  The round-2 rule (N>=128 AND depth>=4) predated
# two rounds of wavefront tuning.
_WF_MIN_WORK = 512          # spheres * 2^depth at the crossover


def _wf_wins(n_spheres: int, depth: int) -> bool:
    return n_spheres * (2 ** depth) >= _WF_MIN_WORK


def resolve_backend(backend: str = "auto", scene=None,
                    cfg: RenderConfig | None = None) -> str:
    """Resolve "auto" to a concrete backend.  With scene+cfg provided,
    "auto" on TPU picks the wavefront tracer for large deep scenes (the
    measured crossover above) and the fused dense kernel otherwise."""
    if backend == "auto":
        if jax.default_backend() != "tpu":
            return "jnp"
        if (scene is not None and cfg is not None
                and _wf_wins(scene.spheres.pos.shape[0], cfg.max_depth)):
            return "wavefront"
        return "pallas"
    if backend not in ("jnp", "pallas", "wavefront"):
        raise ValueError(f"unknown backend {backend!r}")
    return backend


# Auto-capacity ladders for the wavefront backend (VERDICT r4 next-step
# 2): start at the measured config-5 zero-drop frontier and escalate on
# any drop — rendering is stateless, so the retry is exact.  The frontier
# is scene-dependent (the seed-0 bench scene needs the second rung where
# seed-3 runs the first), which is why the aggressive default is safe
# ONLY with the drop-triggered retry; 4.0 is the "any scene" backstop
# (2.0, the old safe default, has never dropped on a measured scene).
# An explicit capacity_factor in wf_opts disables the ladder (single
# attempt, user owns the tradeoff).
#
# BLOCK-LOCAL compaction is the default everywhere since round 5 (the
# AD path got its own blocked VJP — inverse-cursor kernel + batched
# co-sorts): the frontier is 512K-ray chunks x 0.9375 for both forward
# (2.80 s config-5 d6) and training (9.96 s/step vs the tuned global's
# 10.71; the seam fillers cost one capacity notch but the batched
# per-tile sorts beat the global co-sort at every equal setting,
# BASELINE.md round-5 studies).  The TRAIN constants exist so the two
# ladders can diverge again if a future tuning splits them; they are
# currently equal by measurement.
# The 1.0625 rung exists for the seed-0 class of scenes: they overflow
# 0.9375 but run 2.97 s zero-drop at 1.0625 vs 3.17 at 1.25 (measured,
# round 5) — one rung's escalation either way, 6% better steady-state.
WF_AUTO_CHUNK = 1 << 19
WF_AUTO_LADDER = (0.9375, 1.0625, 1.25, 2.0, 4.0)
WF_AUTO_CHUNK_TRAIN = 1 << 19
WF_AUTO_LADDER_TRAIN = (0.9375, 1.0625, 1.25, 2.0, 4.0)


def _wf_auto_trials(wf_opts: dict | None, train: bool = False):
    """Resolve wavefront tuning to a list of option dicts to try in order.

    No explicit capacity_factor -> the auto ladder (tuned-frontier first,
    escalating on drops); explicit capacity_factor -> exactly that, one
    attempt.  `train` picks the AD-path frontier (global compaction,
    smaller chunks)."""
    o = dict(wf_opts or {})
    if "capacity_factor" in o:
        return [o]
    o.setdefault("chunk_rays",
                 WF_AUTO_CHUNK_TRAIN if train else WF_AUTO_CHUNK)
    ladder = WF_AUTO_LADDER_TRAIN if train else WF_AUTO_LADDER
    return [dict(o, capacity_factor=c) for c in ladder]


def _warn_escalate(n: int, tried: dict, nxt: dict):
    warnings.warn(
        f"wavefront auto-capacity: {n} live rays dropped at "
        f"capacity_factor={tried['capacity_factor']}; retrying at "
        f"{nxt['capacity_factor']} (the zero-drop frontier is "
        f"scene-dependent — see BASELINE.md)", RuntimeWarning, stacklevel=3)


class DroppedRaysError(RuntimeError):
    """Live rays exceeded the wavefront's per-level capacity and were
    dropped — the image is missing their contribution.  Raise the
    capacity_factor (or chunk_rays) until the drop count is zero."""


def _report_drops(dropped, on_drop: str) -> int:
    """Concretize the wavefront drop counter and report it loudly.

    Round 3 shipped a tuning (256K chunks x capacity 1.5) that silently
    lost 0.56% of live rays — only bench.py's counter caught it.  Every
    user-facing render path now routes through here: `on_drop` is
    "warn" (default), "raise" (strict), or "ignore"."""
    n = int(dropped)
    if n > 0 and on_drop == "raise":
        raise DroppedRaysError(
            f"wavefront dropped {n} live rays (per-level capacity "
            f"overflow); increase capacity_factor or chunk_rays")
    if n > 0 and on_drop == "warn":
        warnings.warn(
            f"wavefront dropped {n} live rays (per-level capacity "
            f"overflow) — the image is missing their light; increase "
            f"capacity_factor or chunk_rays", RuntimeWarning, stacklevel=3)
    return n


def render_single(scene, cfg: RenderConfig, backend: str = "auto",
                  wf_opts: dict | None = None, return_info: bool = False,
                  on_drop: str = "warn"):
    """One-device full-frame render -> (H, W, 3), or (image, info) with
    `return_info` where info = {'dropped': int}.

    `wf_opts`: wavefront-backend tuning knobs passed straight to
    render_pixels_wavefront (chunk_rays / capacity_factor / streams /
    eager_sort); ignored by the other backends.  Without an explicit
    capacity_factor the wavefront runs the AUTO ladder: tuned-frontier
    capacity first, and on any drop the frame is re-rendered at the next
    escalation (stateless, so the retry is exact — WF_AUTO_LADDER).
    Wavefront renders that still drop live rays after the ladder warn by
    default — `on_drop` in {"warn", "raise", "ignore"}."""
    backend = resolve_backend(backend, scene, cfg)
    # Off-TPU an explicitly requested kernel backend runs the Pallas
    # interpreter (the sanitizer mode) rather than failing to lower.
    interpret = jax.default_backend() != "tpu"
    if backend == "pallas":
        from raytpu.kernels import render_image_pallas

        img = render_image_pallas(scene, cfg, interpret=interpret)
        info = dict(dropped=0)
    elif backend == "wavefront":
        from raytpu.kernels import render_image_wavefront

        trials = _wf_auto_trials(wf_opts)
        for i, o in enumerate(trials):
            img, info = render_image_wavefront(scene, cfg,
                                               interpret=interpret,
                                               return_info=True, **o)
            n = int(info["dropped"])
            if n == 0 or i + 1 == len(trials):
                break
            _warn_escalate(n, o, trials[i + 1])
        # The resolved tuning rides out so a caller rendering many frames
        # of the same scene can pass it back as wf_opts and skip the
        # ladder's dropped attempts next time.
        info = dict(info, dropped=_report_drops(n, on_drop), wf_opts=o)
    else:
        img = render_image(scene, cfg)
        info = dict(dropped=0)
    return (img, info) if return_info else img


@functools.lru_cache(maxsize=32)
def _sharded_render_fn(cfg: RenderConfig, mesh, backend: str,
                       interpret: bool, wf_opts: tuple = (),
                       stride: int = 1):
    """Compile one sharded render: pixel ids sharded over the mesh's
    pixel axis, scene replicated, zero collectives (pixels independent).

    `stride` 1 = contiguous pixel blocks per device; `stride` = mesh size
    gives each device the INTERLEAVED set {shard + j*stride} — hot strips
    (up to 2x live-ray load under block sharding, BASELINE.md round-4
    shard-balance study) then average out across devices.  `interpret`
    (pallas sanitizer mode off-TPU) is part of the cache key so a
    platform switch after the first call cannot reuse a stale closure;
    `wf_opts` is the wavefront tuning dict as a sorted item tuple (hashable
    for the same reason)."""

    def body(scene, gid):
        # Every backend returns (pixels, dropped[1]) so the driver can
        # surface the wavefront drop counter; the other backends never
        # drop, and `0 * gid[:1]` keeps the zero device-varying for the
        # jnp path's vma check.
        zero_drop = jnp.zeros((1,), jnp.int32) + 0 * gid[:1]
        if backend == "pallas":
            from raytpu.kernels import render_pixels_pallas
            return render_pixels_pallas(scene, cfg, interpret=interpret,
                                        offset=gid[0], stride=stride,
                                        count=gid.shape[0]), zero_drop
        if backend == "wavefront":
            from raytpu.kernels import render_pixels_wavefront
            pix, info = render_pixels_wavefront(
                scene, cfg, interpret=interpret, offset=gid[0],
                shard_stride=stride,
                count=gid.shape[0], return_info=True, **dict(wf_opts))
            return pix, info["dropped"].reshape(1)
        return render_pixels(scene, cfg, gid), zero_drop

    # check_vma=False: pallas_call outputs carry no varying-axis metadata,
    # which the default checker rejects; the jnp body is unaffected either
    # way (equality with the single-device render is pinned by tests).
    fn = jax.shard_map(body, mesh=mesh, in_specs=(P(), P(PIXEL_AXIS)),
                   out_specs=(P(PIXEL_AXIS), P(PIXEL_AXIS)),
                   check_vma=(backend == "jnp"))
    return jax.jit(fn)


def render_sharded(scene, cfg: RenderConfig, mesh=None, backend: str = "auto",
                   wf_opts: dict | None = None, return_info: bool = False,
                   on_drop: str = "warn", interleave: bool = False):
    """Render the frame with the pixel grid sharded across all devices.

    Pads the pixel count up to a multiple of the mesh size by re-rendering
    the last pixel (discarded), so any image size works on any mesh.
    `interleave` gives each device the strided pixel set {shard + j*mesh}
    instead of a contiguous block: per-device live-ray load is then the
    frame average instead of up-to-2x on hot strips (BASELINE.md round-4
    shard-balance study) — bit-identical output (pixels are independent;
    one reshape-transpose reassembles the frame).
    With `return_info`, returns (image, {'dropped': int}) — the summed
    per-shard wavefront drop counters.  Without an explicit
    capacity_factor the wavefront backend runs the auto-capacity ladder
    (escalate + re-render on drops, see render_single); residual drops
    warn/raise per `on_drop`.
    """
    if mesh is None:
        mesh = make_mesh()
    backend = resolve_backend(backend, scene, cfg)
    interpret = jax.default_backend() != "tpu"
    n = int(mesh.devices.size)
    p = cfg.num_pixels
    per = -(-p // n)
    i = jnp.arange(per * n, dtype=jnp.int32)
    if interleave and n > 1:
        # Shard s's block holds pixels {s + k*n}: gid[s*per + k].
        gid = jnp.minimum(i // per + (i % per) * n, p - 1)
    else:
        gid = jnp.minimum(i, p - 1)
    stride = n if interleave and n > 1 else 1
    trials = (_wf_auto_trials(wf_opts) if backend == "wavefront"
              else [dict(wf_opts or {})])
    for t, o in enumerate(trials):
        out, drops = _sharded_render_fn(cfg, mesh, backend, interpret,
                                        tuple(sorted(o.items())), stride)(
            scene, gid)
        nd = int(jnp.sum(drops)) if backend == "wavefront" else 0
        if nd == 0 or t + 1 == len(trials):
            break
        _warn_escalate(nd, o, trials[t + 1])
    if interleave and n > 1:
        # Row s*per + k holds pixel s + k*n; the transpose puts row q at
        # pixel q (pad duplicates land past p and are sliced off).
        out = out.reshape(n, per, 3).transpose(1, 0, 2).reshape(-1, 3)
    img = out[:p].reshape(cfg.height, cfg.width, 3)
    dropped = _report_drops(nd, on_drop) if (backend == "wavefront"
                                             or return_info) else 0
    info = dict(dropped=dropped)
    if backend == "wavefront":
        info["wf_opts"] = o       # resolved tuning (see render_single)
    return (img, info) if return_info else img


def render_timed(scene, cfg: RenderConfig, mesh=None, warmup: int = 1,
                 iters: int = 3, backend: str = "auto",
                 wf_opts: dict | None = None, on_drop: str = "warn",
                 interleave: bool = False):
    """Render and time it (compile excluded via warmup), returning
    (image, stats).  Mrays/s counts camera rays (pixels * alias^2), the
    same accounting as the reference's per-work-item model; `traced_rays`
    additionally counts every node of the 2^depth bounce tree.  stats
    always includes `dropped` (wavefront live rays lost to capacity
    overflow — 0 means the frame is exact; nonzero warns/raises per
    `on_drop`)."""
    if mesh is not None:
        fn = lambda s: render_sharded(s, cfg, mesh, backend, wf_opts=wf_opts,
                                      return_info=True, on_drop=on_drop,
                                      interleave=interleave)
    else:
        fn = lambda s: render_single(s, cfg, backend, wf_opts=wf_opts,
                                     return_info=True, on_drop=on_drop)

    # A device->host scalar fetch is the only reliable completion barrier on
    # every backend (block_until_ready is advisory on the remote-TPU
    # platform); jnp.sum keeps the fetched payload at 4 bytes.
    def run(s):
        img, info = fn(s)
        float(jnp.sum(img))
        return img, info

    for _ in range(max(warmup, 0)):
        img, info = run(scene)
    times = []
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        img, info = run(scene)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    primary = cfg.rays_per_frame
    tree = (2 ** (cfg.max_depth + 1) - 1) * primary
    stats = dict(
        seconds=dt,
        primary_rays=primary,
        traced_rays=tree,
        mrays_per_s=primary / dt / 1e6,
        traced_mrays_per_s=tree / dt / 1e6,
        backend=resolve_backend(backend, scene, cfg),
        dropped=int(info["dropped"]),
        times=times,
    )
    return img, stats
