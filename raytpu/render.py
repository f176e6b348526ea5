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

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from raytpu.config import RenderConfig
from raytpu.parallel.mesh import PIXEL_AXIS, make_mesh
from raytpu.trace import render_image, render_pixels


# Measured crossover (BASELINE.md device-time table, v5e): the wavefront
# beats the fused dense kernel once dead subtrees dominate — 256 spheres at
# depth 4 (1.4x) and any large-N depth 6 (4.4-5.5x) — while the dense
# kernel wins shallow or small scenes (d2 N=256: 104 vs 133 ms; d4 N=64:
# 356 vs 749 ms).
_WF_MIN_SPHERES = 128
_WF_MIN_DEPTH = 4


def resolve_backend(backend: str = "auto", scene=None,
                    cfg: RenderConfig | None = None) -> str:
    """Resolve "auto" to a concrete backend.  With scene+cfg provided,
    "auto" on TPU picks the wavefront tracer for large deep scenes (the
    measured crossover above) and the fused dense kernel otherwise."""
    if backend == "auto":
        if jax.default_backend() != "tpu":
            return "jnp"
        if (scene is not None and cfg is not None
                and scene.spheres.pos.shape[0] >= _WF_MIN_SPHERES
                and cfg.max_depth >= _WF_MIN_DEPTH):
            return "wavefront"
        return "pallas"
    if backend not in ("jnp", "pallas", "wavefront"):
        raise ValueError(f"unknown backend {backend!r}")
    return backend


def render_single(scene, cfg: RenderConfig, backend: str = "auto",
                  wf_opts: dict | None = None):
    """One-device full-frame render -> (H, W, 3).

    `wf_opts`: wavefront-backend tuning knobs passed straight to
    render_pixels_wavefront (chunk_rays / capacity_factor / streams /
    eager_sort); ignored by the other backends."""
    backend = resolve_backend(backend, scene, cfg)
    # Off-TPU an explicitly requested kernel backend runs the Pallas
    # interpreter (the sanitizer mode) rather than failing to lower.
    interpret = jax.default_backend() != "tpu"
    if backend == "pallas":
        from raytpu.kernels import render_image_pallas

        return render_image_pallas(scene, cfg, interpret=interpret)
    if backend == "wavefront":
        from raytpu.kernels import render_image_wavefront

        return render_image_wavefront(scene, cfg, interpret=interpret,
                                      **(wf_opts or {}))
    return render_image(scene, cfg)


@functools.lru_cache(maxsize=32)
def _sharded_render_fn(cfg: RenderConfig, mesh, backend: str,
                       interpret: bool, wf_opts: tuple = ()):
    """Compile one sharded render: pixel ids block-sharded over the mesh's
    pixel axis, scene replicated, zero collectives (pixels independent).

    `interpret` (pallas sanitizer mode off-TPU) is part of the cache key so a
    platform switch after the first call cannot reuse a stale closure;
    `wf_opts` is the wavefront tuning dict as a sorted item tuple (hashable
    for the same reason)."""

    def body(scene, gid):
        if backend == "pallas":
            from raytpu.kernels import render_pixels_pallas
            return render_pixels_pallas(scene, cfg, interpret=interpret,
                                        offset=gid[0], count=gid.shape[0])
        if backend == "wavefront":
            from raytpu.kernels import render_pixels_wavefront
            return render_pixels_wavefront(scene, cfg, interpret=interpret,
                                           offset=gid[0],
                                           count=gid.shape[0],
                                           **dict(wf_opts))
        return render_pixels(scene, cfg, gid)

    # check_vma=False: pallas_call outputs carry no varying-axis metadata,
    # which the default checker rejects; the jnp body is unaffected either
    # way (equality with the single-device render is pinned by tests).
    fn = jax.shard_map(body, mesh=mesh, in_specs=(P(), P(PIXEL_AXIS)),
                   out_specs=P(PIXEL_AXIS), check_vma=(backend == "jnp"))
    return jax.jit(fn)


def render_sharded(scene, cfg: RenderConfig, mesh=None, backend: str = "auto",
                   wf_opts: dict | None = None):
    """Render the frame with the pixel grid sharded across all devices.

    Pads the pixel count up to a multiple of the mesh size by re-rendering
    the last pixel (discarded), so any image size works on any mesh.
    """
    if mesh is None:
        mesh = make_mesh()
    backend = resolve_backend(backend, scene, cfg)
    interpret = jax.default_backend() != "tpu"
    n = int(mesh.devices.size)
    p = cfg.num_pixels
    per = -(-p // n)
    gid = jnp.minimum(jnp.arange(per * n, dtype=jnp.int32), p - 1)
    out = _sharded_render_fn(cfg, mesh, backend, interpret,
                             tuple(sorted((wf_opts or {}).items())))(
        scene, gid)
    return out[:p].reshape(cfg.height, cfg.width, 3)


def render_timed(scene, cfg: RenderConfig, mesh=None, warmup: int = 1,
                 iters: int = 3, backend: str = "auto",
                 wf_opts: dict | None = None):
    """Render and time it (compile excluded via warmup), returning
    (image, stats).  Mrays/s counts camera rays (pixels * alias^2), the
    same accounting as the reference's per-work-item model; `traced_rays`
    additionally counts every node of the 2^depth bounce tree."""
    if mesh is not None:
        fn = lambda s: render_sharded(s, cfg, mesh, backend, wf_opts=wf_opts)
    else:
        fn = lambda s: render_single(s, cfg, backend, wf_opts=wf_opts)

    # A device->host scalar fetch is the only reliable completion barrier on
    # every backend (block_until_ready is advisory on the remote-TPU
    # platform); jnp.sum keeps the fetched payload at 4 bytes.
    def run(s):
        img = fn(s)
        float(jnp.sum(img))
        return img

    for _ in range(max(warmup, 0)):
        img = run(scene)
    times = []
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        img = run(scene)
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
        times=times,
    )
    return img, stats
