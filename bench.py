"""Benchmark harness: one JSON line for the driver.

North-star metric (BASELINE.md): Mrays/s/chip forward+backward at 640x480,
bounce depth 4 (BASELINE config 3), measured as DEVICE step time by the
K-steps-in-one-jit slope method — the wall number includes a ~28 ms
per-dispatch tunnel floor (a harness artifact, ~45% of the wall at this
config) and is reported alongside as `wall_*`.  A "ray" is a camera ray
(pixel x alias^2), the same accounting as the reference's
one-work-item-per-pixel launch; the full bounce tree traces 2^(depth+1)-1
nodes per camera ray.

`vs_baseline` is computed against the round-3 recorded device step
(76.57 Mrays/s, BENCH_r03.json) — the reference itself publishes no
numbers (BASELINE.md), so round-over-round progress is the honest axis.

Runs on whatever accelerator jax finds (the real TPU under the driver);
prints exactly one JSON line to stdout.
"""

import json
import sys
import time

# Round-3 device-step figure (BENCH_r03.json step_device_mrays_per_s):
# the progress denominator for vs_baseline.
_R3_STEP_DEVICE_MRAYS = 76.57


def main():
    import os
    import threading

    import jax

    # The tunnel can also die MID-bench (first compiles take 20-80 s and
    # remote-compile crashes hang with no diagnostics — CLAUDE.md), which
    # would stall past any single-step guard.  A whole-run deadline prints
    # the honest failure line and hard-exits; generous enough (45 min) that
    # a healthy run (~3-4 min) never trips it.
    done = threading.Event()

    def _deadline():
        if not done.wait(timeout=2700):
            print(json.dumps({
                "metric": "Mrays/s/chip fwd+bwd 640x480 depth-4 (device step)",
                "value": None, "unit": "Mrays/s", "vs_baseline": None,
                "error": "bench run exceeded 2700s deadline (TPU tunnel "
                         "hung mid-run?)",
            }), flush=True)
            os._exit(1)

    threading.Thread(target=_deadline, daemon=True).start()

    # The remote-TPU tunnel can be down; a hung jax.devices() would stall
    # the whole bench run forever.  Probe it with a watchdog and report an
    # honest failure line instead.
    probe = {}

    def _probe():
        try:
            probe["devices"] = jax.devices()
        except Exception as e:  # pragma: no cover - backend-dependent
            probe["error"] = repr(e)

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout=300)
    if "devices" not in probe:
        print(json.dumps({
            "metric": "Mrays/s/chip fwd+bwd 640x480 depth-4 (device step)",
            "value": None, "unit": "Mrays/s", "vs_baseline": None,
            "error": probe.get("error",
                               "backend unreachable (device probe timed "
                               "out after 300s — TPU tunnel down?)"),
        }))
        return 1

    import jax.numpy as jnp

    from raytpu.config import RenderConfig
    from raytpu.grad import loss_and_grad
    from raytpu.render import render_timed
    from raytpu.scene import default_scene
    from raytpu.trace import render_pixels

    cfg = RenderConfig(width=640, height=480, max_depth=4, alias_factor=3,
                       chunk_pixels=16384)
    scene = default_scene()
    dev = jax.devices()[0]
    meta = dict(device=str(dev), backend=jax.default_backend(),
                width=cfg.width, height=cfg.height, depth=cfg.max_depth,
                alias=cfg.alias_factor)

    # Forward (auto backend: fused Pallas kernel on TPU)
    _, fwd = render_timed(scene, cfg, warmup=1, iters=3)
    try:
        _, fwd_jnp = render_timed(scene, cfg, warmup=1, iters=3,
                                  backend="jnp")
    except Exception:
        fwd_jnp = None

    # Floor-free device time by the slope method (tools/device_time.py):
    # every wall number above includes a ~28 ms per-dispatch tunnel floor;
    # K frames inside one jit cancel it, giving true device Mrays/s + an
    # estimated VPU-utilization figure vs the v5e fp32 peak.
    device = None
    if jax.default_backend() == "tpu":
        try:
            import sys as _sys
            _sys.path.insert(0, "tools")
            from device_time import (V5E_VPU_FP32_FLOPS,
                                     device_frame_seconds, tree_flops)

            from raytpu.kernels.trace_pallas import render_pixels_pallas
            dev_s, _ = device_frame_seconds(
                lambda s: render_pixels_pallas(s, cfg), scene, k=5)
            flops = tree_flops(cfg, scene.spheres.pos.shape[0],
                               scene.lights.pos.shape[0])
            device = dict(
                fwd_device_ms=round(dev_s * 1e3, 2),
                fwd_device_mrays_per_s=round(
                    cfg.rays_per_frame / dev_s / 1e6, 2),
                est_vpu_mfu=round(flops / dev_s / V5E_VPU_FP32_FLOPS, 4),
            )
        except Exception:
            pass

    # Forward + backward (loss + scene-parameter gradients): the fused
    # Pallas kernels in their native tiled layout on TPU (target packed
    # once, the step itself is transpose-free), jnp autodiff elsewhere.
    target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    if jax.default_backend() == "tpu":
        from raytpu.grad import loss_and_grad_pallas_packed, pack_target

        _packed = {}

        def _lg(s, c, t):
            key = (c, id(t))  # RenderConfig is frozen/hashable
            if key not in _packed:
                _packed[key] = pack_target(c, t)
            return loss_and_grad_pallas_packed(s, c, _packed[key])
    else:
        _lg = loss_and_grad

    def step(s):
        return _lg(s, cfg, target)

    # float() on the loss is the completion barrier (block_until_ready is
    # advisory on the remote-TPU platform).
    try:
        loss = float(step(scene)[0])  # compile
    except Exception:
        # Fused-backward compile failure: fall back to jnp autodiff so the
        # harness still reports a number (flagged via fwd_bwd_backend).
        _lg = loss_and_grad
        loss = float(step(scene)[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        loss = float(step(scene)[0])
        times.append(time.perf_counter() - t0)
    bwd_dt = min(times)
    fwd_bwd_mrays = cfg.rays_per_frame / bwd_dt / 1e6

    # Floor-free fwd+bwd device time (slope method, like the forward above):
    # K training steps inside one jit with a per-step salt; the tunnel floor
    # cancels in t(K) - t(1).  This is the per-chip step cost a pod would
    # see (the ~28 ms wall floor is a tunnel artifact of this harness).
    step_device = None
    if jax.default_backend() == "tpu" and _lg is not loss_and_grad:
        try:
            import dataclasses as _dc

            def _rep_step(k):
                def body(s):
                    total = jnp.float32(0.0)
                    for i in range(k):
                        sph = _dc.replace(
                            s.spheres,
                            radius=s.spheres.radius + jnp.float32(i * 1e-30))
                        l, grads = step(_dc.replace(s, spheres=sph))
                        total = total + l + sum(
                            jnp.sum(x) for x in
                            jax.tree_util.tree_leaves(grads))
                    return total
                return jax.jit(body)

            f1, fk = _rep_step(1), _rep_step(4)
            float(f1(scene)), float(fk(scene))

            def _best(f):
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(f(scene))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            dt = (_best(fk) - _best(f1)) / 3
            step_device = dict(
                step_device_ms=round(dt * 1e3, 2),
                step_device_mrays_per_s=round(
                    cfg.rays_per_frame / dt / 1e6, 2))
        except Exception:
            pass

    # The reference's own workload (800x600 depth-5) end to end, as an
    # auxiliary figure; skipped silently if its compile fails.
    golden_ms = None
    try:
        gcfg = RenderConfig(width=800, height=600, max_depth=5, alias_factor=3)
        gtarget = jnp.zeros((gcfg.num_pixels, 3), jnp.float32)
        float(_lg(scene, gcfg, gtarget)[0])
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(_lg(scene, gcfg, gtarget)[0])
            times.append(time.perf_counter() - t0)
        golden_ms = round(min(times) * 1e3, 1)
    except Exception:
        pass

    # BASELINE config 5 (256 spheres, 1920x1080, depth 6) on the wavefront
    # tracer — the large-scene path; round 1 faulted the chip here, the
    # round-2 dense kernel took 44 s.  Warm wall time for one frame
    # (~10 s device + the ~28 ms tunnel floor); skipped off-TPU or on
    # compile failure.
    config5_s = None
    config5_dropped = None
    if jax.default_backend() == "tpu":
        try:
            from raytpu.scene import random_scene

            from raytpu.kernels.wavefront import render_pixels_wavefront
            c5 = RenderConfig(width=1920, height=1080, max_depth=6,
                              alias_factor=3)
            s5 = random_scene(256, seed=3)

            # 512K chunks x capacity 0.9375 with block-local compaction
            # (the round-5 frontier: batched per-tile sorts beat the
            # global co-sort 13-21% at equal settings and reverse the
            # chunk-size preference; 2.80 s zero-drop measured,
            # tools/compact_ab.py, BASELINE.md round-5 studies).  The
            # dropped counter keeps the number honest — any drop is
            # reported alongside the time.
            def fn5():
                img, info = render_pixels_wavefront(
                    s5, c5, chunk_rays=1 << 19, capacity_factor=0.9375,
                    return_info=True)
                return float(jnp.sum(img)), int(info["dropped"])

            fn5()  # compile
            t0 = time.perf_counter()
            _, config5_dropped = fn5()
            config5_s = round(time.perf_counter() - t0, 2)
        except Exception:
            pass

    # Headline: the floor-free device step (the number that actually moves
    # round over round); wall time stays as an auxiliary figure.  Off-TPU
    # or on a slope-method failure, fall back to the wall figure.
    if step_device is not None:
        value = step_device["step_device_mrays_per_s"]
        metric = "Mrays/s/chip fwd+bwd 640x480 depth-4 (device step)"
        vs_baseline = round(value / _R3_STEP_DEVICE_MRAYS, 4)
    else:
        value = round(fwd_bwd_mrays, 3)
        metric = "Mrays/s/chip fwd+bwd 640x480 depth-4 (wall)"
        vs_baseline = None

    result = {
        "metric": metric,
        "value": value,
        "unit": "Mrays/s",
        # vs the round-3 device step (the reference publishes no numbers).
        "vs_baseline": vs_baseline,
        "wall_fwd_bwd_mrays_per_s": round(fwd_bwd_mrays, 3),
        "fwd_mrays_per_s": round(fwd["mrays_per_s"], 3),
        "fwd_backend": fwd["backend"],
        "fwd_seconds": round(fwd["seconds"], 4),
        "fwd_bwd_seconds": round(bwd_dt, 4),
        "fwd_bwd_backend": ("pallas" if _lg is not loss_and_grad else "jnp"),
        "fwd_jnp_mrays_per_s": (round(fwd_jnp["mrays_per_s"], 3)
                                if fwd_jnp else None),
        "golden_800x600_d5_fwd_bwd_ms": golden_ms,
        "config5_1080p_d6_N256_wavefront_s": config5_s,
        "config5_dropped_rays": config5_dropped,
        **(device or {}),
        **(step_device or {}),
        **meta,
    }
    print(json.dumps(result))
    done.set()
    return 0


if __name__ == "__main__":
    sys.exit(main())
