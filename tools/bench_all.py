"""Measure every BASELINE.md config on the current accelerator and print a
JSON line per config (tools/, not the driver's bench.py contract).

Run: python tools/bench_all.py [--skip-large]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-large", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from raytpu.config import RenderConfig
    from raytpu.grad import loss_and_grad_pallas
    from raytpu.kernels.trace_pallas import BWD_MAX_SPHERES, render_image_pallas
    from raytpu.scene import default_scene, random_scene, single_sphere_scene

    def bench(fn, n=3):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    configs = [
        ("config1", single_sphere_scene(),
         RenderConfig(width=64, height=64, max_depth=0, alias_factor=1)),
        ("config2", default_scene(),
         RenderConfig(width=320, height=240, max_depth=2)),
        ("config3", default_scene(),
         RenderConfig(width=640, height=480, max_depth=4)),
        ("golden", default_scene(),
         RenderConfig(width=800, height=600, max_depth=5)),
    ]
    if not args.skip_large:
        configs.append(("config5", random_scene(256, num_lights=4),
                        RenderConfig(width=1920, height=1080, max_depth=6)))

    for name, scene, cfg in configs:
        row = {"config": name, "width": cfg.width, "height": cfg.height,
               "depth": cfg.max_depth, "alias": cfg.alias_factor,
               "spheres": int(scene.spheres.pos.shape[0])}
        try:
            dt = bench(lambda: float(jnp.sum(render_image_pallas(scene, cfg))))
            row["fwd_ms"] = round(dt * 1e3, 2)
            row["fwd_mrays_s"] = round(cfg.rays_per_frame / dt / 1e6, 1)
        except Exception as e:
            row["fwd_error"] = f"{type(e).__name__}: {str(e)[:120]}"
        # Wavefront comparison where the auto heuristic would pick it
        # (render.resolve_backend: >=128 spheres, depth >= 4).
        if scene.spheres.pos.shape[0] >= 128 and cfg.max_depth >= 4:
            try:
                from raytpu.kernels.wavefront import render_image_wavefront

                # Round-5 blocked-compaction frontier for THIS scene
                # (seed-0 4-light needs the 1.25 rung where the bench.py
                # seed-3 scene runs 0.9375 — capacity is scene-dependent,
                # tools/compact_ab.py --seed 0) — drops are counted and
                # reported, keeping it honest.
                def _wf():
                    img, info = render_image_wavefront(
                        scene, cfg, chunk_rays=1 << 19,
                        capacity_factor=1.25, return_info=True)
                    return float(jnp.sum(img)), int(info["dropped"])

                drops = _wf()[1]
                dt = bench(lambda: _wf()[0])
                row["fwd_wavefront_ms"] = round(dt * 1e3, 2)
                row["fwd_wavefront_mrays_s"] = round(
                    cfg.rays_per_frame / dt / 1e6, 1)
                row["wavefront_dropped"] = drops
            except Exception as e:
                row["wavefront_error"] = f"{type(e).__name__}: {str(e)[:120]}"
        # Training step: the wavefront AD path where the auto heuristic
        # picks the wavefront forward (large deep scenes — the dense
        # backward's one-shot reverse sweep at 1080p depth 6 crashes the
        # TPU worker and was never the supported path there), the fused
        # dense kernels otherwise.
        large = (scene.spheres.pos.shape[0] >= 128 and cfg.max_depth >= 4)
        if large:
            from raytpu.grad import loss_and_grad_wavefront
            try:
                target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)

                # AD drops bias the GRADIENT (round-5 guard): the counter
                # is now carried out of every AD path, so the training row
                # reports it — a nonzero here disqualifies the tuning.
                def _step():
                    loss, _g, info = loss_and_grad_wavefront(
                        scene, cfg, target, chunk_rays=1 << 19,
                        capacity_factor=1.25, on_drop="ignore",
                        return_info=True)
                    return float(loss), info["dropped"]

                row["fwd_bwd_wavefront_dropped"] = _step()[1]
                dt = bench(lambda: _step()[0], n=1)
                row["fwd_bwd_wavefront_ms"] = round(dt * 1e3, 2)
                row["fwd_bwd_wavefront_mrays_s"] = round(
                    cfg.rays_per_frame / dt / 1e6, 1)
            except Exception as e:
                row["bwd_error"] = f"{type(e).__name__}: {str(e)[:120]}"
        elif scene.spheres.pos.shape[0] <= BWD_MAX_SPHERES:
            try:
                target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
                dt = bench(
                    lambda: float(loss_and_grad_pallas(scene, cfg, target)[0]))
                row["fwd_bwd_ms"] = round(dt * 1e3, 2)
                row["fwd_bwd_mrays_s"] = round(cfg.rays_per_frame / dt / 1e6, 1)
            except Exception as e:
                row["bwd_error"] = f"{type(e).__name__}: {str(e)[:120]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
