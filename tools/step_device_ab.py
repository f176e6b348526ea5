"""Config-3 device training-step slope for the current RAYTPU_BWD_FULLTREE
mode — one JSON line.  Run once per mode (env read at kernel-build time):

    python tools/step_device_ab.py
    RAYTPU_BWD_FULLTREE=ee python tools/step_device_ab.py
"""
import dataclasses, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytpu.config import RenderConfig
from raytpu.grad import loss_and_grad_pallas_packed, pack_target
from raytpu.scene import default_scene, random_scene

_n = int(os.environ.get("AB_SPHERES", "0"))
cfg = RenderConfig(width=640, height=480, max_depth=4, alias_factor=3)
scene = random_scene(_n, seed=3) if _n else default_scene()
target = pack_target(cfg, jnp.zeros((cfg.num_pixels, 3), jnp.float32))

def step(s):
    return loss_and_grad_pallas_packed(s, cfg, target)

def rep(k):
    def body(s):
        total = jnp.float32(0.0)
        for i in range(k):
            sph = dataclasses.replace(
                s.spheres, radius=s.spheres.radius + jnp.float32(i * 1e-30))
            l, grads = step(dataclasses.replace(s, spheres=sph))
            total = total + l + sum(jnp.sum(x)
                                    for x in jax.tree_util.tree_leaves(grads))
        return total
    return jax.jit(body)

t0 = time.perf_counter()
f1, fk = rep(1), rep(4)
float(f1(scene)); float(fk(scene))
compile_s = time.perf_counter() - t0

def best(f):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(scene))
        ts.append(time.perf_counter() - t0)
    return min(ts)

dt = (best(fk) - best(f1)) / 3
print(json.dumps({
    "mode": os.environ.get("RAYTPU_BWD_FULLTREE", "per-level")
            + ("+skipshade" if os.environ.get("RAYTPU_BWD_SKIP_SHADING") == "1"
               else ""),
    "spheres": int(scene.spheres.pos.shape[0]),
    "step_device_ms": round(dt * 1e3, 2),
    "step_device_mrays_per_s": round(cfg.rays_per_frame / dt / 1e6, 2),
    "compile_s": round(compile_s, 1),
}), flush=True)
