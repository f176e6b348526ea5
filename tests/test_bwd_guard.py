import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.config import RenderConfig
from raytpu.kernels.trace_pallas import BWD_MAX_SPHERES, render_pixels_pallas_ad
from raytpu.scene import random_scene, single_sphere_scene
from raytpu.trace import render_pixels


def test_bwd_rejects_large_scenes():
    scene = random_scene(BWD_MAX_SPHERES + 1)
    cfg = RenderConfig(width=16, height=8, max_depth=1, alias_factor=1)

    def loss(s):
        return jnp.sum(render_pixels_pallas_ad(s, cfg, True))

    with pytest.raises(ValueError, match="fused backward"):
        jax.grad(loss)(scene)


def test_bwd_kernel_vs_finite_differences():
    """End-to-end check of the custom_vjp wiring itself: the fused backward
    against central differences on a smooth coordinate (sphere matte)."""
    import dataclasses

    cfg = RenderConfig(width=16, height=16, max_depth=1, alias_factor=1)
    scene = single_sphere_scene()
    gid = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    target = render_pixels(scene, cfg, gid) * 0.5

    def loss_of_matte(matte):
        sph = dataclasses.replace(scene.spheres, matte=matte)
        s2 = dataclasses.replace(scene, spheres=sph)
        err = render_pixels_pallas_ad(s2, cfg, True) - target
        return jnp.mean(err * err)

    matte = scene.spheres.matte
    analytic = np.asarray(jax.grad(loss_of_matte)(matte)).ravel()
    eps = 1e-3
    flat = np.asarray(matte, np.float64).ravel()
    for ci in range(3):
        up = flat.copy(); up[ci] += eps
        dn = flat.copy(); dn[ci] -= eps
        numeric = (float(loss_of_matte(jnp.asarray(up.reshape(matte.shape), jnp.float32)))
                   - float(loss_of_matte(jnp.asarray(dn.reshape(matte.shape), jnp.float32)))) / (2 * eps)
        if abs(numeric) > 1e-10:
            assert abs(analytic[ci] - numeric) <= 0.05 * abs(numeric) + 1e-10, \
                f"coord {ci}: {analytic[ci]} vs {numeric}"


def test_bwd_kernel_n1024_finite_differences():
    """BWD_MAX_SPHERES is 4096 (a VMEM guard, not an unroll cap); pin that
    the loop-based backward stays correct well past the old 256 cap: fused
    gradients at N=1024 against central differences on smooth coordinates
    (matte of the nearest sphere).  jnp-vs-pallas grad comparison is NOT
    used here — separately compiled programs flip near-tangent branches
    and the deviation says nothing about either path's correctness."""
    import dataclasses

    from raytpu.scene import random_scene

    cfg = RenderConfig(width=64, height=8, max_depth=1, alias_factor=1)
    scene = random_scene(1024, num_lights=2, seed=11)
    target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)

    def loss_of_matte(matte):
        sph = dataclasses.replace(scene.spheres, matte=matte)
        s2 = dataclasses.replace(scene, spheres=sph)
        err = render_pixels_pallas_ad(s2, cfg, True) - target
        return jnp.mean(err * err)

    matte = scene.spheres.matte
    analytic = np.asarray(jax.grad(loss_of_matte)(matte), np.float64)
    flat = np.asarray(matte, np.float64)
    eps = 1e-2  # matte is linear in the emission: central diff is exact
    checked = 0
    # Probe the largest-gradient coordinates (spheres actually visible).
    order = np.argsort(-np.abs(analytic).ravel())[:3]
    for ci in order:
        i, c = divmod(int(ci), 3)
        up = flat.copy(); up[i, c] += eps
        dn = flat.copy(); dn[i, c] -= eps
        numeric = (float(loss_of_matte(jnp.asarray(up, jnp.float32)))
                   - float(loss_of_matte(jnp.asarray(dn, jnp.float32)))) \
            / (2 * eps)
        if abs(numeric) > 1e-15:
            assert abs(analytic[i, c] - numeric) <= 0.05 * abs(numeric), \
                f"({i},{c}): {analytic[i, c]} vs {numeric}"
            checked += 1
    assert checked >= 2
