import jax
import jax.numpy as jnp
import numpy as np

from raytpu.config import RenderConfig
from raytpu.grad import (
    finite_difference_check,
    image_loss,
    loss_and_grad,
    loss_and_grad_sharded,
)
from raytpu.parallel.mesh import make_mesh
from raytpu.scene import default_scene, single_sphere_scene
from raytpu.trace import render_pixels


def _target(scene, cfg):
    gid = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    return render_pixels(scene, cfg, gid)


def test_gradients_finite_and_nonzero():
    cfg = RenderConfig(width=16, height=16, max_depth=2, alias_factor=1)
    scene = default_scene()
    # Target from a perturbed scene so the loss has signal.
    perturbed = jax.tree_util.tree_map(lambda x: x, scene)
    target = _target(perturbed, cfg) * 1.2
    loss, grads = loss_and_grad(scene, cfg, target)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0.0


def test_finite_difference_sphere_params():
    # Small, smooth configuration: one matte sphere, primary rays only.
    cfg = RenderConfig(width=12, height=12, max_depth=0, alias_factor=1)
    scene = single_sphere_scene()
    target = _target(scene, cfg) * 0.5  # nonzero residual

    import dataclasses

    def loss_of_pos(pos):
        sph = dataclasses.replace(scene.spheres, pos=pos)
        s2 = dataclasses.replace(scene, spheres=sph)
        return image_loss(s2, cfg, target)

    pos = scene.spheres.pos
    analytic = np.asarray(jax.grad(loss_of_pos)(pos)).ravel()
    eps = 1e-3
    for ci in range(3):
        p = np.asarray(pos, np.float64).copy().ravel()
        p[ci] += eps
        up = float(loss_of_pos(jnp.asarray(p.reshape(pos.shape), jnp.float32)))
        p[ci] -= 2 * eps
        dn = float(loss_of_pos(jnp.asarray(p.reshape(pos.shape), jnp.float32)))
        numeric = (up - dn) / (2 * eps)
        if abs(numeric) > 1e-9:
            assert abs(analytic[ci] - numeric) <= 0.08 * abs(numeric) + 1e-9, \
                f"coord {ci}: analytic {analytic[ci]} vs numeric {numeric}"


def test_finite_difference_checker_utility():
    cfg = RenderConfig(width=8, height=8, max_depth=1, alias_factor=1)
    scene = single_sphere_scene()
    target = _target(scene, cfg) * 0.7

    def f(s):
        return image_loss(s, cfg, target)

    rows = finite_difference_check(f, scene, eps=1e-3, max_coords=2)
    checked = 0
    for _, _, analytic, numeric in rows:
        if abs(numeric) > 1e-9:
            assert abs(analytic - numeric) <= 0.1 * abs(numeric) + 1e-9
            checked += 1
    assert checked >= 3  # the scene has signal on several leaves


def test_sharded_grad_matches_single_device():
    cfg = RenderConfig(width=16, height=16, max_depth=2, alias_factor=1)
    scene = default_scene()
    target = _target(scene, cfg) * 1.1
    mesh = make_mesh()
    l1, g1 = loss_and_grad(scene, cfg, target)
    l2, g2 = loss_and_grad_sharded(scene, cfg, target, mesh)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-10)


def test_sharded_pallas_grad_matches_single_device():
    # The flagship distributed path: fused Pallas forward+backward kernels
    # inside the shard_map body (per-shard offset), scene cotangents psum'd
    # by the shard_map transpose.  Interpret mode on the CPU mesh.
    cfg = RenderConfig(width=32, height=8, max_depth=2, alias_factor=1)
    scene = default_scene()
    target = _target(scene, cfg) * 1.1
    mesh = make_mesh(jax.devices()[:4])
    l1, g1 = loss_and_grad(scene, cfg, target)
    l2, g2 = loss_and_grad_sharded(scene, cfg, target, mesh,
                                   backend="pallas")
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-8)


def test_packed_loss_and_grad_matches_flat():
    # The native-layout training step (no (P, 3) lane-padded arrays or
    # transposes): loss and every gradient leaf must match the flat-layout
    # fused path up to reduction order.  Width NOT a multiple of 128 so the
    # tail-pad mask is exercised.
    from raytpu.grad import (loss_and_grad_pallas, loss_and_grad_pallas_packed,
                             pack_target)

    cfg = RenderConfig(width=40, height=6, max_depth=2, alias_factor=2)
    scene = default_scene()
    target = _target(scene, cfg) * 1.15
    l1, g1 = loss_and_grad_pallas(scene, cfg, target)
    l2, g2 = loss_and_grad_pallas_packed(scene, cfg, pack_target(cfg, target))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-9)


def test_tiled_ad_masks_tail_cotangent():
    # Grad of a PLAIN sum over the tiled output must equal grad of the sum
    # over the flat (count, 3) output: tail-pad lanes re-render the last
    # pixel and their cotangent must not multiply-count its scene gradient.
    from raytpu.kernels.trace_pallas import (render_pixels_pallas_ad,
                                             render_tiles_pallas_ad)

    cfg = RenderConfig(width=40, height=6, max_depth=1, alias_factor=1)
    scene = default_scene()
    interp = jax.default_backend() != "tpu"
    g1 = jax.grad(lambda s: jnp.sum(
        render_tiles_pallas_ad(s, cfg, interp)))(scene)
    g2 = jax.grad(lambda s: jnp.sum(
        render_pixels_pallas_ad(s, cfg, interp)))(scene)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-10)


def test_finite_difference_opacity_ior():
    # Opacity and IOR probes (VERDICT round-3 item 7): both are smooth
    # multiplicative/refractive coordinates away from TIR boundaries —
    # depth 2 on the default scene keeps the refraction/reflection paths
    # active (opacities 0.8/0.3/0.6, IOR 1.55).  Probes where the central
    # difference is significant must match jax.grad.
    import dataclasses

    cfg = RenderConfig(width=16, height=16, max_depth=2, alias_factor=1)
    scene = default_scene()
    target = _target(scene, cfg) * 0.6

    checked = 0
    for field in ("opacity", "ior"):
        def loss_of(vals, field=field):
            sph = dataclasses.replace(scene.spheres, **{field: vals})
            return image_loss(dataclasses.replace(scene, spheres=sph),
                              cfg, target)

        vals = getattr(scene.spheres, field)
        analytic = np.asarray(jax.grad(loss_of)(vals)).ravel()
        flat = np.asarray(vals, np.float64).ravel()
        eps = 1e-3
        for ci in range(flat.size):
            up, dn = flat.copy(), flat.copy()
            up[ci] += eps
            dn[ci] -= eps
            numeric = (float(loss_of(jnp.asarray(up, jnp.float32)))
                       - float(loss_of(jnp.asarray(dn, jnp.float32)))) / (2 * eps)
            if abs(numeric) > 1e-12:
                assert abs(analytic[ci] - numeric) <= \
                    0.08 * abs(numeric) + 1e-12, \
                    f"{field}[{ci}]: analytic {analytic[ci]} vs {numeric}"
                checked += 1
    assert checked >= 4  # both fields carry signal on this scene


def test_wavefront_grads_vs_finite_differences():
    # Direct FD check of the wavefront-AD path (VERDICT round-3 item 7):
    # previously it was only checked transitively (wavefront == dense ==
    # jnp == FD).  64 spheres (the VMEM gather-table path), depth 3, with
    # sphere 0 pinned front-and-center and transparent so its opacity/ior
    # coordinates carry refraction gradients.  FD evaluations run the
    # NON-AD wavefront forward — the custom-VJP primal is the same
    # _wf_level_call, so the two losses agree to float noise.
    import dataclasses

    from raytpu.grad import loss_and_grad_wavefront
    from raytpu.kernels.wavefront import render_pixels_wavefront
    from raytpu.scene import random_scene

    cfg = RenderConfig(width=32, height=24, max_depth=3, alias_factor=1)
    base = random_scene(64, num_lights=2, seed=5)
    # Inverse-square point lights put linear radiance at ~1e-4 — too small
    # for float32 central differences to resolve (the MSE gradient lands at
    # ~1e-11, one quantization step of the loss).  Brightening the lights
    # ~2000x conditions the FD without changing which code paths run.
    base = dataclasses.replace(
        base, lights=dataclasses.replace(base.lights,
                                         col=base.lights.col * 2000.0))
    sph = base.spheres
    sph = dataclasses.replace(
        sph,
        pos=sph.pos.at[0].set(jnp.asarray((0.0, 0.0, -8.0), jnp.float32)),
        radius=sph.radius.at[0].set(3.0),
        matte=sph.matte.at[0].set(jnp.asarray((0.3, 0.2, 0.1), jnp.float32)),
        gloss=sph.gloss.at[0].set(jnp.asarray((0.4, 0.4, 0.3), jnp.float32)),
        opacity=sph.opacity.at[0].set(0.4),
        ior=sph.ior.at[0].set(1.55))
    scene = dataclasses.replace(base, spheres=sph)

    def fwd(s):
        return render_pixels_wavefront(s, cfg, interpret=True)

    target = fwd(scene) * 0.5

    def loss_fd(s):
        err = fwd(s) - target
        return float(jnp.mean(err * err))

    _, grads = loss_and_grad_wavefront(scene, cfg, target)

    # (leaf-name, index) probes: matte RGB + opacity of the pinned sphere,
    # plus one light colour channel.  ior is NOT probed here: in a
    # 64-sphere field the ior-bent refraction rays cross silhouettes, and
    # the central difference is discontinuity-dominated (measured: numeric
    # flips sign across eps 1e-3..3e-5 while the wavefront and jnp
    # analytic gradients agree at 2.2e-6 vs 1.8e-6); the smooth-geometry
    # ior probe lives in test_finite_difference_opacity_ior.
    probes = [("matte", (0, 0)), ("matte", (0, 1)), ("matte", (0, 2)),
              ("opacity", (0,))]
    eps = 1e-3
    checked = 0
    for field, idx in probes:
        vals = getattr(scene.spheres, field)
        up = vals.at[idx].add(eps)
        dn = vals.at[idx].add(-eps)
        mk = lambda v: dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, **{field: v}))
        numeric = (loss_fd(mk(up)) - loss_fd(mk(dn))) / (2 * eps)
        analytic = float(getattr(grads.spheres, field)[idx])
        if abs(numeric) > 1e-12:
            assert abs(analytic - numeric) <= 0.08 * abs(numeric) + 1e-12, \
                f"{field}[{idx}]: analytic {analytic} vs numeric {numeric}"
            checked += 1
    # Light colour: always smooth.
    lc = scene.lights.col
    mklight = lambda v: dataclasses.replace(
        scene, lights=dataclasses.replace(scene.lights, col=v))
    numeric = (loss_fd(mklight(lc.at[0, 0].add(eps)))
               - loss_fd(mklight(lc.at[0, 0].add(-eps)))) / (2 * eps)
    analytic = float(grads.lights.col[0, 0])
    if abs(numeric) > 1e-12:
        assert abs(analytic - numeric) <= 0.08 * abs(numeric) + 1e-12
        checked += 1
    assert checked >= 4, f"only {checked} probes carried signal"


def test_interleaved_sharded_grad_matches_block():
    # Interleaved training sharding (each device owns {shard + j*mesh};
    # the loss permutes the target to match) must reproduce the
    # block-sharded loss and scene gradients on both the jnp and pallas
    # backends — the mean and the psum'd cotangents are order-invariant.
    cfg = RenderConfig(width=32, height=8, max_depth=2, alias_factor=1)
    scene = default_scene()
    target = _target(scene, cfg) * 1.1
    mesh = make_mesh(jax.devices()[:4])
    for backend in ("jnp", "pallas"):
        l1, g1 = loss_and_grad_sharded(scene, cfg, target, mesh,
                                       backend=backend)
        l2, g2 = loss_and_grad_sharded(scene, cfg, target, mesh,
                                       backend=backend, interleave=True)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-8)
