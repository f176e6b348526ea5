import jax.numpy as jnp
import numpy as np

from raytpu.ops.shading import (
    is_significant,
    matte_light_sum,
    polarised_reflection,
    reflect,
    refract,
)
from raytpu.scene import build_scene, make_material


def test_is_significant_threshold_and_nan():
    cols = jnp.asarray([
        [0.0005, 0.0005, 0.0005],   # below 1e-3 everywhere
        [0.0, 0.0, 0.002],          # one channel above
        [jnp.nan, jnp.nan, jnp.nan],  # NaN compares false (C semantics)
    ])
    assert is_significant(cols).tolist() == [False, True, False]


def test_fresnel_normal_incidence_glass():
    # ((1*1 - 1.5*1)/(1*1 + 1.5*1))^2 = 0.04
    r = polarised_reflection(jnp.float32(1.0), jnp.float32(1.5),
                             jnp.float32(1.0), jnp.float32(1.0))
    np.testing.assert_allclose(float(r), 0.04, rtol=1e-5)


def test_fresnel_zero_denominator_full_reflection():
    r = polarised_reflection(jnp.float32(1.0), jnp.float32(1.0),
                             jnp.float32(1e-5), jnp.float32(-1e-5))
    assert float(r) == 1.0


def test_reflect_45_degrees():
    d = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2.0)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    p = jnp.asarray([[0.0, 0.0, 0.0]])
    origin, rd = reflect(d, n, p)
    np.testing.assert_allclose(np.asarray(rd[0]), [1 / np.sqrt(2), 1 / np.sqrt(2), 0],
                               atol=1e-6)
    # origin shifted 0.01 along the reflected direction (raytracer.h:831-838)
    np.testing.assert_allclose(np.asarray(origin[0]), 0.01 * np.asarray(rd[0]),
                               atol=1e-7)


def _glass_scene(ior=1.5):
    mat = make_material(0.0, (1, 1, 1), (0, 0, 0), opacity=0.0, ior=ior)
    return build_scene([((0.0, 0.0, -5.0), 1.0, mat)],
                       [((0, 10, 0), (1, 1, 1))])


def test_refract_normal_incidence_passes_straight():
    scene = _glass_scene()
    # Hit the front of the sphere head-on; probe point is inside it.
    point = jnp.asarray([[0.0, 0.0, -4.0]])
    normal = jnp.asarray([[0.0, 0.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    o, rd, factor, tidx = refract(point, normal, d,
                                  jnp.ones(1), scene.spheres, scene.bg)
    assert int(tidx[0]) == 0  # target medium is the sphere
    np.testing.assert_allclose(np.asarray(o[0]), [0, 0, -4.0], atol=1e-6)
    # straight-through: direction parallel to incident
    rdn = np.asarray(rd[0]) / np.linalg.norm(np.asarray(rd[0]))
    np.testing.assert_allclose(rdn, [0, 0, -1.0], atol=1e-4)
    # Fresnel at normal incidence for n=1->1.5
    np.testing.assert_allclose(float(factor[0]), 0.04, atol=1e-3)


def test_refract_total_internal_reflection():
    scene = _glass_scene(ior=1.5)
    # Ray inside the sphere exiting at a grazing angle: sinA1 > 1/1.5
    point = jnp.asarray([[0.0, 0.0, -4.0]])   # on the sphere surface
    normal = jnp.asarray([[0.0, 0.0, 1.0]])
    s, c = np.sin(np.deg2rad(80)), np.cos(np.deg2rad(80))
    d = jnp.asarray([[s, 0.0, c]], jnp.float32)  # exiting toward background
    o, rd, factor, tidx = refract(point, normal, d,
                                  jnp.full(1, 1.5), scene.spheres, scene.bg)
    assert int(tidx[0]) == -1  # probe point is outside the sphere
    assert float(factor[0]) == 1.0  # clean-mode TIR: full reflection, no NaN
    assert np.isfinite(np.asarray(rd)).all()


def test_matte_light_sum_shadow_and_incidence():
    mat = make_material(0.0, (1, 1, 1), (0, 0, 0), 1.0, 1.0)
    # A blocker sphere sits between the shading point and the light.
    scene = build_scene(
        [((0.0, 5.0, 0.0), 1.0, mat)],
        [((0.0, 10.0, 0.0), (1.0, 1.0, 1.0)),   # shadowed by the blocker
         ((10.0, 0.0, 0.0), (1.0, 1.0, 1.0))])  # clear, grazing-to-normal
    point = jnp.asarray([[0.0, 0.0, 0.0]])
    normal = jnp.asarray([[1.0, 0.0, 0.0]])
    out = matte_light_sum(point, normal, scene.spheres, scene.lights)
    # light 0 blocked; light 1: incidence 1, dist^2 100 -> 0.01
    np.testing.assert_allclose(np.asarray(out[0]), [0.01, 0.01, 0.01], rtol=1e-5)

    # Back-facing light contributes nothing
    normal = jnp.asarray([[-1.0, 0.0, 0.0]])
    out = matte_light_sum(point, normal, scene.spheres, scene.lights)
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 0.0, 0.0], atol=1e-7)
