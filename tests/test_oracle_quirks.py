"""Targeted tests for the reference's quirk semantics, as derived in
raytpu/oracle.py's recursion-with-budget model (SURVEY.md section 3.2).
Each quirk is pinned with a micro-scene where its effect is computable in
closed form, and contrasted with the clean tracer's documented fix."""

import jax.numpy as jnp
import numpy as np

import raytpu.oracle as O
from raytpu.config import RenderConfig
from raytpu.scene import build_scene, make_material
from raytpu.trace import trace_rays

F = np.float32


def _head_on(scene, cap, bg_opacity=0.0):
    d = np.asarray([[0.0, 0.0, -1.0]], F)
    return O.trace_oracle(scene, np.zeros(3, F), d, cap=cap,
                          bg_opacity=bg_opacity)[0]


def _matte_term(scene):
    """The stage-0 emission m for a head-on hit, from oracle internals."""
    sc = O.OracleScene(scene, 0.0)
    o = np.zeros((1, 3), F)
    d = np.asarray([[0.0, 0.0, -1.0]], F)
    found, _, point, normal, _, idx = O._calc_intersection(o, d, sc)
    assert found[0]
    calc = np.ones((1, 3), F) * sc.matte[idx]
    calc = sc.opacity[idx][:, None] * calc
    return (O._calculate_matte(point, normal, sc) * calc)[0]


def _glass(ior, opacity=0.5, gloss=0.0):
    mat = make_material(gloss, (0.6, 0.5, 0.4), (1.0, 1.0, 1.0),
                        opacity=opacity, ior=ior)
    return build_scene([((0.0, 0.0, -5.0), 1.0, mat)],
                       [((0.0, 20.0, 0.0), (1.0, 1.0, 1.0))],
                       bg_opacity=0.0)


def test_truncation_doubles_matte_term():
    # cap=1: the root runs at ancestor-depth cap-1, so both child pushes are
    # silently dropped and the colourSum protocol returns 2m (reflection
    # colour insignificant) or 4m (significant) — raytraceStack.h:52-58
    # interplay with rayTrace's stage machine.
    near_one = _glass(ior=1.0 + 1e-6)   # Fresnel ~ 0 -> reflCol insignificant
    m = _matte_term(near_one)
    np.testing.assert_allclose(_head_on(near_one, cap=1), 2 * m, rtol=1e-6)

    glassy = _glass(ior=1.55)           # Fresnel ~ 0.047 -> significant
    m = _matte_term(glassy)
    np.testing.assert_allclose(_head_on(glassy, cap=1), 4 * m, rtol=1e-6)


def test_stale_coloursum_on_insignificant_child():
    # opacity 0.999: the refracted child's intensity (~0.001*(1-R)) fails
    # isSignificant but still HITS the sphere's far side, so it returns the
    # parent's partial colour -> the parent double-counts its matte term
    # (raytracer.h:458-460 guard leaving colourSum stale).
    scene = _glass(ior=1.0 + 1e-6, opacity=0.999)
    m = _matte_term(scene)
    np.testing.assert_allclose(_head_on(scene, cap=6), 2 * m, rtol=1e-6)

    # The clean tracer's documented fix: an insignificant child contributes
    # nothing, so the result is m alone.
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    clean = np.asarray(trace_rays(scene, jnp.zeros((1, 3)), d,
                                  jnp.ones((1, 3)), 3))[0]
    np.testing.assert_allclose(clean, m, rtol=1e-5)


def test_tir_produces_nan_in_oracle_but_not_clean():
    # Total internal reflection cannot happen for a ray entering a single
    # sphere from outside (Snell symmetry bounds the exit angle at the
    # critical angle), so start the ray INSIDE dense glass at 60 degrees to
    # the exit normal.  The reference's TIR fall-through (raytracer.h:721-730
    # into the NaN sqrt at :776) gives a NaN Fresnel factor; the refracted
    # child has direction (0,0,0) (no quadratic root beats the alignment
    # floor), misses everything, and paints NaN * black = NaN.
    mat = make_material(0.0, (0.1, 0.1, 0.1), (0, 0, 0), opacity=0.2, ior=2.4)
    scene = build_scene([((0.0, 0.0, 0.0), 1.0, mat)],
                        [((0.0, 20.0, 5.0), (1.0, 1.0, 1.0))],
                        bg_opacity=0.0)
    sc = O.OracleScene(scene, 0.0)
    s60, c60 = np.sin(np.deg2rad(60)), np.cos(np.deg2rad(60))
    d = np.asarray([[s60, 0.0, c60]], F)
    # Aim at surface point (0,0,1) so the exit incidence is 60 deg (a ray
    # from the centre would exit radially with zero incidence).
    o = (np.asarray([[0.0, 0.0, 1.0]], F) - F(0.5) * d)
    out = O._trace(o, d, np.ones((1, 3), F),
                   np.broadcast_to(sc.matte[0], (1, 3)).copy(),
                   np.full(1, F(2.4)), np.full(1, F(0.2)),
                   0, np.zeros((1, 3), F), sc, 6)
    assert np.isnan(out).any()

    # The clean tracer's refract() instead reports full reflection, NaN-free
    # (also covered by tests/test_shading.py's TIR test).
    from raytpu.ops.shading import refract
    point = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    normal = point  # unit sphere: outward normal == surface point
    _, rdir, factor, _ = refract(point, normal, jnp.asarray(d),
                                 jnp.full(1, 2.4), scene.spheres, scene.bg)
    assert float(factor[0]) == 1.0
    assert np.isfinite(np.asarray(rdir)).all()


def test_miss_paints_medium_matte():
    # A miss multiplies intensity into the travelling medium's matteColour
    # (raytracer.h:543-546); with a non-black background that is exactly
    # I * bg.matte.
    mat = make_material(0.0, (1, 1, 1), (0, 0, 0), 1.0, 1.0)
    scene = build_scene([((50.0, 0.0, -50.0), 1.0, mat)],
                        [((0.0, 20.0, 0.0), (1, 1, 1))],
                        bg_matte=(0.2, 0.3, 0.4), bg_opacity=0.0)
    out = _head_on(scene, cap=6)
    np.testing.assert_allclose(out, [0.2, 0.3, 0.4], rtol=1e-6)
