import jax.numpy as jnp
import numpy as np

from raytpu.ops.geometry import closest_hit, primary_container, ray_sphere_t
from raytpu.scene import build_scene, make_material


def _spheres(*specs):
    mat = make_material(0.0, (1, 1, 1), (0, 0, 0), 1.0, 1.0)
    return build_scene([(p, r, mat) for p, r in specs], [((0, 10, 0), (1, 1, 1))]).spheres


def test_ray_sphere_head_on():
    sph = _spheres(((0.0, 0.0, -5.0), 1.0))
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, found = ray_sphere_t(o, d, sph.pos, sph.radius)
    assert bool(found[0, 0])
    np.testing.assert_allclose(float(t[0, 0]), 4.0, atol=1e-5)


def test_ray_sphere_from_inside_takes_far_root():
    sph = _spheres(((0.0, 0.0, 0.0), 2.0))
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, found = ray_sphere_t(o, d, sph.pos, sph.radius)
    assert bool(found[0, 0])
    np.testing.assert_allclose(float(t[0, 0]), 2.0, atol=1e-5)


def test_ray_sphere_miss_and_behind():
    sph = _spheres(((0.0, 0.0, 5.0), 1.0))  # behind the -z ray
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, found = ray_sphere_t(o, d, sph.pos, sph.radius)
    assert not bool(found[0, 0])
    assert float(t[0, 0]) == 10000.0  # smallestT sentinel, raytracer.h:119


def test_closest_hit_picks_nearest_and_lowest_index_on_tie():
    sph = _spheres(((0.0, 0.0, -10.0), 1.0), ((0.0, 0.0, -5.0), 1.0),
                   ((0.0, 0.0, -5.0), 1.0))
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = closest_hit(o, d, sph)
    assert bool(hit.found[0])
    assert int(hit.index[0]) == 1  # nearest, and index 1 beats the tied 2
    np.testing.assert_allclose(float(hit.t[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(float(hit.sq_dist[0]), 16.0, rtol=1e-5)


def test_closest_hit_respects_max_render_dist():
    sph = _spheres(((0.0, 0.0, -2000.0), 1.0))  # beyond kMaxRenderDist=1000
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = closest_hit(o, d, sph)
    assert not bool(hit.found[0])


def test_primary_container_first_match_and_epsilon():
    sph = _spheres(((0.0, 0.0, 0.0), 1.0), ((0.0, 0.0, 0.0), 2.0))
    pts = jnp.asarray([
        [0.0, 0.0, 0.5],    # inside both -> index 0 (first match)
        [0.0, 0.0, 1.5],    # only in sphere 1
        [0.0, 0.0, 9.0],    # outside -> -1
        [0.0, 0.0, 1.0],    # on the boundary: inside via +1e-6 inflation
    ])
    idx = primary_container(pts, sph)
    assert idx.tolist() == [0, 1, -1, 0]
