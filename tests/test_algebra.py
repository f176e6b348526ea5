import jax.numpy as jnp
import numpy as np

from raytpu.ops.algebra import is_zero, max_colour_value, solve_quadratic


def test_two_distinct_roots():
    # x^2 - 3x + 2 = 0 -> roots 2, 1 (order: (+) root first, algebra.h:58-59)
    roots, n = solve_quadratic(1.0, -3.0, 2.0)
    assert int(n) == 2
    np.testing.assert_allclose(np.asarray(roots), [2.0, 1.0], atol=1e-6)


def test_double_root_collapse_uses_tol():
    # radicand = b^2 - 4ac = 1e-4 < TOL=1e-3 counts as zero (algebra.h:45)
    b = 1.0
    c = (b * b - 1e-4) / 4.0
    roots, n = solve_quadratic(1.0, b, c)
    assert int(n) == 1
    np.testing.assert_allclose(np.asarray(roots), [-0.5, -0.5], atol=1e-6)


def test_linear_fallback():
    roots, n = solve_quadratic(0.0, 2.0, -4.0)
    assert int(n) == 1
    np.testing.assert_allclose(np.asarray(roots), [2.0, 2.0], atol=1e-6)


def test_degenerate_no_roots():
    _, n = solve_quadratic(0.0, 0.0, 5.0)
    assert int(n) == 0


def test_small_a_counts_as_zero():
    # |a| < 1e-3 takes the linear branch (algebra.h:24)
    roots, n = solve_quadratic(5e-4, 2.0, -4.0)
    assert int(n) == 1
    np.testing.assert_allclose(np.asarray(roots)[0], 2.0, atol=1e-6)


def test_batched_shapes():
    a = jnp.ones((4, 5))
    roots, n = solve_quadratic(a, -3.0 * a, 2.0 * a)
    assert roots.shape == (4, 5, 2)
    assert n.shape == (4, 5)


def test_is_zero():
    assert bool(is_zero(5e-4))
    assert not bool(is_zero(2e-3))


def test_max_colour_value():
    img = jnp.asarray([[[0.1, 0.9, 0.3]], [[0.2, 0.0, 0.5]]])
    assert float(max_colour_value(img)) == np.float32(0.9)
    # all-black guard (algebra.h:86-88)
    assert float(max_colour_value(jnp.zeros((2, 2, 3)))) == 1.0
    # NaN channels never win the scan
    img = img.at[0, 0, 0].set(jnp.nan)
    assert float(max_colour_value(img)) == np.float32(0.9)
