import jax
import numpy as np
import pytest

from raytpu.config import RenderConfig
from raytpu.parallel.mesh import describe_devices, make_mesh
from raytpu.render import render_image, render_sharded, render_timed
from raytpu.scene import default_scene


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8, describe_devices()


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_matches_single_device(ndev):
    scene = default_scene()
    cfg = RenderConfig(width=40, height=20, max_depth=3, alias_factor=1)
    mesh = make_mesh(jax.devices()[:ndev])
    ours = np.asarray(render_sharded(scene, cfg, mesh))
    ref = np.asarray(render_image(scene, cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


def test_sharded_nondivisible_pixel_count():
    # 17x3 = 51 pixels over 8 devices: padding path.
    scene = default_scene()
    cfg = RenderConfig(width=17, height=3, max_depth=1, alias_factor=1)
    mesh = make_mesh()
    ours = np.asarray(render_sharded(scene, cfg, mesh))
    ref = np.asarray(render_image(scene, cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_pallas_matches_single_device(ndev):
    # The sharded Pallas path (per-shard `offset=gid[0]` wiring and the
    # check_vma=False escape hatch, raytpu/render.py) under the CPU mesh:
    # off-TPU the kernel runs in interpret mode, so this exercises the real
    # shard_map + pallas_call composition end to end.
    scene = default_scene()
    cfg = RenderConfig(width=64, height=8, max_depth=2, alias_factor=1)
    mesh = make_mesh(jax.devices()[:ndev])
    ours = np.asarray(render_sharded(scene, cfg, mesh, backend="pallas"))
    ref = np.asarray(render_image(scene, cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_render_timed_stats():
    scene = default_scene()
    cfg = RenderConfig(width=16, height=8, max_depth=1, alias_factor=1)
    img, stats = render_timed(scene, cfg, warmup=1, iters=2)
    assert img.shape == (8, 16, 3)
    assert stats["primary_rays"] == 16 * 8
    assert stats["mrays_per_s"] > 0
