import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.config import RenderConfig
from raytpu.scene import default_scene
from raytpu.utils.checkpoint import load_checkpoint, save_checkpoint
from raytpu.utils.debug import checked_render
from raytpu.utils.profiling import Timer


def test_checked_render_clean_scene():
    cfg = RenderConfig(width=16, height=8, max_depth=1, alias_factor=1)
    err, img = checked_render(default_scene(), cfg)
    err.throw()  # no NaN/Inf anywhere in the trace
    assert img.shape == (8, 16, 3)


def test_checkpoint_roundtrip(tmp_path):
    scene = default_scene()
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, scene)
    moved = dataclasses.replace(
        scene, spheres=dataclasses.replace(scene.spheres,
                                           pos=scene.spheres.pos + 1.0))
    restored = load_checkpoint(path, moved)
    np.testing.assert_array_equal(np.asarray(restored.spheres.pos),
                                  np.asarray(scene.spheres.pos))


def test_checkpoint_shape_mismatch(tmp_path):
    scene = default_scene()
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, scene)
    bad = dataclasses.replace(
        scene, spheres=dataclasses.replace(
            scene.spheres, pos=jnp.zeros((5, 3), jnp.float32)))
    with pytest.raises(ValueError):
        load_checkpoint(path, bad)


def test_timer_sections():
    t = Timer()
    with t.section("a"):
        sum(range(1000))
    assert "a" in t.summary() and t.summary()["a"] >= 0
