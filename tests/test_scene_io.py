import jax
import numpy as np

from raytpu.scene import default_scene, random_scene
from raytpu.scene_io import load_scene, save_scene


def test_scene_json_roundtrip(tmp_path):
    for scene in (default_scene(), random_scene(5, seed=2)):
        path = str(tmp_path / "s.json")
        save_scene(scene, path)
        back = load_scene(path)
        for a, b in zip(jax.tree_util.tree_leaves(scene),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
