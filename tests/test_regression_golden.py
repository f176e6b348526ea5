"""Regression goldens rendered by this framework (the analogue of the
reference's checked-in testPPM artifacts): guards against accidental
semantic drift in the clean tracer.  Regenerate deliberately with
tools/regen_goldens.py when semantics change on purpose."""

import os

import numpy as np

from raytpu.config import RenderConfig
from raytpu.image import read_ppm, tone_map
from raytpu.scene import default_scene
from raytpu.trace import render_image

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def test_default_scene_regression():
    cfg = RenderConfig(width=160, height=120, max_depth=4, alias_factor=3)
    img = np.asarray(render_image(default_scene(), cfg))
    ref_linear = np.load(os.path.join(GOLDEN_DIR, "default_160x120_d4_linear.npy"))
    np.testing.assert_allclose(img, ref_linear, rtol=1e-5, atol=1e-10)
    ref_ppm = read_ppm(os.path.join(GOLDEN_DIR, "default_160x120_d4.ppm"))
    np.testing.assert_array_equal(tone_map(img), ref_ppm)
