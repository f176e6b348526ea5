"""Regenerate this repo's own regression goldens (tests/goldens/).

Only run when tracer semantics change DELIBERATELY; commit the new goldens
with an explanation of the semantic change.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from raytpu.config import RenderConfig
from raytpu.image import write_ppm
from raytpu.scene import default_scene
from raytpu.trace import render_image

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")


def main():
    cfg = RenderConfig(width=160, height=120, max_depth=4, alias_factor=3)
    img = np.asarray(render_image(default_scene(), cfg))
    write_ppm(img, os.path.join(GOLDEN_DIR, "default_160x120_d4.ppm"))
    np.save(os.path.join(GOLDEN_DIR, "default_160x120_d4_linear.npy"), img)
    print(f"regenerated goldens in {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
