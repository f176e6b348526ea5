"""Scene (de)serialisation.

The reference has no scene file format — `scene.h` is an empty include
(SURVEY.md section 2.2) and the scene is hard-coded in main().  raytpu adds
a minimal JSON schema so scenes are shareable artifacts:

{
  "spheres": [{"pos": [x,y,z], "radius": r,
               "matte": [r,g,b], "gloss": [r,g,b],      # pre-split values
               "opacity": o, "ior": n}, ...],
  "lights":  [{"pos": [x,y,z], "col": [r,g,b]}, ...],
  "background": {"matte": [r,g,b], "ior": n, "opacity": o}
}

`matte`/`gloss` store the already-balanced values (what the pytree holds);
use raytpu.scene.make_material to build them from a gloss factor.
"""

from __future__ import annotations

import json

import numpy as np

from raytpu.scene import Scene, build_scene


def scene_to_dict(scene: Scene) -> dict:
    sph = scene.spheres
    return {
        "spheres": [
            {
                "pos": np.asarray(sph.pos[i]).tolist(),
                "radius": float(sph.radius[i]),
                "matte": np.asarray(sph.matte[i]).tolist(),
                "gloss": np.asarray(sph.gloss[i]).tolist(),
                "opacity": float(sph.opacity[i]),
                "ior": float(sph.ior[i]),
            }
            for i in range(sph.count)
        ],
        "lights": [
            {"pos": np.asarray(scene.lights.pos[i]).tolist(),
             "col": np.asarray(scene.lights.col[i]).tolist()}
            for i in range(scene.lights.count)
        ],
        "background": {
            "matte": np.asarray(scene.bg.matte).tolist(),
            "ior": float(scene.bg.ior),
            "opacity": float(scene.bg.opacity),
        },
    }


def scene_from_dict(data: dict) -> Scene:
    sphere_specs = [
        (s["pos"], s["radius"],
         dict(matte=np.asarray(s["matte"], np.float32),
              gloss=np.asarray(s["gloss"], np.float32),
              opacity=np.float32(s["opacity"]),
              ior=np.float32(s["ior"])))
        for s in data["spheres"]
    ]
    light_specs = [(l["pos"], l["col"]) for l in data["lights"]]
    bg = data.get("background", {})
    return build_scene(sphere_specs, light_specs,
                       bg_matte=bg.get("matte", (0.0, 0.0, 0.0)),
                       bg_ior=bg.get("ior", 1.0),
                       bg_opacity=bg.get("opacity", 0.0))


def save_scene(scene: Scene, path: str) -> None:
    with open(path, "w") as f:
        json.dump(scene_to_dict(scene), f, indent=2)


def load_scene(path: str) -> Scene:
    with open(path) as f:
        return scene_from_dict(json.load(f))
