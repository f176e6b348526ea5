"""ctypes bindings for the native C++ oracle renderer (native/rt_oracle.cpp).

The shared library is built on demand with g++ (no pybind11 in this image;
a plain C ABI + ctypes keeps the binding dependency-free).  This is the
framework's native-runtime component: a second, independent implementation
of the strict reference semantics used to cross-validate the numpy oracle,
and a fast CPU golden renderer (~2 orders of magnitude faster than numpy
for full frames thanks to per-ray recursion with real early outs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "rt_oracle.cpp")
_LIB = os.path.join(_REPO, "native", "libraytpu_oracle.so")
_lock = threading.Lock()
_lib = None


def build_library(force: bool = False) -> str:
    """Compile the shared library if missing or stale; returns its path."""
    with _lock:
        stale = (not os.path.exists(_LIB)
                 or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if force or stale:
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-fopenmp",
                   "-o", _LIB, _SRC]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            except subprocess.CalledProcessError as e:
                err = (e.stderr or "").lower()
                if "openmp" not in err and "gomp" not in err:
                    raise RuntimeError(
                        f"g++ failed building {_SRC}:\n{e.stderr}") from e
                cmd.remove("-fopenmp")  # toolchain without libgomp
                subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.rt_render.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,   # spheres
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,   # lights
            ctypes.POINTER(ctypes.c_float),                 # bg
            ctypes.c_int, ctypes.c_int, ctypes.c_float,     # w, h, zoom
            ctypes.c_float, ctypes.c_float,                 # world_w, world_h
            ctypes.c_int, ctypes.c_int, ctypes.c_int,       # alias, cap, wide
            ctypes.c_int64, ctypes.c_int64,                 # offset, count
            ctypes.POINTER(ctypes.c_float),                 # out
        ]
        lib.rt_render.restype = None
        lib.rt_set_fma_mask.argtypes = [ctypes.c_int]
        lib.rt_set_fma_mask.restype = None
        lib.rt_set_approx_mask.argtypes = [ctypes.c_int]
        lib.rt_set_approx_mask.restype = None
        _lib = lib
    return _lib


def set_fma_mask(mask: int) -> None:
    """Select the oracle's FMA-contraction sites (the golden-residual
    experiment; see rt_oracle.cpp's g_fma_mask bit table).  0 = the plain
    strict semantics every bit-parity test pins."""
    _load().rt_set_fma_mask(int(mask))


def set_approx_mask(mask: int) -> None:
    """Select approximate division/sqrt lowerings (the residual study's
    GPU-precision experiment; rt_oracle.cpp g_approx_mask bit table).
    0 = correctly-rounded IEEE, the pinned strict semantics."""
    _load().rt_set_approx_mask(int(mask))


def _pack_tables(scene):
    sph = scene.spheres
    spheres = np.ascontiguousarray(np.stack([
        np.asarray(sph.pos[:, 0]), np.asarray(sph.pos[:, 1]),
        np.asarray(sph.pos[:, 2]), np.asarray(sph.radius),
        np.asarray(sph.matte[:, 0]), np.asarray(sph.matte[:, 1]),
        np.asarray(sph.matte[:, 2]),
        np.asarray(sph.gloss[:, 0]), np.asarray(sph.gloss[:, 1]),
        np.asarray(sph.gloss[:, 2]),
        np.asarray(sph.opacity), np.asarray(sph.ior),
    ]), np.float32)
    lights = np.ascontiguousarray(np.stack([
        np.asarray(scene.lights.pos[:, 0]), np.asarray(scene.lights.pos[:, 1]),
        np.asarray(scene.lights.pos[:, 2]),
        np.asarray(scene.lights.col[:, 0]), np.asarray(scene.lights.col[:, 1]),
        np.asarray(scene.lights.col[:, 2]),
    ]), np.float32)
    bg = np.ascontiguousarray(np.concatenate([
        np.asarray(scene.bg.matte).ravel(),
        [np.float32(scene.bg.ior)], [np.float32(scene.bg.opacity)],
    ]), np.float32)
    return spheres, lights, bg


def render_native(scene, cfg, cap: int = 5, fresnel_double: bool = False,
                  offset: int = 0, count: int | None = None) -> np.ndarray:
    """Strict-semantics render via the C++ oracle.

    Defaults (cap=5, float fresnel) model the configuration that reproduces
    the repo's primary golden testPPM.ppm.  Returns (count, 3) float32, or
    the full (H, W, 3) frame when offset/count are defaulted.
    """
    lib = _load()
    spheres, lights, bg = _pack_tables(scene)
    full = count is None and offset == 0
    if count is None:
        count = cfg.num_pixels - offset
    out = np.empty((count, 3), np.float32)
    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.rt_render(fptr(spheres), spheres.shape[1], fptr(lights),
                  lights.shape[1], fptr(bg), cfg.width, cfg.height,
                  ctypes.c_float(cfg.zoom),
                  ctypes.c_float(cfg.image_world_width),
                  ctypes.c_float(cfg.image_world_height),
                  cfg.alias_factor, cap,
                  int(fresnel_double), offset, count, fptr(out))
    if full:
        return out.reshape(cfg.height, cfg.width, 3)
    return out
