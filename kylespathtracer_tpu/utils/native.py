"""ctypes loader for the native runtime library (native/kpt_native.cpp).

Builds lazily with `make -C native` on first use if a toolchain is present;
every entry point has a pure-Python fallback, so the package works without
the shared library (pybind11 is not available in this image — plain C ABI
via ctypes instead).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libkpt_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    lib.kpt_write_png.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p
    ]
    lib.kpt_write_png.restype = ctypes.c_int

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.kpt_march.argtypes = [
        f32p, i32p, ctypes.c_int32,   # planes
        f32p, i32p, ctypes.c_int32,   # spheres
        f32p, i32p, ctypes.c_int32,   # boxes
        f32p, f32p, i32p,             # ro, rd, excl
        ctypes.c_int64, ctypes.c_int32,
        f32p, i32p,
    ]
    lib.kpt_march.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def write_png(path: str, rgb_u8: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(rgb_u8, np.uint8)
    h, w = img.shape[:2]
    rc = lib.kpt_write_png(path.encode(), w, h, img.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise IOError(f"kpt_write_png failed with code {rc}")


def march(scene, ro, rd, exclude=-1, steps: int = 255):
    """C++ re-execution of the sphere tracer (common.glsl:283-295) — an
    independent oracle for tests. scene: scene/types.Scene (host copies)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")

    f32 = lambda a: np.ascontiguousarray(np.asarray(a), np.float32)
    i32 = lambda a: np.ascontiguousarray(np.asarray(a), np.int32)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    planes, plane_ids = f32(scene.planes), i32(scene.plane_ids)
    spheres, sphere_ids = f32(scene.spheres), i32(scene.sphere_ids)
    boxes, box_ids = f32(scene.boxes), i32(scene.box_ids)

    ro_f = f32(ro).reshape(-1, 3)
    rd_f = f32(rd).reshape(-1, 3)
    n = ro_f.shape[0]
    excl = np.broadcast_to(np.asarray(exclude, np.int32), (n,))
    excl = np.ascontiguousarray(excl)
    out_t = np.empty(n, np.float32)
    out_id = np.empty(n, np.int32)

    lib.kpt_march(
        fp(planes), ip(plane_ids), planes.shape[0],
        fp(spheres), ip(sphere_ids), spheres.shape[0],
        fp(boxes), ip(box_ids), boxes.shape[0],
        fp(ro_f), fp(rd_f), ip(excl),
        n, steps, fp(out_t), ip(out_id),
    )
    shape = np.asarray(ro).shape[:-1]
    return out_t.reshape(shape), out_id.reshape(shape)
