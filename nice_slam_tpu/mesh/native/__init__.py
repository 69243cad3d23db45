"""ctypes loader for the native geometry library (builds lazily with g++).

pybind11 is not available in the target image, so the C ABI + ctypes is the
binding layer (see repo build notes).  The .so is cached next to the source
and rebuilt when the source is newer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'geometry.cpp')
_LIB = os.path.join(_DIR, 'libnstpu_geometry.so')

_lib = None


def _build() -> None:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)

    lib.nstpu_marching_tetrahedra.restype = ctypes.c_int
    lib.nstpu_marching_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_float),                     # field
        ctypes.c_int, ctypes.c_int, ctypes.c_int,           # nx ny nz
        ctypes.POINTER(ctypes.c_double),                    # xs
        ctypes.POINTER(ctypes.c_double),                    # ys
        ctypes.POINTER(ctypes.c_double),                    # zs
        ctypes.c_float,                                     # level
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),     # out_verts
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),       # out_tris
        ctypes.POINTER(ctypes.c_int),                       # n_verts
        ctypes.POINTER(ctypes.c_int),                       # n_tris
    ]
    lib.nstpu_free.argtypes = [ctypes.c_void_p]
    lib.nstpu_rasterize_depth.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,       # verts
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,         # tris
        ctypes.POINTER(ctypes.c_float),                     # w2c (4x4)
        ctypes.c_float, ctypes.c_float,                     # fx fy
        ctypes.c_float, ctypes.c_float,                     # cx cy
        ctypes.c_int, ctypes.c_int,                         # H W
        ctypes.POINTER(ctypes.c_float),                     # out_depth
    ]
    _lib = lib
    return lib


def marching_tetrahedra(field: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                        zs: np.ndarray, level: float
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a scalar field.

    Args:
      field: [nx, ny, nz] float32, x-major C-order.
      xs/ys/zs: axis coordinates (float64) of the lattice nodes.
    Returns:
      (verts [V, 3] float32 world coords, tris [T, 3] int32).
    """
    lib = get_lib()
    field = np.ascontiguousarray(field, dtype=np.float32)
    xs = np.ascontiguousarray(xs, dtype=np.float64)
    ys = np.ascontiguousarray(ys, dtype=np.float64)
    zs = np.ascontiguousarray(zs, dtype=np.float64)
    nx, ny, nz = field.shape

    out_v = ctypes.POINTER(ctypes.c_float)()
    out_t = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    rc = lib.nstpu_marching_tetrahedra(
        field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        zs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_float(level),
        ctypes.byref(out_v), ctypes.byref(out_t),
        ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        raise MemoryError('marching_tetrahedra allocation failed')
    try:
        verts = np.ctypeslib.as_array(out_v, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        tris = np.ctypeslib.as_array(out_t, shape=(nt.value, 3)).copy() \
            if nt.value else np.zeros((0, 3), np.int32)
    finally:
        lib.nstpu_free(out_v)
        lib.nstpu_free(out_t)
    return verts, tris


def rasterize_depth(verts: np.ndarray, tris: np.ndarray, w2c: np.ndarray,
                    fx: float, fy: float, cx: float, cy: float,
                    h: int, w: int) -> np.ndarray:
    """Render the mesh's depth (CV pinhole, +z forward). 0 = no hit."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, dtype=np.float32)
    tris = np.ascontiguousarray(tris, dtype=np.int32)
    w2c = np.ascontiguousarray(w2c, dtype=np.float32)
    out = np.zeros((h, w), dtype=np.float32)
    lib.nstpu_rasterize_depth(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(tris),
        w2c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fx, fy, cx, cy, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
