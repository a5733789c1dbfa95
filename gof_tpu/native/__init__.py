"""Native scene-IO runtime (C++ via ctypes), with transparent Python fallback.

`load()` returns the shared library or None; gof_tpu.data.colmap uses it when
present and falls back to the pure-Python parsers otherwise. Build with
`python -m gof_tpu.native.build`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(__file__), "libgof_io.so")


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    c = ctypes.c_longlong
    p = ctypes.c_char_p
    lib.colmap_count_points3d.restype = c
    lib.colmap_count_points3d.argtypes = [p]
    lib.colmap_read_points3d.restype = c
    lib.colmap_read_points3d.argtypes = [p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, c]
    lib.colmap_count_images.restype = c
    lib.colmap_count_images.argtypes = [p]
    lib.colmap_read_images.restype = c
    lib.colmap_read_images.argtypes = [p] + [ctypes.c_void_p] * 5 + [c, c]
    lib.colmap_read_cameras.restype = c
    lib.colmap_read_cameras.argtypes = [p] + [ctypes.c_void_p] * 4 + [c]
    _LIB = lib
    return _LIB


def read_points3d_native(path: str):
    import numpy as np

    lib = load()
    if lib is None:
        return None
    n = lib.colmap_count_points3d(path.encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    got = lib.colmap_read_points3d(
        path.encode(), xyz.ctypes.data, rgb.ctypes.data, err.ctypes.data, n
    )
    if got != n:
        return None
    return xyz, rgb, err


def read_images_native(path: str):
    import numpy as np

    lib = load()
    if lib is None:
        return None
    n = lib.colmap_count_images(path.encode())
    if n < 0:
        return None
    stride = 512
    ids = np.empty((n,), np.int32)
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_ids = np.empty((n,), np.int32)
    names = np.zeros((n, stride), np.uint8)
    got = lib.colmap_read_images(
        path.encode(), ids.ctypes.data, qvec.ctypes.data, tvec.ctypes.data,
        cam_ids.ctypes.data, names.ctypes.data, stride, n,
    )
    if got != n:
        return None
    name_list = [bytes(names[i]).split(b"\0", 1)[0].decode() for i in range(n)]
    return ids, qvec, tvec, cam_ids, name_list


def read_cameras_native(path: str):
    import numpy as np

    lib = load()
    if lib is None:
        return None
    # cameras.bin is tiny; over-allocate generously
    cap = 4096
    ids = np.empty((cap,), np.int32)
    models = np.empty((cap,), np.int32)
    wh = np.empty((cap, 2), np.int64)
    params = np.empty((cap, 12), np.float64)
    got = lib.colmap_read_cameras(
        path.encode(), ids.ctypes.data, models.ctypes.data, wh.ctypes.data,
        params.ctypes.data, cap,
    )
    if got < 0:
        return None
    n = int(got)
    return ids[:n], models[:n], wh[:n], params[:n]
