"""ctypes bindings for the native host runtime (gs_native.cpp).

The shared library is built on demand with g++ (no pybind11 in this image;
the C ABI + ctypes keeps the build one compiler invocation).  All callers
fall back to the pure-Python implementations when the toolchain or image
libraries are unavailable, so the framework never hard-requires the native
layer — it is a performance path, like the reference's compiled submodules.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "gs_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libgs_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build(out: str = _LIB_PATH) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", out, "-ljpeg", "-lpng",
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if result.returncode != 0:
        print(f"gs_native build failed:\n{result.stderr[-2000:]}")
        return False
    return True


def _smoke_test(lib) -> bool:
    """Cheap correctness call to reject a stale/foreign-arch binary.

    The .so is never committed (built per-host because of -march=native); this
    guards the remaining case of a cached build from a different toolchain.
    """
    try:
        pts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
        )
        out = np.empty((4,), np.float32)
        rc = lib.knn_mean_sq_dist(
            _ptr(pts, ctypes.c_float), 4, 16, _ptr(out, ctypes.c_float)
        )
        # origin's neighbours: sq dists {1,1,1}; each axis point: {1,2,2}
        expect = np.array([1.0, 5 / 3, 5 / 3, 5 / 3], np.float32)
        return rc == 0 and np.allclose(out, expect, atol=1e-5)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        c_ll = ctypes.c_longlong
        c_i = ctypes.c_int
        p_d = ctypes.POINTER(ctypes.c_double)
        p_u8 = ctypes.POINTER(ctypes.c_uint8)
        p_i = ctypes.POINTER(ctypes.c_int)
        p_ll = ctypes.POINTER(c_ll)
        p_f = ctypes.POINTER(ctypes.c_float)

        lib.colmap_read_points3d.restype = c_ll
        lib.colmap_read_points3d.argtypes = [ctypes.c_char_p, p_d, p_u8, p_d, p_ll]
        lib.colmap_read_images.restype = c_ll
        lib.colmap_read_images.argtypes = [
            ctypes.c_char_p, c_i, p_d, p_i, p_ll, p_u8, c_ll, p_ll,
        ]
        lib.colmap_read_cameras.restype = c_ll
        lib.colmap_read_cameras.argtypes = [ctypes.c_char_p, p_ll, p_d, c_ll]
        lib.image_decode.restype = c_i
        lib.image_decode.argtypes = [ctypes.c_char_p, p_u8, p_ll]
        lib.image_resize_bilinear_u8.restype = c_i
        lib.image_resize_bilinear_u8.argtypes = [p_u8, c_ll, c_ll, c_ll, p_u8, c_ll, c_ll]
        lib.image_u8_hwc_to_f32_chw.restype = c_i
        lib.image_u8_hwc_to_f32_chw.argtypes = [p_u8, c_ll, c_ll, c_ll, p_f]
        lib.knn_mean_sq_dist.restype = c_i
        lib.knn_mean_sq_dist.argtypes = [p_f, c_ll, c_i, p_f]
        if not _smoke_test(lib):
            # Stale cached binary. Rebuild into a fresh path (dlopen caches
            # by path, so reloading _LIB_PATH would return the old mapping).
            # Use a temp dir, not a pid-suffixed file in the package dir —
            # those accumulate across runs and leak into git status.
            import tempfile

            retry = os.path.join(
                tempfile.mkdtemp(prefix="gs_native_"), "libgs_native.so"
            )
            # clean up retry artifacts older builds may have left behind
            for stale in (
                p for p in os.listdir(os.path.dirname(_LIB_PATH))
                if p.startswith("libgs_native.so.")
            ):
                try:
                    os.unlink(os.path.join(os.path.dirname(_LIB_PATH), stale))
                except OSError:
                    pass
            if not _build(out=retry):
                _build_failed = True
                return None
            try:
                lib = ctypes.CDLL(retry)
            except OSError:
                _build_failed = True
                return None
            lib.knn_mean_sq_dist.restype = c_i
            lib.knn_mean_sq_dist.argtypes = [p_f, c_ll, c_i, p_f]
            if not _smoke_test(lib):
                _build_failed = True
                return None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------- COLMAP


def read_points3d_binary(path: str, return_ids: bool = False):
    """Native points3D.bin parse; same contract as data.colmap's reader."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = lib.colmap_read_points3d(path.encode(), None, None, None, None)
    if n < 0:
        raise IOError(f"failed to read {path}")
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    ids = np.empty((n,), np.int64)
    got = lib.colmap_read_points3d(
        path.encode(),
        _ptr(xyz, ctypes.c_double),
        _ptr(rgb, ctypes.c_uint8),
        _ptr(err, ctypes.c_double),
        _ptr(ids, ctypes.c_longlong),
    )
    if got != n:
        raise IOError(f"short read of {path}")
    if return_ids:
        return xyz, rgb, err, ids
    return xyz, rgb, err


def read_images_binary(path: str, load_points2d: bool = False):
    """Native images.bin parse -> dict[id, ColmapImage]."""
    from gaussian_splatting_tpu.data.colmap import ColmapImage

    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    want = 1 if load_points2d else 0
    counts = np.zeros(1, np.int64)
    blob_needed = lib.colmap_read_images(
        path.encode(), want, None, None, None, None, 0, _ptr(counts, ctypes.c_longlong)
    )
    if blob_needed < 0:
        raise IOError(f"failed to read {path}")
    n = int(counts[0])
    meta = np.empty((n, 7), np.float64)
    ids = np.empty((n, 2), np.int32)
    npts = np.empty((n,), np.int64)
    blob = np.empty((max(blob_needed, 1),), np.uint8)
    used = lib.colmap_read_images(
        path.encode(), want,
        _ptr(meta, ctypes.c_double),
        _ptr(ids, ctypes.c_int),
        _ptr(npts, ctypes.c_longlong),
        _ptr(blob, ctypes.c_uint8),
        blob_needed,
        _ptr(counts, ctypes.c_longlong),
    )
    if used < 0:
        raise IOError(f"failed to parse {path}")

    out = {}
    off = 0
    raw = blob.tobytes()
    rec_dt = np.dtype([("x", "<f8"), ("y", "<f8"), ("id", "<i8")])
    for i in range(n):
        end = raw.index(b"\x00", off)
        name = raw[off:end].decode("utf-8")
        off = end + 1
        xys = p3d = None
        if load_points2d:
            m = int(npts[i])
            rec = np.frombuffer(raw, dtype=rec_dt, count=m, offset=off)
            xys = np.stack([rec["x"], rec["y"]], axis=-1)
            p3d = rec["id"].copy()
            off += 24 * m
        out[int(ids[i, 0])] = ColmapImage(
            int(ids[i, 0]), meta[i, :4].copy(), meta[i, 4:7].copy(),
            int(ids[i, 1]), name, xys, p3d,
        )
    return out


def read_cameras_binary(path: str):
    """Native cameras.bin parse -> dict[id, ColmapCamera]."""
    from gaussian_splatting_tpu.data.colmap import CAMERA_MODELS, ColmapCamera

    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = lib.colmap_read_cameras(path.encode(), None, None, 0)
    if n < 0:
        raise IOError(f"failed to read {path}")
    out_meta = np.empty((n, 5), np.int64)
    params = np.empty((n, 12), np.float64)
    got = lib.colmap_read_cameras(
        path.encode(),
        _ptr(out_meta, ctypes.c_longlong),
        _ptr(params, ctypes.c_double),
        n,
    )
    if got != n:
        raise IOError(f"short read of {path}")
    out = {}
    for i in range(n):
        cam_id, model_id, w, h, np_ = (int(v) for v in out_meta[i])
        name, _ = CAMERA_MODELS[model_id]
        out[cam_id] = ColmapCamera(cam_id, name, w, h, params[i, :np_].copy())
    return out


# ---------------------------------------------------------------- images


def decode_image(path: str):
    """Decode JPEG/PNG to a numpy array.

    Returns (H, W, C) uint8 for color/gray images, or (H, W) uint16 for
    16-bit grayscale depth PNGs.
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    dims = np.zeros(3, np.int64)
    rc = lib.image_decode(path.encode(), None, _ptr(dims, ctypes.c_longlong))
    if rc != 0:
        raise IOError(f"failed to decode {path} (rc={rc})")
    h, w, c = int(dims[0]), int(dims[1]), int(dims[2])
    if c == -1:  # 16-bit grayscale
        out = np.empty((h, w), np.uint16)
    else:
        out = np.empty((h, w, c), np.uint8)
    rc = lib.image_decode(
        path.encode(), out.view(np.uint8).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _ptr(dims, ctypes.c_longlong)
    )
    if rc != 0:
        raise IOError(f"failed to decode {path} (rc={rc})")
    return out


def resize_bilinear(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear-resize (H, W, C) or (H, W) uint8."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    img = np.ascontiguousarray(img)
    out = np.empty((height, width, img.shape[2]), np.uint8)
    rc = lib.image_resize_bilinear_u8(
        _ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1], img.shape[2],
        _ptr(out, ctypes.c_uint8), height, width,
    )
    if rc != 0:
        raise ValueError("resize failed")
    return out[..., 0] if squeeze else out


def to_float_chw(img_u8_hwc: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 -> (C, H, W) float32 in [0, 1]."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img_u8_hwc)
    h, w, c = img.shape
    out = np.empty((c, h, w), np.float32)
    lib.image_u8_hwc_to_f32_chw(
        _ptr(img, ctypes.c_uint8), h, w, c, _ptr(out, ctypes.c_float)
    )
    return out


# ---------------------------------------------------------------- KNN


def knn_mean_sq_dist(points: np.ndarray, window: int = 16) -> np.ndarray:
    """Host-side Morton-window 3-NN mean squared distance (simple-knn role)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty((pts.shape[0],), np.float32)
    rc = lib.knn_mean_sq_dist(
        _ptr(pts, ctypes.c_float), pts.shape[0], window, _ptr(out, ctypes.c_float)
    )
    if rc != 0:
        raise ValueError("knn failed")
    return out
