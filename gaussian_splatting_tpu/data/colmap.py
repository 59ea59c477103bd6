"""COLMAP sparse-reconstruction readers (binary and text).

Fresh implementation of the standard COLMAP model format (the reference
carries its own copy in ``scene/colmap_loader.py``; the on-disk format is
COLMAP's public spec).  Reads cameras.bin/.txt, images.bin/.txt,
points3D.bin/.txt from a ``sparse/0`` directory.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

# COLMAP camera model ids -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
_MODEL_BY_NAME = {name: (mid, n) for mid, (name, n) in CAMERA_MODELS.items()}


@dataclass
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray  # (4,) wxyz
    tvec: np.ndarray  # (3,)
    camera_id: int
    name: str
    xys: np.ndarray = None  # (M, 2) 2D observations (when load_points2d)
    point3d_ids: np.ndarray = None  # (M,) int64, -1 = no 3D point


def qvec_to_rotmat(q: np.ndarray) -> np.ndarray:
    """COLMAP wxyz quaternion -> rotation matrix."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> COLMAP wxyz quaternion (largest-component method)."""
    K = (
        np.array(
            [
                [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
                [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
                [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
                [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1], R[0, 0] + R[1, 1] + R[2, 2]],
            ]
        )
        / 3.0
    )
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return -q if q[0] < 0 else q


# ------------------------------------------------------------------ binary


def _read(f, fmt: str):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_cameras_binary(path: str) -> Dict[int, ColmapCamera]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cam_id, model_id, width, height = _read(f, "<iiQQ")
            name, nparams = CAMERA_MODELS[model_id]
            params = np.array(_read(f, f"<{nparams}d"))
            out[cam_id] = ColmapCamera(cam_id, name, int(width), int(height), params)
    return out


def read_images_binary(path: str, load_points2d: bool = False) -> Dict[int, ColmapImage]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            img_id = _read(f, "<i")[0]
            qvec = np.array(_read(f, "<4d"))
            tvec = np.array(_read(f, "<3d"))
            cam_id = _read(f, "<i")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (npts,) = _read(f, "<Q")
            xys = p3d = None
            if load_points2d:
                # records of (x f64, y f64, point3D_id i64)
                rec = np.frombuffer(
                    f.read(24 * npts),
                    dtype=np.dtype([("x", "<f8"), ("y", "<f8"), ("id", "<i8")]),
                )
                xys = np.stack([rec["x"], rec["y"]], axis=-1)
                p3d = rec["id"].copy()
            else:
                f.seek(24 * npts, os.SEEK_CUR)
            out[img_id] = ColmapImage(
                img_id, qvec, tvec, cam_id, name.decode("utf-8"), xys, p3d
            )
    return out


def read_points3d_binary(path: str, return_ids: bool = False):
    """Returns (xyz (N,3) f64, rgb (N,3) u8, errors (N,)) [+ ids (N,) i64]."""
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        xyz = np.empty((n, 3), np.float64)
        rgb = np.empty((n, 3), np.uint8)
        err = np.empty((n,), np.float64)
        ids = np.empty((n,), np.int64)
        for i in range(n):
            data = _read(f, "<Q3d3Bd")
            ids[i] = data[0]
            xyz[i] = data[1:4]
            rgb[i] = data[4:7]
            err[i] = data[7]
            (track_len,) = _read(f, "<Q")
            f.seek(8 * track_len, os.SEEK_CUR)
    if return_ids:
        return xyz, rgb, err, ids
    return xyz, rgb, err


# ------------------------------------------------------------------ text


def read_cameras_text(path: str) -> Dict[int, ColmapCamera]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cam_id = int(parts[0])
            out[cam_id] = ColmapCamera(
                cam_id,
                parts[1],
                int(parts[2]),
                int(parts[3]),
                np.array([float(p) for p in parts[4:]]),
            )
    return out


def read_images_text(path: str, load_points2d: bool = False) -> Dict[int, ColmapImage]:
    out = {}
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    for meta, pts_line in zip(lines[0::2], lines[1::2]):
        parts = meta.split()
        img_id = int(parts[0])
        qvec = np.array([float(p) for p in parts[1:5]])
        tvec = np.array([float(p) for p in parts[5:8]])
        xys = p3d = None
        if load_points2d:
            vals = np.array(pts_line.split(), np.float64).reshape(-1, 3)
            xys = vals[:, :2]
            p3d = vals[:, 2].astype(np.int64)
        out[img_id] = ColmapImage(
            img_id, qvec, tvec, int(parts[8]), parts[9], xys, p3d
        )
    return out


def read_points3d_text(path: str, return_ids: bool = False):
    xyz, rgb, err, ids = [], [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            ids.append(int(parts[0]))
            xyz.append([float(p) for p in parts[1:4]])
            rgb.append([int(p) for p in parts[4:7]])
            err.append(float(parts[7]))
    out = (
        np.asarray(xyz, np.float64),
        np.asarray(rgb, np.uint8),
        np.asarray(err, np.float64),
    )
    if return_ids:
        return out + (np.asarray(ids, np.int64),)
    return out


# ------------------------------------------------------------------ writers (for tests / synthetic scenes)


def write_cameras_binary(path: str, cams: Dict[int, ColmapCamera]) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cam in cams.values():
            mid, nparams = _MODEL_BY_NAME[cam.model]
            f.write(struct.pack("<iiQQ", cam.id, mid, cam.width, cam.height))
            f.write(struct.pack(f"<{nparams}d", *cam.params))


def write_images_binary(path: str, images: Dict[int, ColmapImage]) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images.values():
            f.write(struct.pack("<i", im.id))
            f.write(struct.pack("<4d", *im.qvec))
            f.write(struct.pack("<3d", *im.tvec))
            f.write(struct.pack("<i", im.camera_id))
            f.write(im.name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))


def write_points3d_binary(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *xyz[i]))
            f.write(struct.pack("<3B", *rgb[i].astype(np.uint8)))
            f.write(struct.pack("<d", 1.0))
            f.write(struct.pack("<Q", 0))


def load_sparse_model(sparse_dir: str):
    """Load (cameras, images, points) with bin -> txt fallback
    (scene/dataset_readers.py:146-155).  Binary parsing prefers the native
    C++ runtime (gaussian_splatting_tpu.native) when it is available."""
    if os.path.exists(os.path.join(sparse_dir, "cameras.bin")):
        try:
            from gaussian_splatting_tpu import native

            if not native.available():
                raise RuntimeError
            cams = native.read_cameras_binary(os.path.join(sparse_dir, "cameras.bin"))
            imgs = native.read_images_binary(os.path.join(sparse_dir, "images.bin"))
            pts_bin = os.path.join(sparse_dir, "points3D.bin")
            if os.path.exists(pts_bin):
                return cams, imgs, native.read_points3d_binary(pts_bin)
        except Exception:
            pass
        cams = read_cameras_binary(os.path.join(sparse_dir, "cameras.bin"))
        imgs = read_images_binary(os.path.join(sparse_dir, "images.bin"))
    else:
        cams = read_cameras_text(os.path.join(sparse_dir, "cameras.txt"))
        imgs = read_images_text(os.path.join(sparse_dir, "images.txt"))
    pts_bin = os.path.join(sparse_dir, "points3D.bin")
    pts_txt = os.path.join(sparse_dir, "points3D.txt")
    pts_ply = os.path.join(sparse_dir, "points3D.ply")
    if os.path.exists(pts_bin):
        xyz, rgb, err = read_points3d_binary(pts_bin)
    elif os.path.exists(pts_txt):
        xyz, rgb, err = read_points3d_text(pts_txt)
    elif os.path.exists(pts_ply):
        from gaussian_splatting_tpu.data.ply import load_point_cloud_ply

        pts, colors, _ = load_point_cloud_ply(pts_ply)
        xyz, rgb, err = pts.astype(np.float64), (colors * 255).astype(np.uint8), None
    else:
        raise FileNotFoundError(f"no points3D.{{bin,txt,ply}} in {sparse_dir}")
    return cams, imgs, (xyz, rgb, err)
