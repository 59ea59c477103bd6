"""Runtime cameras: image loading, resolution policy, depth maps.

Host-side equivalent of ``scene/cameras.py`` + ``utils/camera_utils.py``:
images are decoded/resized with PIL on the host and stored as numpy; device
transfer happens per training step.  The resolution policy matches
``loadCam`` (utils/camera_utils.py:43-61): ``-1`` auto-caps the long side at
1600px (with a one-time warning), {1,2,4,8} act as divisors, other values
are a target width scale.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from gaussian_splatting_tpu.ops.camera_math import CameraParams, make_camera

_warned_big = [False]
_warned_native_fallback = [False]


@dataclass
class CameraInfo:
    """Static description parsed from a dataset (scene/dataset_readers.py:26-40)."""

    uid: int
    R: np.ndarray  # cam-to-world rotation (reader storage convention)
    T: np.ndarray  # world-to-cam translation
    fovx: float
    fovy: float
    image_path: str
    image_name: str
    width: int
    height: int
    depth_path: str = ""
    depth_params: Optional[dict] = None
    is_test: bool = False


@dataclass
class Camera:
    """A loaded training/eval camera: matrices + pixel data (host numpy)."""

    info: CameraInfo
    cam: CameraParams  # device-ready matrices, sized to the loaded resolution
    image: np.ndarray  # (3, H, W) float32 in [0, 1]
    alpha_mask: Optional[np.ndarray] = None  # (H, W) float32
    invdepth: Optional[np.ndarray] = None  # (H, W) float32
    depth_mask: Optional[np.ndarray] = None  # (H, W) float32
    exposure_idx: int = 0

    @property
    def image_name(self) -> str:
        return self.info.image_name

    @property
    def width(self) -> int:
        return self.cam.width

    @property
    def height(self) -> int:
        return self.cam.height


def _resolve_size(width: int, height: int, resolution: int, resolution_scale: float = 1.0):
    """utils/camera_utils.py:43-61."""
    if resolution in (1, 2, 4, 8):
        scale = resolution_scale * resolution
    elif resolution == -1:
        if width > 1600:
            if not _warned_big[0]:
                print(
                    "[ INFO ] Encountered quite large input images (>1.6K pixels "
                    "width), rescaling to 1.6K.\n If this is not desired, please "
                    "explicitly specify '--resolution/-r' as 1"
                )
                _warned_big[0] = True
            scale = resolution_scale * width / 1600
        else:
            scale = resolution_scale
    else:
        scale = resolution_scale * width / resolution
    return round(width / scale), round(height / scale)


def load_camera(
    info: CameraInfo,
    *,
    resolution: int = -1,
    resolution_scale: float = 1.0,
    white_background: bool = False,
    train_test_exp: bool = False,
    is_synthetic: bool = False,
    exposure_idx: int = 0,
) -> Camera:
    """Load pixels + build matrices (Camera.__init__, scene/cameras.py:20-89)."""
    arr = None
    try:
        # native decode+resize path (C++, GIL released — overlaps TPU compute)
        from gaussian_splatting_tpu import native

        if native.available():
            raw = native.decode_image(info.image_path)
            if raw.dtype == np.uint8 and raw.ndim == 3:
                ih, iw = raw.shape[:2]
                w, h = _resolve_size(iw, ih, resolution, resolution_scale)
                has_alpha = raw.shape[2] == 4
                if raw.shape[2] == 2:  # gray+alpha: expand to RGBA
                    raw = np.stack(
                        [raw[..., 0]] * 3 + [raw[..., 1]], axis=-1
                    )
                    has_alpha = True
                elif raw.shape[2] == 1:
                    raw = np.repeat(raw, 3, axis=-1)
                if (w, h) != (iw, ih):
                    raw = native.resize_bilinear(raw, h, w)
                arr = raw.astype(np.float32) / 255.0
    except Exception as exc:
        if not _warned_native_fallback[0]:
            print(f"[cameras] native image loader unavailable ({exc!r}); "
                  "falling back to PIL")
            _warned_native_fallback[0] = True
        arr = None

    if arr is None:
        from PIL import Image

        pil = Image.open(info.image_path)
        w, h = _resolve_size(pil.width, pil.height, resolution, resolution_scale)
        has_alpha = pil.mode in ("RGBA", "LA")
        # BILINEAR to match the native path bit-for-bit in spirit: one
        # resampling family regardless of which loader ran. (The reference
        # uses PIL's default bicubic, scene/cameras.py:42-54 — a deliberate,
        # documented divergence; training quality is insensitive to it.)
        pil = pil.resize((w, h), Image.BILINEAR)
        arr = np.asarray(pil.convert("RGBA" if has_alpha else "RGB"), np.float32) / 255.0

    alpha = None
    if has_alpha:
        alpha = arr[..., 3]
        rgb = arr[..., :3]
        if white_background:
            # Blender alpha composite (scene/dataset_readers.py:253-259)
            rgb = rgb * alpha[..., None] + (1.0 - alpha[..., None])
            alpha = None
    else:
        rgb = arr

    # train_test_exp: mask out the left half of test views during training
    # (scene/cameras.py:50-54)
    if train_test_exp and info.is_test:
        alpha = np.ones((h, w), np.float32) if alpha is None else alpha.copy()
        alpha[:, : w // 2] = 0.0

    invdepth = None
    depth_mask = None
    if info.depth_path:
        import cv2
        from PIL import Image

        raw = cv2.imread(info.depth_path, cv2.IMREAD_UNCHANGED).astype(np.float32)
        if raw.ndim > 2:
            raw = raw[..., 0]
        # scale convention: /512 synthetic, /2^16 colmap (camera_utils.py:25-28)
        raw = raw / (512.0 if is_synthetic else 65536.0)
        raw = np.asarray(
            Image.fromarray(raw).resize((w, h), Image.NEAREST), np.float32
        )
        depth_mask = np.ones((h, w), np.float32)
        dp = info.depth_params
        if dp is not None:
            if dp.get("scale", 0) < 0.2 * dp.get("med_scale", 1.0) or dp.get("scale", 0) > 5 * dp.get("med_scale", 1.0):
                depth_mask *= 0.0  # unreliable fit (cameras.py:66-70)
            if dp.get("scale", 0) > 0:
                raw = raw * dp["scale"] + dp["offset"]
        if raw.ndim != 2:
            raw = raw[..., 0]
        invdepth = raw
    cam = make_camera(info.R, info.T, info.fovx, info.fovy, w, h)
    return Camera(
        info=info,
        cam=cam,
        image=np.ascontiguousarray(rgb.transpose(2, 0, 1)),
        alpha_mask=alpha,
        invdepth=invdepth,
        depth_mask=depth_mask,
        exposure_idx=exposure_idx,
    )


def camera_to_json(idx: int, info: CameraInfo) -> dict:
    """utils/camera_utils.py:77-97 (viewer interop: cameras.json)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = info.R.T
    Rt[:3, 3] = info.T
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    pos = c2w[:3, 3]
    rot = c2w[:3, :3]
    return {
        "id": idx,
        "img_name": info.image_name,
        "width": info.width,
        "height": info.height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": info.height / (2 * math.tan(info.fovy / 2)),
        "fx": info.width / (2 * math.tan(info.fovx / 2)),
    }
