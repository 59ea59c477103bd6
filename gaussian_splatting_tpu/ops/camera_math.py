"""Camera matrix construction with reference-identical conventions.

The reference stores row-vector-convention (transposed) matrices for torch
(``scene/cameras.py:86-89``); this framework uses the plain column-vector
convention ``p_cam = V @ p_world`` everywhere and matches the reference
numerics:

- world-to-view from COLMAP R (stored transposed in the readers,
  ``scene/dataset_readers.py:246``) and t: ``utils/graphics_utils.py:38-49``,
- OpenGL-style projection with z_sign=+1 and depth mapped via
  far/(far-near): ``utils/graphics_utils.py:51-71``,
- znear=0.01, zfar=100 (``scene/cameras.py:80-81``),
- NDC -> pixel: ``((v + 1) * S - 1) / 2`` (``auxiliary.h:43-46``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Z_NEAR = 0.01
Z_FAR = 100.0


def focal_to_fov(focal: float, pixels: float) -> float:
    """utils/graphics_utils.py:76-77."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov_to_focal(fov: float, pixels: float) -> float:
    """utils/graphics_utils.py:73-74."""
    return pixels / (2.0 * math.tan(fov / 2.0))


def world_to_view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """4x4 world->camera matrix (column-vector convention).

    ``R`` is the camera-to-world rotation as stored by the dataset readers
    (i.e. COLMAP's ``qvec2rotmat(qvec).T``), ``t`` the COLMAP translation, so
    the world->cam transform is ``[R.T | t]`` — the same matrix
    ``getWorld2View2`` builds (utils/graphics_utils.py:38-49), before the
    reference's torch-side transpose.  ``translate``/``scale`` recenter the
    camera for viewer use, matching the reference semantics.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        c2w = np.linalg.inv(Rt)
        center = (c2w[:3, 3] + translate) * scale
        c2w[:3, 3] = center
        Rt = np.linalg.inv(c2w)
    return Rt.astype(np.float32)


def projection_matrix(fovx: float, fovy: float, znear: float = Z_NEAR, zfar: float = Z_FAR) -> np.ndarray:
    """OpenGL-style symmetric frustum projection (utils/graphics_utils.py:51-71).

    Column-vector convention; z_sign = +1 (camera looks down +z), depth row
    maps view z to ``z * far/(far-near) - far*near/(far-near)`` before the
    perspective divide.
    """
    tan_y = math.tan(fovy / 2.0)
    tan_x = math.tan(fovx / 2.0)
    top = tan_y * znear
    bottom = -top
    right = tan_x * znear
    left = -right
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Static-shape camera description consumed by the rasterizer.

    Matrices are column-vector convention: ``p_cam = viewmatrix @ p_world``.
    Width/height are static (compile-time) so tile grids are static under jit.
    """

    viewmatrix: jnp.ndarray  # (4, 4) world -> camera
    projmatrix: jnp.ndarray  # (4, 4) full projection = P @ V
    campos: jnp.ndarray  # (3,) camera center in world space
    tan_fovx: float = dataclasses.field(metadata=dict(static=True))
    tan_fovy: float = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def focal_x(self) -> float:
        # rasterize_points.cu:74-75: focal = size / (2 * tan_fov)
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> float:
        return self.height / (2.0 * self.tan_fovy)


def make_camera(
    R: np.ndarray,
    t: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    translate=None,
    scale: float = 1.0,
) -> CameraParams:
    V = world_to_view(R, t, translate, scale)
    P = projection_matrix(fovx, fovy)
    full = (P @ V).astype(np.float32)
    cam_center = np.linalg.inv(V)[:3, 3].astype(np.float32)
    return CameraParams(
        viewmatrix=jnp.asarray(V),
        projmatrix=jnp.asarray(full),
        campos=jnp.asarray(cam_center),
        tan_fovx=float(math.tan(fovx / 2.0)),
        tan_fovy=float(math.tan(fovy / 2.0)),
        width=int(width),
        height=int(height),
    )


def ndc_to_pixel(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """auxiliary.h:43-46."""
    return ((v + 1.0) * size - 1.0) * 0.5


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, 1.0, 0.0)) -> Tuple[np.ndarray, np.ndarray]:
    """Build (R, t) in the dataset-reader convention for tests/synthetic scenes.

    Returns R = cam-to-world rotation (reader storage convention) and t such
    that ``world_to_view(R, t)`` looks from ``eye`` toward ``target`` with +z
    forward (COLMAP convention).
    """
    eye = np.asarray(eye, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    upv = np.asarray(up, dtype=np.float64)
    right = np.cross(upv, fwd)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # Rows of world->cam rotation are the camera axes (x right, y down, z fwd).
    R_wc = np.stack([right, down, fwd], axis=0)
    t = -R_wc @ eye
    return R_wc.T, t
