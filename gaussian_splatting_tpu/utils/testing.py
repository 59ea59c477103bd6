"""Synthetic scene generation for tests and benchmarks (BASELINE.json config 1)."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from gaussian_splatting_tpu.ops.camera_math import CameraParams, look_at, make_camera
from gaussian_splatting_tpu.ops.sh import num_sh_coeffs, rgb_to_sh


class SyntheticScene(NamedTuple):
    means3d: jnp.ndarray
    scales: jnp.ndarray
    quats: jnp.ndarray
    opacities: jnp.ndarray
    sh: jnp.ndarray
    cam: CameraParams
    bg: jnp.ndarray


def random_scene(
    num_gaussians: int = 1000,
    *,
    sh_degree: int = 0,
    width: int = 256,
    height: int = 256,
    seed: int = 0,
    spread: float = 1.0,
    scale_range=(0.01, 0.08),
    cam_distance: float = 4.0,
    bg=(0.0, 0.0, 0.0),
) -> SyntheticScene:
    """Random Gaussians in a ball around the origin, camera looking at it."""
    rng = np.random.default_rng(seed)
    P = num_gaussians
    means = rng.normal(0.0, spread / 2.0, (P, 3)).astype(np.float32)
    scales = np.exp(
        rng.uniform(np.log(scale_range[0]), np.log(scale_range[1]), (P, 3))
    ).astype(np.float32)
    quats = rng.normal(0.0, 1.0, (P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, (P,)).astype(np.float32)
    K = num_sh_coeffs(sh_degree)
    sh = np.zeros((P, K, 3), np.float32)
    sh[:, 0, :] = np.asarray(rgb_to_sh(rng.uniform(0.0, 1.0, (P, 3)))).astype(np.float32)
    if K > 1:
        sh[:, 1:, :] = rng.normal(0.0, 0.05, (P, K - 1, 3)).astype(np.float32)

    R, t = look_at([0.3, -0.2, -cam_distance], [0.0, 0.0, 0.0])
    cam = make_camera(R, t, fovx=0.9, fovy=0.9 * height / width, width=width, height=height)
    return SyntheticScene(
        means3d=jnp.asarray(means),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        opacities=jnp.asarray(opac),
        sh=jnp.asarray(sh),
        cam=cam,
        bg=jnp.asarray(np.asarray(bg, np.float32)),
    )
