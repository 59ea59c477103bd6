"""Generate a synthetic Blender-format dataset by rendering a random
Gaussian scene from multiple viewpoints.

Used by tests, benchmarks and smoke-training runs: the resulting directory
(transforms_train/test.json + PNGs) feeds the normal data pipeline, so the
whole train->render->metrics stack can run end-to-end without external
datasets (none ship in this image).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from gaussian_splatting_tpu.ops.camera_math import look_at, make_camera
from gaussian_splatting_tpu.ops.rasterize import render
from gaussian_splatting_tpu.utils.testing import random_scene


def _orbit_pose(theta: float, phi: float, radius: float):
    eye = np.array(
        [
            radius * math.cos(phi) * math.sin(theta),
            radius * math.sin(phi),
            -radius * math.cos(phi) * math.cos(theta),
        ]
    )
    return look_at(eye, np.zeros(3)), eye


def generate_blender_dataset(
    out_dir: str,
    *,
    num_train: int = 12,
    num_test: int = 4,
    width: int = 128,
    height: int = 128,
    num_gaussians: int = 600,
    fovx: float = 0.9,
    radius: float = 4.0,
    seed: int = 0,
) -> str:
    import imageio.v2 as imageio
    import jax.numpy as jnp

    scene = random_scene(
        num_gaussians, sh_degree=1, width=width, height=height, seed=seed
    )
    os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "test"), exist_ok=True)

    def render_pose(theta, phi):
        (R, t), eye = _orbit_pose(theta, phi, radius)
        cam = make_camera(R, t, fovx=fovx, fovy=fovx, width=width, height=height)
        out = render(
            scene.means3d,
            scene.scales,
            scene.quats,
            scene.opacities,
            scene.sh,
            cam,
            jnp.zeros(3),
            sh_degree=1,
            impl="pallas",
        )
        img = np.asarray(out.image).transpose(1, 2, 0)
        # camera-to-world in OpenGL convention for transforms.json
        Rt = np.zeros((4, 4))
        Rt[:3, :3] = R.T
        Rt[:3, 3] = t
        Rt[3, 3] = 1.0
        c2w = np.linalg.inv(Rt)
        c2w[:3, 1:3] *= -1  # COLMAP -> OpenGL
        return img, c2w

    rng = np.random.default_rng(seed + 1)
    for split, count in (("train", num_train), ("test", num_test)):
        frames = []
        for i in range(count):
            theta = 2 * math.pi * (i / count) + (0.3 if split == "test" else 0.0)
            phi = float(rng.uniform(-0.5, 0.5))
            img, c2w = render_pose(theta, phi)
            rel = f"./{split}/r_{i}"
            imageio.imwrite(
                os.path.join(out_dir, f"{split}/r_{i}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )
            frames.append(
                {"file_path": rel, "transform_matrix": c2w.tolist()}
            )
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)
    return out_dir
