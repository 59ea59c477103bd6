"""Scene container: dataset + Gaussian model lifecycle.

Equivalent of the reference ``Scene`` class (scene/__init__.py:10-128):
loads the dataset, persists ``input.ply`` + ``cameras.json`` into the model
directory, shuffles cameras, exposes train/test camera lists, and
saves/loads model snapshots (PLY + exposure.json).
"""

from __future__ import annotations

import json
import os
import random
import shutil
from typing import List, Optional

import numpy as np

from gaussian_splatting_tpu.config import ModelConfig
from gaussian_splatting_tpu.data.cameras import Camera, camera_to_json, load_camera
from gaussian_splatting_tpu.data.dataset import SceneInfo, detect_and_load_scene
from gaussian_splatting_tpu.data.ply import save_gaussian_ply, load_gaussian_ply
from gaussian_splatting_tpu.models.gaussians import (
    GaussianModel,
    create_from_pcd,
    empty_aux,
    empty_params,
)


class Scene:
    def __init__(
        self,
        cfg: ModelConfig,
        load_iteration: Optional[int] = None,
        shuffle: bool = True,
        resolution_scales=(1.0,),
        capacity: Optional[int] = None,
    ):
        self.cfg = cfg
        self.model_path = cfg.model_path
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                pc_dir = os.path.join(self.model_path, "point_cloud")
                iters = [
                    int(d.split("_")[-1])
                    for d in os.listdir(pc_dir)
                    if d.startswith("iteration_")
                ]
                self.loaded_iter = max(iters)
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        info: SceneInfo = detect_and_load_scene(
            cfg.source_path,
            images=cfg.images,
            depths=cfg.depths,
            eval_split=cfg.eval,
            white_background=cfg.white_background,
        )
        self.info = info
        self.is_synthetic = info.is_nerf_synthetic

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            shutil.copyfile(info.ply_path, os.path.join(self.model_path, "input.ply"))
            cam_json = [
                camera_to_json(i, c)
                for i, c in enumerate(info.train_cameras + info.test_cameras)
            ]
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            random.shuffle(info.train_cameras)  # scene/__init__.py:72-74
            random.shuffle(info.test_cameras)

        self.cameras_extent = info.nerf_normalization["radius"]

        self.train_cameras = {}
        self.test_cameras = {}
        for scale in resolution_scales:
            print(f"Loading Training Cameras at scale {scale}")
            self.train_cameras[scale] = [
                load_camera(
                    ci,
                    resolution=cfg.resolution,
                    resolution_scale=scale,
                    white_background=cfg.white_background,
                    train_test_exp=cfg.train_test_exp,
                    is_synthetic=info.is_nerf_synthetic,
                    exposure_idx=i,
                )
                for i, ci in enumerate(info.train_cameras)
            ]
            print(f"Loading Test Cameras at scale {scale}")
            self.test_cameras[scale] = [
                load_camera(
                    ci,
                    resolution=cfg.resolution,
                    resolution_scale=scale,
                    white_background=cfg.white_background,
                    train_test_exp=cfg.train_test_exp,
                    is_synthetic=info.is_nerf_synthetic,
                )
                for ci in info.test_cameras
            ]

        if self.loaded_iter:
            self.gaussians = load_model_ply(
                os.path.join(
                    self.model_path,
                    "point_cloud",
                    f"iteration_{self.loaded_iter}",
                    "point_cloud.ply",
                ),
                max_sh_degree=cfg.sh_degree,
                spatial_lr_scale=self.cameras_extent,
                capacity=capacity,
            )
        else:
            self.gaussians = create_from_pcd(
                info.point_cloud.points,
                info.point_cloud.colors,
                max_sh_degree=cfg.sh_degree,
                spatial_lr_scale=self.cameras_extent,
                capacity=capacity,
            )

    def get_train_cameras(self, scale: float = 1.0) -> List[Camera]:
        return self.train_cameras[scale]

    def get_test_cameras(self, scale: float = 1.0) -> List[Camera]:
        return self.test_cameras[scale]

    def save(self, iteration: int, model: GaussianModel, exposures=None) -> None:
        """PLY snapshot + exposure.json (scene/__init__.py:94-110)."""
        out_dir = os.path.join(self.model_path, "point_cloud", f"iteration_{iteration}")
        os.makedirs(out_dir, exist_ok=True)
        save_model_ply(os.path.join(out_dir, "point_cloud.ply"), model)
        if exposures is not None:
            exp = {
                cam.image_name: np.asarray(exposures[cam.exposure_idx]).tolist()
                for cam in self.train_cameras[1.0]
            }
            with open(os.path.join(self.model_path, "exposure.json"), "w") as f:
                json.dump(exp, f, indent=2)


def save_model_ply(path: str, model: GaussianModel) -> None:
    alive = np.asarray(model.aux.alive)
    p = model.params
    save_gaussian_ply(
        path,
        means3d=np.asarray(p.means3d)[alive],
        features_dc=np.asarray(p.features_dc)[alive],
        features_rest=np.asarray(p.features_rest)[alive],
        opacities=np.asarray(p.opacities)[alive],
        scales=np.asarray(p.scales)[alive],
        quats=np.asarray(p.quats)[alive],
    )


def load_model_ply(
    path: str,
    *,
    max_sh_degree: int,
    spatial_lr_scale: float = 1.0,
    capacity: Optional[int] = None,
) -> GaussianModel:
    import jax.numpy as jnp

    data = load_gaussian_ply(path)
    n = data["means3d"].shape[0]
    capacity = capacity or int(n * 1.2) + 1024
    params = empty_params(capacity, max_sh_degree)
    aux = empty_aux(capacity)
    sl = slice(0, n)
    params = params._replace(
        means3d=params.means3d.at[sl].set(data["means3d"]),
        features_dc=params.features_dc.at[sl].set(data["features_dc"]),
        features_rest=params.features_rest.at[sl].set(data["features_rest"]),
        opacities=params.opacities.at[sl].set(data["opacities"]),
        scales=params.scales.at[sl].set(data["scales"]),
        quats=params.quats.at[sl].set(data["quats"]),
    )
    aux = aux._replace(alive=aux.alive.at[sl].set(True))
    return GaussianModel(
        params=params,
        aux=aux,
        spatial_lr_scale=jnp.asarray(spatial_lr_scale, jnp.float32),
        sh_degree=jnp.asarray(max_sh_degree, jnp.int32),
        max_sh_degree=max_sh_degree,
    )
