#!/usr/bin/env python
"""Render train/test views of a trained model (reference render.py).

Writes <model>/<split>/ours_<iter>/renders/*.png and gt/*.png pairs for
metrics.py, exactly like render_set (render.py:30-46).
"""

import argparse
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Render trained model views")
    parser.add_argument("--model_path", "-m", type=str, required=True)
    parser.add_argument("--source_path", "-s", type=str, default="")
    parser.add_argument("--images", "-i", type=str, default="images")
    parser.add_argument("--resolution", "-r", type=int, default=-1)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--white_background", "-w", action="store_true")
    parser.add_argument("--train_test_exp", action="store_true")
    parser.add_argument("--sh_degree", type=int, default=3)
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--antialiasing", action="store_true")
    args = parser.parse_args()

    from gaussian_splatting_tpu.config import (
        ModelConfig,
        PipelineConfig,
        RasterizeConfig,
        load_config,
    )
    from gaussian_splatting_tpu.scene import Scene
    from gaussian_splatting_tpu.train.loop import render_camera
    from gaussian_splatting_tpu.train.step import init_train_state

    cfg_path = os.path.join(args.model_path, "cfg_args.json")
    if os.path.exists(cfg_path):
        model_cfg = load_config(ModelConfig, cfg_path)
        # CLI overrides persisted config (get_combined_args semantics)
        for k in ("source_path", "images", "resolution"):
            v = getattr(args, k)
            if v not in ("", -1):
                setattr(model_cfg, k, v)
    else:
        model_cfg = ModelConfig(
            sh_degree=args.sh_degree,
            source_path=args.source_path,
            model_path=args.model_path,
            images=args.images,
            resolution=args.resolution,
            white_background=args.white_background,
            train_test_exp=args.train_test_exp,
            eval=args.eval,
        )
    model_cfg.model_path = args.model_path

    # rasterizer settings: persisted pipeline flags, CLI --antialiasing on top
    # (reference threads pipe.antialiasing into every eval render,
    # gaussian_renderer/__init__.py:55-69)
    pipe_path = os.path.join(args.model_path, "pipe_args.json")
    pipe = (
        load_config(PipelineConfig, pipe_path)
        if os.path.exists(pipe_path)
        else PipelineConfig()
    )
    antialiasing = pipe.antialiasing or args.antialiasing
    raster_cfg = RasterizeConfig(
        antialiasing=antialiasing,
        impl=pipe.rasterizer_impl,
        convert_SHs_python=pipe.convert_SHs_python,
        compute_cov3D_python=pipe.compute_cov3D_python,
    )
    # Seed instance_slack from the trained value (raster_state.json) so the
    # first frame renders with zero overflow->recompile retries.
    from gaussian_splatting_tpu.train.loop import load_raster_state

    raster_cfg = load_raster_state(args.model_path, raster_cfg)

    import imageio.v2 as imageio

    scene = Scene(model_cfg, load_iteration=args.iteration, shuffle=False)
    state = init_train_state(scene.gaussians, len(scene.get_train_cameras()))

    # pretrained exposures: reference loads exposure.json next to the model
    # and applies it per image name when train_test_exp
    # (scene/gaussian_model.py:163-167, gaussian_renderer/__init__.py:137-143)
    pretrained_exposures = None
    if model_cfg.train_test_exp:
        exp_path = os.path.join(args.model_path, "exposure.json")
        if os.path.exists(exp_path):
            with open(exp_path) as f:
                pretrained_exposures = json.load(f)
        else:
            print(f"No exposure to be loaded at {exp_path}")
    bg = (
        np.array([1, 1, 1], np.float32)
        if model_cfg.white_background
        else np.zeros(3, np.float32)
    )

    splits = []
    if not args.skip_train:
        splits.append(("train", scene.get_train_cameras()))
    if not args.skip_test:
        splits.append(("test", scene.get_test_cameras()))

    for name, cams in splits:
        if not cams:
            continue
        base = os.path.join(
            args.model_path, name, f"ours_{scene.loaded_iter}"
        )
        os.makedirs(os.path.join(base, "renders"), exist_ok=True)
        os.makedirs(os.path.join(base, "gt"), exist_ok=True)
        for idx, cam in enumerate(cams):
            exposure = None
            if pretrained_exposures is not None:
                exposure = pretrained_exposures.get(cam.image_name)
                if exposure is None:
                    print(f"No exposure found for {cam.image_name}; using identity")
            img, _ = render_camera(state, cam, raster_cfg, bg, exposure=exposure)
            img = np.asarray(img).transpose(1, 2, 0)
            gt = cam.image.transpose(1, 2, 0)
            if model_cfg.train_test_exp:  # keep right half (render.py:33-37)
                img = img[:, img.shape[1] // 2 :]
                gt = gt[:, gt.shape[1] // 2 :]
            imageio.imwrite(
                os.path.join(base, "renders", f"{idx:05d}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )
            imageio.imwrite(
                os.path.join(base, "gt", f"{idx:05d}.png"),
                (np.clip(gt, 0, 1) * 255).astype(np.uint8),
            )
        print(f"rendered {len(cams)} {name} views -> {base}")


if __name__ == "__main__":
    main()
