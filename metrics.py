#!/usr/bin/env python
"""Evaluate rendered/gt image pairs (reference metrics.py).

Computes SSIM + PSNR (and LPIPS when a JAX/torch LPIPS is available — this
image ships no pretrained VGG weights, so LPIPS is reported as null unless
weights are provided via --lpips_weights).  Writes results.json and
per_view.json with the reference schema (metrics.py:81-91).
"""

import argparse
import json
import os

import numpy as np


def read_dir_pairs(renders_dir, gt_dir):
    import imageio.v2 as imageio

    names = sorted(os.listdir(renders_dir))
    renders, gts = [], []
    for fname in names:
        renders.append(
            np.asarray(imageio.imread(os.path.join(renders_dir, fname)), np.float32)[..., :3] / 255.0
        )
        gts.append(
            np.asarray(imageio.imread(os.path.join(gt_dir, fname)), np.float32)[..., :3] / 255.0
        )
    return renders, gts, names


def evaluate(model_paths, lpips_fn=None):
    import jax.numpy as jnp

    from gaussian_splatting_tpu.ops.losses import ssim
    from gaussian_splatting_tpu.utils.image import psnr

    full_report = {}
    for model_path in model_paths:
        print(f"Scene: {model_path}")
        full_dict, per_view = {}, {}
        test_dir = os.path.join(model_path, "test")
        if not os.path.isdir(test_dir):
            print("  no test renders found")
            continue
        for method in sorted(os.listdir(test_dir)):
            print(f"  Method: {method}")
            renders, gts, names = read_dir_pairs(
                os.path.join(test_dir, method, "renders"),
                os.path.join(test_dir, method, "gt"),
            )
            ssims, psnrs, lpipss = [], [], []
            for r, g in zip(renders, gts):
                rj = jnp.asarray(r.transpose(2, 0, 1))
                gj = jnp.asarray(g.transpose(2, 0, 1))
                ssims.append(float(ssim(rj, gj)))
                psnrs.append(float(psnr(rj, gj)))
                lpipss.append(float(lpips_fn(r, g)) if lpips_fn else None)
            print(f"    SSIM : {np.mean(ssims):.7f}")
            print(f"    PSNR : {np.mean(psnrs):.7f}")
            if lpips_fn:
                print(f"    LPIPS: {np.mean(lpipss):.7f}")
            full_dict[method] = {
                "SSIM": float(np.mean(ssims)),
                "PSNR": float(np.mean(psnrs)),
                "LPIPS": float(np.mean(lpipss)) if lpips_fn else None,
            }
            per_view[method] = {
                "SSIM": dict(zip(names, ssims)),
                "PSNR": dict(zip(names, psnrs)),
                "LPIPS": dict(zip(names, lpipss)),
            }
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full_dict, f, indent=True)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=True)
        full_report[model_path] = full_dict
    return full_report


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_paths", "-m", nargs="+", type=str, required=True)
    parser.add_argument("--lpips_weights", type=str, default="")
    args = parser.parse_args()
    lpips_fn = None
    # resolution order: --lpips_weights, $GS_LPIPS_WEIGHTS, the conventional
    # cache path.  See gaussian_splatting_tpu/ops/lpips.py for the .npz
    # export recipe (torchvision VGG16 + richzhang linear heads).
    import os

    weights = (
        args.lpips_weights
        or os.environ.get("GS_LPIPS_WEIGHTS", "")
        or os.path.expanduser("~/.cache/gs_lpips_vgg16.npz")
    )
    if os.path.exists(weights):
        from gaussian_splatting_tpu.ops.lpips import make_lpips

        lpips_fn = make_lpips(weights)
    elif args.lpips_weights:
        raise FileNotFoundError(args.lpips_weights)
    else:
        print("LPIPS weights not found; reporting LPIPS as null "
              "(see ops/lpips.py for the weights recipe)")
    evaluate(args.model_paths, lpips_fn)


if __name__ == "__main__":
    main()
