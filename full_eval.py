#!/usr/bin/env python
"""Full evaluation suite driver (reference full_eval.py).

Trains, renders and scores the 13 standard scenes (MipNeRF360 indoor/outdoor,
Tanks&Temples, DeepBlending) at 7k/30k iterations via subprocesses, recording
per-stage wall time like the reference's timing.txt.
"""

import argparse
import os
import time

mipnerf360_outdoor_scenes = ["bicycle", "flowers", "garden", "stump", "treehill"]
mipnerf360_indoor_scenes = ["room", "counter", "kitchen", "bonsai"]
tanks_and_temples_scenes = ["truck", "train"]
deep_blending_scenes = ["drjohnson", "playroom"]


def run(cmd):
    print(f"$ {cmd}")
    rc = os.system(cmd)
    if rc != 0:
        raise SystemExit(f"command failed ({rc}): {cmd}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_path", default="./eval")
    parser.add_argument("--mipnerf360", "-m360", default="", type=str)
    parser.add_argument("--tanksandtemples", "-tat", default="", type=str)
    parser.add_argument("--deepblending", "-db", default="", type=str)
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--use_depth", action="store_true")
    parser.add_argument("--use_expcomp", action="store_true")
    parser.add_argument("--aa", action="store_true")
    parser.add_argument("--fast", action="store_true")
    args = parser.parse_args()

    scenes = []
    if args.mipnerf360:
        for s in mipnerf360_outdoor_scenes:
            scenes.append((os.path.join(args.mipnerf360, s), "-i images_4"))
        for s in mipnerf360_indoor_scenes:
            scenes.append((os.path.join(args.mipnerf360, s), "-i images_2"))
    if args.tanksandtemples:
        for s in tanks_and_temples_scenes:
            scenes.append((os.path.join(args.tanksandtemples, s), ""))
    if args.deepblending:
        for s in deep_blending_scenes:
            scenes.append((os.path.join(args.deepblending, s), ""))
    if not scenes:
        raise SystemExit("no dataset roots given (-m360/-tat/-db)")

    os.makedirs(args.output_path, exist_ok=True)
    extra = ""
    if args.use_depth:
        extra += " -d depths"
    if args.use_expcomp:
        # reference full_eval.py:55-56: exposure LR schedule comes with the flag
        extra += (
            " --exposure_lr_init 0.001 --exposure_lr_final 0.0001"
            " --exposure_lr_delay_steps 5000 --exposure_lr_delay_mult 0.001"
            " --train_test_exp"
        )
    if args.aa:
        extra += " --antialiasing"
    if args.fast:
        # reference full_eval.py:58-59: --fast is exactly sparse_adam (the
        # accelerated rasterizer is this repo's default path already)
        extra += " --optimizer_type sparse_adam"

    timing_path = os.path.join(args.output_path, "timing.txt")
    for src, img_flag in scenes:
        name = os.path.basename(src)
        out = os.path.join(args.output_path, name)
        if not args.skip_training:
            t0 = time.time()
            run(
                f"python train.py -s {src} {img_flag} -m {out} --eval "
                f"--quiet --test_iterations 7000 30000{extra}"
            )
            with open(timing_path, "a") as f:
                f.write(f"{name}: {(time.time() - t0) / 60:.1f} min\n")
        if not args.skip_rendering:
            for it in (7000, 30000):
                run(f"python render.py -m {out} --iteration {it} --skip_train")
    if not args.skip_metrics:
        all_out = " ".join(
            os.path.join(args.output_path, os.path.basename(s)) for s, _ in scenes
        )
        run(f"python metrics.py -m {all_out}")


if __name__ == "__main__":
    main()
