#!/usr/bin/env python
"""COLMAP preprocessing driver (reference convert.py:31-122).

Runs feature extraction -> exhaustive matching -> mapping -> undistortion on
a scene directory laid out as ``<source_path>/input/*.jpg``, producing the
``sparse/0`` + ``images/`` structure the dataset readers expect.  Requires an
external ``colmap`` binary (and ImageMagick for ``--resize``); both are
invoked via subprocess with explicit argument lists (no shell
interpolation, unlike the reference's os.system strings).
"""

import argparse
import logging
import os
import shutil
import subprocess
import sys


def run(cmd):
    print("+", " ".join(cmd))
    result = subprocess.run(cmd)
    if result.returncode != 0:
        logging.error(f"{cmd[0]} failed with code {result.returncode}. Exiting.")
        sys.exit(result.returncode)


def main():
    parser = argparse.ArgumentParser("Colmap converter")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True, type=str)
    parser.add_argument("--camera", default="OPENCV", type=str)
    parser.add_argument("--colmap_executable", default="colmap", type=str)
    parser.add_argument("--resize", action="store_true")
    parser.add_argument("--magick_executable", default="magick", type=str)
    args = parser.parse_args()
    colmap = args.colmap_executable
    use_gpu = "0" if args.no_gpu else "1"
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        db = os.path.join(src, "distorted", "database.db")
        run([
            colmap, "feature_extractor",
            "--database_path", db,
            "--image_path", os.path.join(src, "input"),
            "--ImageReader.single_camera", "1",
            "--ImageReader.camera_model", args.camera,
            "--SiftExtraction.use_gpu", use_gpu,
        ])
        run([
            colmap, "exhaustive_matcher",
            "--database_path", db,
            "--SiftMatching.use_gpu", use_gpu,
        ])
        run([
            colmap, "mapper",
            "--database_path", db,
            "--image_path", os.path.join(src, "input"),
            "--output_path", os.path.join(src, "distorted", "sparse"),
            "--Mapper.ba_global_function_tolerance=0.000001",
        ])

    run([
        colmap, "image_undistorter",
        "--image_path", os.path.join(src, "input"),
        "--input_path", os.path.join(src, "distorted", "sparse", "0"),
        "--output_path", src,
        "--output_type", "COLMAP",
    ])

    # move sparse/* into sparse/0 (convert.py:80-89)
    sparse_dir = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse_dir, "0"), exist_ok=True)
    for name in os.listdir(sparse_dir):
        if name == "0":
            continue
        shutil.move(
            os.path.join(sparse_dir, name), os.path.join(sparse_dir, "0", name)
        )

    if args.resize:
        print("Copying and resizing...")
        for factor, pct in ((2, "50%"), (4, "25%"), (8, "12.5%")):
            out_dir = os.path.join(src, f"images_{factor}")
            os.makedirs(out_dir, exist_ok=True)
            for name in os.listdir(os.path.join(src, "images")):
                dst = os.path.join(out_dir, name)
                shutil.copy2(os.path.join(src, "images", name), dst)
                run([args.magick_executable, "mogrify", "-resize", pct, dst])

    print("Done.")


if __name__ == "__main__":
    main()
