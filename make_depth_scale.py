#!/usr/bin/env python
"""Fit per-image mono-depth scales (reference utils/make_depth_scale.py CLI)."""

import argparse

from gaussian_splatting_tpu.data.depth_scale import make_depth_scales


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_dir", required=True)
    parser.add_argument("--depths_dir", required=True)
    parser.add_argument("--model_type", default="bin", choices=["bin", "txt"])
    parser.add_argument("--jobs", type=int, default=8)
    args = parser.parse_args()
    params = make_depth_scales(
        args.base_dir, args.depths_dir, model_ext=args.model_type, jobs=args.jobs
    )
    print(f"wrote depth_params.json for {len(params)} images")


if __name__ == "__main__":
    main()
