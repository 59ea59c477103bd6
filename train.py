#!/usr/bin/env python
"""Training CLI (reference train.py:403-435 argv surface).

Example:
    python train.py -s <scene dir> -m <output dir> --eval
"""

import argparse
import os
import sys
import time
import uuid
from datetime import datetime

from gaussian_splatting_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    save_config,
)


def add_model_args(p):
    p.add_argument("--source_path", "-s", type=str, default="")
    p.add_argument("--model_path", "-m", type=str, default="")
    p.add_argument("--images", "-i", type=str, default="images")
    p.add_argument("--depths", "-d", type=str, default="")
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--train_test_exp", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--data_device", type=str, default="cpu")


def add_pipeline_args(p):
    p.add_argument("--convert_SHs_python", action="store_true")
    p.add_argument("--compute_cov3D_python", action="store_true")
    p.add_argument("--debug", action="store_true")
    # reference train.py:136-137,412,432: --debug_from arms pipe.debug at a
    # given iteration; --detect_anomaly is torch autograd anomaly mode. The
    # JAX analogues both map to jax_debug_nans (re-runs the failing jitted
    # step op-by-op and points at the primitive that produced the NaN).
    p.add_argument("--debug_from", type=int, default=-1)
    p.add_argument("--detect_anomaly", action="store_true")
    p.add_argument("--antialiasing", action="store_true")
    p.add_argument("--rasterizer_impl", type=str, default="auto")


def add_opt_args(p):
    o = OptimizationConfig()
    p.add_argument("--iterations", type=int, default=o.iterations)
    p.add_argument("--position_lr_init", type=float, default=o.position_lr_init)
    p.add_argument("--position_lr_final", type=float, default=o.position_lr_final)
    p.add_argument("--position_lr_delay_mult", type=float, default=o.position_lr_delay_mult)
    p.add_argument("--position_lr_max_steps", type=int, default=o.position_lr_max_steps)
    p.add_argument("--feature_lr", type=float, default=o.feature_lr)
    p.add_argument("--opacity_lr", type=float, default=o.opacity_lr)
    p.add_argument("--scaling_lr", type=float, default=o.scaling_lr)
    p.add_argument("--rotation_lr", type=float, default=o.rotation_lr)
    p.add_argument("--exposure_lr_init", type=float, default=o.exposure_lr_init)
    p.add_argument("--exposure_lr_final", type=float, default=o.exposure_lr_final)
    p.add_argument("--exposure_lr_delay_steps", type=int, default=o.exposure_lr_delay_steps)
    p.add_argument("--exposure_lr_delay_mult", type=float, default=o.exposure_lr_delay_mult)
    p.add_argument("--percent_dense", type=float, default=o.percent_dense)
    p.add_argument("--lambda_dssim", type=float, default=o.lambda_dssim)
    p.add_argument("--densification_interval", type=int, default=o.densification_interval)
    p.add_argument("--opacity_reset_interval", type=int, default=o.opacity_reset_interval)
    p.add_argument("--densify_from_iter", type=int, default=o.densify_from_iter)
    p.add_argument("--densify_until_iter", type=int, default=o.densify_until_iter)
    p.add_argument("--densify_grad_threshold", type=float, default=o.densify_grad_threshold)
    p.add_argument("--depth_l1_weight_init", type=float, default=o.depth_l1_weight_init)
    p.add_argument("--depth_l1_weight_final", type=float, default=o.depth_l1_weight_final)
    p.add_argument("--random_background", action="store_true")
    p.add_argument("--optimizer_type", type=str, default="default")


def extract(cls, args):
    import dataclasses

    names = {f.name for f in dataclasses.fields(cls)}
    remap = {"eval": "eval"}
    kw = {}
    for name in names:
        if hasattr(args, name):
            kw[name] = getattr(args, name)
    return cls(**kw)


def main():
    parser = argparse.ArgumentParser(description="TPU 3DGS training")
    add_model_args(parser)
    add_pipeline_args(parser)
    add_opt_args(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--capacity", type=int, default=0)
    parser.add_argument("--disable_viewer", action="store_true")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--profile", type=str, default="",
                        help="directory for a jax.profiler trace of the hot loop")
    parser.add_argument("--parallel", type=str, default="none",
                        choices=["none", "dp", "gshard"],
                        help="multi-device strategy: camera data-parallel or "
                             "Gaussian+tile sharding (SURVEY §7 configs 4-5)")
    parser.add_argument("--parallel_devices", type=int, default=0,
                        help="mesh size (0 = all visible devices)")
    args = parser.parse_args()
    args.save_iterations.append(args.iterations)

    if not args.model_path:
        # timestamped default output dir (reference fork delta, train.py:295-309)
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        args.model_path = os.path.join("./output", f"{stamp}_{str(uuid.uuid4())[:8]}")
    os.makedirs(args.model_path, exist_ok=True)
    print(f"Output folder: {args.model_path}")

    model_cfg = extract(ModelConfig, args)
    model_cfg.eval = args.eval
    opt = extract(OptimizationConfig, args)
    pipe = extract(PipelineConfig, args)
    save_config(model_cfg, os.path.join(args.model_path, "cfg_args.json"))
    save_config(opt, os.path.join(args.model_path, "opt_args.json"))
    # pipeline flags (antialiasing!) persist too so render.py/metrics.py can
    # evaluate with the training-time rasterizer settings (get_combined_args
    # semantics, arguments/__init__.py:102-122)
    save_config(pipe, os.path.join(args.model_path, "pipe_args.json"))

    from gaussian_splatting_tpu.train.loop import train

    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(args.model_path)
    except ImportError:
        print("Tensorboard not available: not logging progress")

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)

    if args.detect_anomaly or (pipe.debug and args.debug_from < 0):
        import jax

        jax.config.update("jax_debug_nans", True)

    from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.time()
    train(
        model_cfg,
        opt,
        pipe,
        debug_from=args.debug_from if pipe.debug else -1,
        test_iterations=set(args.test_iterations),
        save_iterations=set(args.save_iterations),
        checkpoint_iterations=set(args.checkpoint_iterations),
        start_checkpoint=args.start_checkpoint,
        seed=args.seed,
        capacity=args.capacity or None,
        quiet=args.quiet,
        viewer_ip="" if args.disable_viewer else args.ip,
        viewer_port=args.port,
        tb_writer=tb_writer,
        parallel=args.parallel,
        parallel_devices=args.parallel_devices,
    )
    if args.profile:
        import jax

        jax.profiler.stop_trace()
    print(f"\nTraining complete in {time.time() - t0:.0f}s.")


if __name__ == "__main__":
    main()
