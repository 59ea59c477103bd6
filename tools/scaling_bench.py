#!/usr/bin/env python
"""Multi-chip scaling efficiency harness (BASELINE.md scaling target).

Measures the camera-data-parallel training step at several mesh sizes and
reports per-device throughput relative to 1 device.  On a real pod slice this
is the ">=80% efficiency at 2 hosts" measurement; on a single host it runs on
a virtual CPU mesh (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
which validates the harness and the collective graph, not real ICI scaling.

Usage: python tools/scaling_bench.py [--devices 1 2 4 8] [--width 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--gaussians", type=int, default=20_000)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--mode", choices=["dp", "gshard"], default="dp",
                        help="dp: camera data-parallel; gshard: "
                        "Gaussian-sharded step with instance all-to-all")
    parser.add_argument("--cpu", action="store_true",
                        help="force the virtual CPU mesh")
    args = parser.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.devices)}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from jax.sharding import NamedSharding, PartitionSpec as PS

    from gaussian_splatting_tpu.config import OptimizationConfig, RasterizeConfig
    from gaussian_splatting_tpu.models.gaussians import create_from_pcd
    from gaussian_splatting_tpu.ops.camera_math import CameraParams
    from gaussian_splatting_tpu.parallel import gshard
    from gaussian_splatting_tpu.parallel.dp import dp_train_step
    from gaussian_splatting_tpu.parallel.gshard import gshard_train_step
    from gaussian_splatting_tpu.parallel.mesh import make_mesh
    from gaussian_splatting_tpu.train.step import StepBatch, init_train_state
    from gaussian_splatting_tpu.utils.testing import random_scene

    w = h = args.width
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.8, 0.8, (args.gaussians, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (args.gaussians, 3)).astype(np.float32)
    opt = OptimizationConfig()
    raster = RasterizeConfig(instance_slack=8.0)

    results = {}
    for n_dev in args.devices:
        if n_dev > len(jax.devices()):
            print(f"skip {n_dev} devices (only {len(jax.devices())} available)")
            continue
        mesh = make_mesh(n_dev)
        model = create_from_pcd(
            pts, cols, max_sh_degree=2, spatial_lr_scale=1.0,
            capacity=args.gaussians * 2,
        )
        state = init_train_state(model, num_images=n_dev)
        cams, batches = [], []
        for i in range(n_dev):
            sc = random_scene(4, width=w, height=h, seed=40 + i)
            cams.append(sc.cam)
            batches.append(StepBatch(
                gt_image=jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32)),
                alpha_mask=jnp.ones((1, h, w)),
                invdepth_gt=jnp.zeros((h, w)),
                depth_mask=jnp.zeros((h, w)),
                exposure_idx=jnp.asarray(i, jnp.int32),
                bg_color=jnp.zeros(3),
            ))
        stacked_cams = CameraParams(
            viewmatrix=jnp.stack([c.viewmatrix for c in cams]),
            projmatrix=jnp.stack([c.projmatrix for c in cams]),
            campos=jnp.stack([c.campos for c in cams]),
            tan_fovx=cams[0].tan_fovx, tan_fovy=cams[0].tan_fovy,
            width=w, height=h,
        )
        stacked_batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

        if args.mode == "dp":
            def step(s):
                return dp_train_step(s, stacked_cams, stacked_batch, mesh,
                                     opt=opt, raster=raster)
        else:
            # Gaussian-sharded: ONE camera, the Gaussian axis split over the
            # mesh (strong scaling of a fixed frame + fixed point set).
            cap = state.model.capacity
            if cap % n_dev:
                raise SystemExit("capacity must divide the mesh size")

            def put(x):
                spec = (
                    PS("data")
                    if getattr(x, "ndim", 0) >= 1 and x.shape[0] == cap
                    else PS()
                )
                return jax.device_put(x, NamedSharding(mesh, spec))

            state = jax.tree_util.tree_map(put, state)

            def step(s):
                return gshard_train_step(s, cams[0], batches[0], mesh,
                                         opt=opt, raster=raster)

        # collective census from the compiled HLO (the evidence the scaling
        # claim rides on: what actually crosses the mesh per step)
        jstep = jax.jit(step)
        hlo = jstep.lower(state).compile().as_text()
        colls = {}
        for op in ("all-to-all", "all-reduce", "all-gather",
                   "collective-permute", "reduce-scatter"):
            n = sum(
                1 for line in hlo.splitlines()
                if f" {op}" in line and "start" not in line.split("=")[0]
            )
            if n:
                colls[op] = n
        step = jstep

        s2, m = step(state)
        jax.block_until_ready(s2.model.params.means3d)
        t0 = time.perf_counter()
        s = state
        for _ in range(args.iters):
            s, m = step(s)
        jax.block_until_ready(s.model.params.means3d)
        dt = (time.perf_counter() - t0) / args.iters

        if args.mode == "dp":
            cam_per_s = n_dev / dt
            results[n_dev] = cam_per_s
            base = results[min(results)]
            eff = cam_per_s / (base * n_dev / min(results)) * 100
            print(f"devices={n_dev}: {dt*1e3:8.1f} ms/step  "
                  f"{cam_per_s:8.2f} cams/s  efficiency {eff:5.1f}%")
        else:
            px_per_s = w * h / dt
            results[n_dev] = px_per_s
            base_n = min(results)
            speedup = px_per_s / results[base_n]
            eff = speedup / (n_dev / base_n) * 100
            # per-device instance-exchange traffic: the (n, cap_x, 16) f32
            # all_to_all in the forward and its transpose in the backward
            cap_x, _cap_dev = gshard._capacities(cap, n_dev, raster, 0, 0)
            xbytes = 2 * n_dev * cap_x * gshard.REC_COLS * 4
            print(f"devices={n_dev}: {dt*1e3:8.1f} ms/step  "
                  f"{px_per_s/1e6:7.2f} Mpx/s  speedup {speedup:4.2f}x  "
                  f"efficiency {eff:5.1f}%  "
                  f"exchange {xbytes/1e6:.1f} MB/dev/step (cap_x={cap_x})")
        if colls:
            print(f"  collectives in compiled HLO: {colls}")


if __name__ == "__main__":
    main()
