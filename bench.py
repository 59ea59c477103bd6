#!/usr/bin/env python
"""Benchmark: rasterizer forward+backward throughput at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures pixels/s/chip for a full differentiable render (forward + backward
through the Pallas kernels and the preprocess autodiff) on a synthetic scene
sized like a mid-training MipNeRF360 run.  ``vs_baseline`` is relative to an
estimated A100 reference-rasterizer fwd+bwd throughput at 1080p
(~2.0e8 px/s: the reference CUDA rasterizer trains garden-scale scenes at
~10 ms/iter on A100-class hardware; the repo publishes no machine-readable
number — see BASELINE.md).
"""

import json
import os
import sys
import time

A100_BASELINE_PX_S = 2.0e8

NUM_GAUSSIANS = int(os.environ.get("BENCH_GAUSSIANS", 500_000))
WIDTH = int(os.environ.get("BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1080))
ITERS = int(os.environ.get("BENCH_ITERS", 10))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from gaussian_splatting_tpu.config import RasterizeConfig
    from gaussian_splatting_tpu.ops.rasterize import render
    from gaussian_splatting_tpu.utils.testing import random_scene

    scene = random_scene(
        NUM_GAUSSIANS,
        sh_degree=3,
        width=WIDTH,
        height=HEIGHT,
        seed=0,
        spread=2.0,
        # ~2.25M instance slots (~2.08M real instances) — the same slot count
        # rounds 1-2 processed, but now COMPLETE: the old scene
        # (scale_range 0.004-0.02) demanded 4.22M slots against a 2.25M
        # buffer and silently truncated (overflow flag ignored), inflating
        # px/s ~1.8x.  Round 3 sizes capacity from measured demand and
        # asserts no overflow.
        scale_range=(0.0025, 0.012),
        cam_distance=4.0,
    )
    cfg = RasterizeConfig()

    # honest capacity: measure true slot demand, add 5% headroom
    from gaussian_splatting_tpu.ops.preprocess import preprocess

    proj = jax.jit(
        lambda m, s, q, o, sh_: preprocess(
            m, s, q, o, sh_, scene.cam, sh_degree=3
        ).tiles_touched
    )(scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
    demand = int(jnp.sum(jnp.maximum(proj, 1)))
    capacity = -(-int(demand * 1.05) // 128) * 128
    print(f"slot demand {demand}, capacity {capacity}", file=sys.stderr)

    def loss_fn(means3d, scales, quats, opacities, sh):
        out = render(
            means3d, scales, quats, opacities, sh,
            scene.cam, scene.bg, sh_degree=3, cfg=cfg, impl="pallas",
            capacity=capacity,
        )
        return jnp.sum(out.image) + jnp.sum(out.invdepth), out.overflow

    args = (scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
    step = jax.jit(
        jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)
    )

    # compile + warmup; verify the instance buffer really covers the scene
    g, overflow = step(*args)
    jax.block_until_ready(g)
    assert not bool(overflow), "bench instance buffer overflowed — not a valid run"

    t0 = time.time()
    for _ in range(ITERS):
        g, _ovf = step(*args)
    jax.block_until_ready(g)
    dt = (time.time() - t0) / ITERS

    pixels = WIDTH * HEIGHT
    value = pixels / dt
    print(
        json.dumps(
            {
                "metric": "rasterizer_fwd_bwd_pixels_per_s_per_chip_1080p",
                "value": value,
                "unit": "pixels/s",
                "vs_baseline": value / A100_BASELINE_PX_S,
            }
        )
    )


if __name__ == "__main__":
    main()
