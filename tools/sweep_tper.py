#!/usr/bin/env python
"""Sweep tiles-per-program for the blend kernels at the bench shape.

Per-tile fixed program cost (constants, loop setup, pipeline bookkeeping)
amortizes with t_per, but VMEM block size for the packed outputs/cotangents
grows with it; the optimum moves whenever the per-chunk body changes.
"""

import sys
import time

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from gaussian_splatting_tpu.config import RasterizeConfig
from gaussian_splatting_tpu.ops import blend_pallas as bp
from gaussian_splatting_tpu.ops import instances as inst
from gaussian_splatting_tpu.ops.preprocess import preprocess
from gaussian_splatting_tpu.utils.testing import random_scene

P = 500_000
W, H = 1920, 1080
cfg = RasterizeConfig()
scene = random_scene(P, sh_degree=3, width=W, height=H, seed=0, spread=2.0,
                     scale_range=(0.0025, 0.012), cam_distance=4.0)
tile_w, tile_h = cfg.tile_w, cfg.tile_h
grid_x = (W + tile_w - 1) // tile_w
grid_y = (H + tile_h - 1) // tile_h


def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:>28}: {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)
    return out


proj = jax.jit(lambda m, s, q, o, sh: preprocess(
    m, s, q, o, sh, scene.cam, sh_degree=3))(
    scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
demand = int(jnp.sum(jnp.maximum(proj.tiles_touched, 1)))
capacity = -(-int(demand * 1.05) // 128) * 128
print(f"demand {demand} capacity {capacity}", file=sys.stderr)


def _diff_fields(p):
    safe_depth = jnp.where(p.valid, p.depths, 1.0)
    return jnp.stack(
        [p.means2d[:, 0], p.means2d[:, 1], p.conics[:, 0], p.conics[:, 1],
         p.conics[:, 2], p.opacities, p.colors[:, 0], p.colors[:, 1],
         p.colors[:, 2], 1.0 / safe_depth], axis=0)


layout = jax.jit(lambda p, f: inst.build_instances(
    p, f, grid_x=grid_x, grid_y=grid_y, capacity=capacity,
    tile_w=tile_w, tile_h=tile_h))(proj, jax.jit(_diff_fields)(proj))
layout = jax.block_until_ready(layout)
cap_int = layout.sorted_src.shape[0]

packed = None
for t_per in (8, 16, 32):
    fn = jax.jit(lambda m, s, e, tp=t_per: bp.blend_forward_pallas(
        m, s, e, grid_x=grid_x, grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
        chunk=cfg.chunk, t_per=tp))
    packed = timeit(f"fwd t_per={t_per}", fn, layout.meta_sorted,
                    layout.tile_starts, layout.tile_ends)

ct = jnp.ones(packed.shape[:2] + (bp.CT_COLS,), packed.dtype)
for chunk_b in (128, 256):
    for t_per in (2, 4):
        fn = jax.jit(lambda m, s, e, f, ctp, tp=t_per, cb=chunk_b:
                     bp.blend_backward_compact_pallas(
                         m, s, e, f, ctp, capacity=cap_int, grid_x=grid_x,
                         grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
                         chunk=cb, t_per=tp))
        timeit(f"bwd chunk={chunk_b} t_per={t_per}", fn, layout.meta_sorted,
               layout.tile_starts, layout.tile_ends, packed, ct)
