#!/usr/bin/env python
"""Stage-level timing of the render pipeline on the current backend."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.config import RasterizeConfig
from gaussian_splatting_tpu.ops import blend_pallas as bp
from gaussian_splatting_tpu.ops.binning import bin_gaussians
from gaussian_splatting_tpu.ops.preprocess import preprocess
from gaussian_splatting_tpu.ops.rasterize import render, _build_meta, _make_blend_core
from gaussian_splatting_tpu.utils.testing import random_scene

P = 500_000
W, H = 1920, 1080
cfg = RasterizeConfig(instance_slack=4.0)

scene = random_scene(P, sh_degree=3, width=W, height=H, seed=0, spread=2.0,
                     scale_range=(0.004, 0.02), cam_distance=4.0)
tile_w, tile_h = cfg.tile_w, cfg.tile_h
grid_x = (W + tile_w - 1) // tile_w
grid_y = (H + tile_h - 1) // tile_h
capacity = int(cfg.instance_slack * P) + 1024
capacity = -(-capacity // cfg.chunk) * cfg.chunk


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>24}: {dt*1e3:9.2f} ms")
    return out


pre = jax.jit(lambda m, s, q, o, sh: preprocess(
    m, s, q, o, sh, scene.cam, sh_degree=3, tile_w=tile_w, tile_h=tile_h,
    scale_modifier=1.0, antialiasing=cfg.antialiasing))
proj = timeit("preprocess", pre, scene.means3d, scene.scales, scene.quats,
              scene.opacities, scene.sh)

bin_fn = jax.jit(lambda p: bin_gaussians(p, grid_x=grid_x, grid_y=grid_y,
                                         capacity=capacity, chunk=cfg.chunk))
binned = timeit("binning(sort)", bin_fn, proj)
print(f"   instances: {int(binned.num_instances)} / cap {capacity} "
      f"(aligned {int(binned.total_aligned)})")

meta_fn = jax.jit(lambda p, b: _build_meta(p, b, cfg.chunk))
meta = timeit("build_meta(gather)", meta_fn, proj, binned)

core = _make_blend_core(grid_x, grid_y, tile_w, tile_h, cfg.chunk, False)
fwd_fn = jax.jit(lambda m, s, e, t: bp.blend_forward_pallas(
    m, s, e, grid_x=grid_x, grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
    chunk=cfg.chunk, interpret=False))
packed = timeit("blend_fwd", fwd_fn, meta, binned.tile_starts,
                binned.tile_ends, binned.total_aligned)

ct = jnp.ones_like(packed)
bwd_fn = jax.jit(lambda m, s, e, f, c: bp.blend_backward_pallas(
    m, s, e, f, c, grid_x=grid_x, grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
    chunk=cfg.chunk, interpret=False))
timeit("blend_bwd", bwd_fn, meta, binned.tile_starts, binned.tile_ends,
       packed, ct)


def full_fwd(m, s, q, o, sh):
    return render(m, s, q, o, sh, scene.cam, scene.bg, sh_degree=3, cfg=cfg).image


timeit("full_fwd", jax.jit(full_fwd), scene.means3d, scene.scales, scene.quats,
       scene.opacities, scene.sh)


def loss(m, s, q, o, sh):
    out = render(m, s, q, o, sh, scene.cam, scene.bg, sh_degree=3, cfg=cfg)
    return jnp.sum(out.image) + jnp.sum(out.invdepth)


grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
timeit("full_fwd+bwd", grad_fn, scene.means3d, scene.scales, scene.quats,
       scene.opacities, scene.sh)
