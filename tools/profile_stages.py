#!/usr/bin/env python
"""Stage-level timing of the round-2 render pipeline on the current backend."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from gaussian_splatting_tpu.config import RasterizeConfig
from gaussian_splatting_tpu.ops import blend_pallas as bp
from gaussian_splatting_tpu.ops import instances as inst
from gaussian_splatting_tpu.ops.preprocess import preprocess
from gaussian_splatting_tpu.ops.rasterize import render
from gaussian_splatting_tpu.utils.testing import random_scene

P = 500_000
W, H = 1920, 1080
cfg = RasterizeConfig(instance_slack=4.5)

scene = random_scene(P, sh_degree=3, width=W, height=H, seed=0, spread=2.0,
                     scale_range=(0.004, 0.02), cam_distance=4.0)
tile_w, tile_h = cfg.tile_w, cfg.tile_h
grid_x = (W + tile_w - 1) // tile_w
grid_y = (H + tile_h - 1) // tile_h
capacity = inst.required_capacity(P, cfg.instance_slack)


def _sync(x):
    return float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0 - 0.03) / n
    print(f"{name:>24}: {dt*1e3:9.2f} ms", flush=True)
    return out


def _diff_fields(proj):
    safe_depth = jnp.where(proj.valid, proj.depths, 1.0)
    return jnp.stack(
        [proj.means2d[:, 0], proj.means2d[:, 1], proj.conics[:, 0],
         proj.conics[:, 1], proj.conics[:, 2], proj.opacities,
         proj.colors[:, 0], proj.colors[:, 1], proj.colors[:, 2],
         1.0 / safe_depth], axis=0)


pre = jax.jit(lambda m, s, q, o, sh: preprocess(
    m, s, q, o, sh, scene.cam, sh_degree=3, tile_w=tile_w, tile_h=tile_h,
    scale_modifier=1.0, antialiasing=cfg.antialiasing))
proj = timeit("preprocess", pre, scene.means3d, scene.scales, scene.quats,
              scene.opacities, scene.sh)

build = jax.jit(lambda p, f: inst.build_instances(
    p, f, grid_x=grid_x, grid_y=grid_y, capacity=capacity,
    tile_w=tile_w, tile_h=tile_h))
fields = jax.jit(_diff_fields)(proj)
layout = timeit("build_instances", build, proj, fields)
print(f"   demand: {int(layout.num_instances)} / cap {capacity}")

fwd_fn = jax.jit(lambda m, s, e: bp.blend_forward_pallas(
    m, s, e, grid_x=grid_x, grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
    chunk=cfg.chunk, interpret=False))
packed = timeit("blend_fwd", fwd_fn, layout.meta_sorted, layout.tile_starts,
                layout.tile_ends)

ct = jnp.ones(packed.shape[:2] + (bp.CT_COLS,), packed.dtype)
bwd_fn = jax.jit(lambda m, s, e, f, ctp: bp.blend_backward_compact_pallas(
    m, s, e, f, ctp, capacity=capacity, grid_x=grid_x, grid_y=grid_y,
    tile_w=tile_w, tile_h=tile_h, chunk=min(cfg.chunk, 128), interpret=False))
timeit("blend_bwd_compact", bwd_fn, layout.meta_sorted, layout.tile_starts,
       layout.tile_ends, packed, ct)


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
