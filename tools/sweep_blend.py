#!/usr/bin/env python
"""Standalone fwd/bwd blend kernel sweep at bench shape.

Standalone timings carry ~3-5 ms of dispatch overhead vs trace self-time,
but RELATIVE comparisons across chunk/t_per variants are valid (round-3
finding).  Usage: python tools/sweep_blend.py [fwd|bwd|both]
"""

import sys
import time

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from gaussian_splatting_tpu.ops import blend_pallas as bp
from gaussian_splatting_tpu.ops import instances as inst
from gaussian_splatting_tpu.ops.preprocess import preprocess
from gaussian_splatting_tpu.utils.testing import random_scene

P = 500_000
W, H = 1920, 1080
scene = random_scene(P, sh_degree=3, width=W, height=H, seed=0, spread=2.0,
                     scale_range=(0.0025, 0.012), cam_distance=4.0)
tw = th = 16
gx, gy = W // 16, (H + 15) // 16
proj = jax.jit(lambda m, s, q, o, sh: preprocess(
    m, s, q, o, sh, scene.cam, sh_degree=3))(
    scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
demand = int(jnp.sum(jnp.maximum(proj.tiles_touched, 1)))
capacity = -(-int(demand * 1.05) // 128) * 128
print(f"demand {demand} capacity {capacity}", flush=True)


def _df(p):
    sd = jnp.where(p.valid, p.depths, 1.0)
    return jnp.stack([p.means2d[:, 0], p.means2d[:, 1], p.conics[:, 0],
                      p.conics[:, 1], p.conics[:, 2], p.opacities,
                      p.colors[:, 0], p.colors[:, 1], p.colors[:, 2],
                      1.0 / sd], 0)


layout = jax.jit(lambda p, f: inst.build_instances(
    p, f, grid_x=gx, grid_y=gy, capacity=capacity, tile_w=tw, tile_h=th))(
    proj, jax.jit(_df)(proj))
layout = jax.block_until_ready(layout)


def timeit(name, fn, *a, n=10):
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:>28}: {(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
          flush=True)
    return out


mode = sys.argv[1] if len(sys.argv) > 1 else "both"
fwd_out = None

if mode in ("fwd", "both"):
    for ck, tp in ((128, 16), (256, 16), (512, 8), (512, 16), (512, 32), (1024, 16)):
        fn = jax.jit(lambda m, s, e, c=ck, t=tp: bp.blend_forward_pallas(
            m, s, e, grid_x=gx, grid_y=gy, tile_w=tw, tile_h=th,
            chunk=c, t_per=t))
        out = timeit(f"fwd chunk={ck} t_per={tp}", fn, layout.meta_sorted,
                     layout.tile_starts, layout.tile_ends)
        if ck == 512 and tp == 16:
            fwd_out = out

if mode in ("bwd", "both"):
    if fwd_out is None:
        fwd_out = jax.jit(lambda m, s, e: bp.blend_forward_pallas(
            m, s, e, grid_x=gx, grid_y=gy, tile_w=tw, tile_h=th,
            chunk=512, t_per=16))(layout.meta_sorted, layout.tile_starts,
                                  layout.tile_ends)
        fwd_out = jax.block_until_ready(fwd_out)
    cap_int = layout.meta_sorted.shape[1]
    ct = jnp.ones((fwd_out.shape[0], 256, bp.CT_COLS), jnp.float32) * 0.3
    for ck, tp in ((128, 2), (256, 2)):
        fn = jax.jit(lambda m, s, e, f, c, k=ck, t=tp:
                     bp.blend_backward_compact_pallas(
                         m, s, e, f, c, capacity=cap_int, grid_x=gx,
                         grid_y=gy, tile_w=tw, tile_h=th, chunk=k, t_per=t))
        timeit(f"bwd chunk={ck} t_per={tp}", fn, layout.meta_sorted,
               layout.tile_starts, layout.tile_ends, fwd_out, ct)
