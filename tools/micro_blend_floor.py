#!/usr/bin/env python
"""Speed-of-light probe for the forward blend's per-chunk body.

Runs stripped Pallas kernels over the same (tiles, chunks) stream as the
real forward at bench shape, each adding one cost layer:

  dma      : double-buffered chunk DMA only (pipeline + bandwidth floor)
  alpha    : + dx/dy/power/exp/alpha/eligibility (the irreducible math)
  cumlog   : + log / MXU tri cumsum / exp / test_T (transmittance chain)
  full     : the real forward kernel

The gap full-minus-cumlog is accumulation/state/early-stop overhead; the
gap cumlog-minus-alpha is the transmittance chain; alpha-minus-dma is the
Gaussian evaluation.  Interpreting VPU headroom: if `alpha` is already
close to `full`, the kernel is at its VPU wall and only instance-count or
precision changes can move it.
"""

import functools
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 500_000
W, H = 1920, 1080
cfg = RasterizeConfig()
scene = random_scene(P, sh_degree=3, width=W, height=H, seed=0, spread=2.0,
                     scale_range=(0.0025, 0.012), cam_distance=4.0)
tile_w, tile_h = cfg.tile_w, cfg.tile_h
grid_x = (W + tile_w - 1) // tile_w
grid_y = (H + tile_h - 1) // tile_h
num_tiles = grid_x * grid_y
pix = tile_w * tile_h
CHUNK = 128
T_PER = 16


def _stripped_kernel(starts_ref, ends_ref, meta_hbm, out_ref, meta_vmem, sems,
                     *, level: str):
    tri = bp._upper_tri(CHUNK)
    for t in range(T_PER):
        tile_id = pl.program_id(0) * T_PER + t

        @pl.when(tile_id < num_tiles)
        def _():
            start = pl.multiple_of(starts_ref[tile_id], CHUNK)
            end = ends_ref[tile_id]
            nchunks = pl.cdiv(end - start, CHUNK)
            px, py = bp._tile_pixel_coords(tile_id, grid_x, tile_w, tile_h)
            out_ref[t] = jnp.zeros((pix, 8), jnp.float32)

            def chunk_dma(slot, c):
                return pltpu.make_async_copy(
                    meta_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
                    meta_vmem.at[slot], sems.at[slot],
                )

            @pl.when(nchunks > 0)
            def _():
                chunk_dma(0, 0).start()

            def body(c, acc):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < nchunks)
                def _():
                    chunk_dma(jax.lax.rem(c + 1, 2), c + 1).start()

                chunk_dma(slot, c).wait()
                meta = meta_vmem[slot]
                if level == "dma":
                    # consume one row so the DMA isn't dead-code-eliminated
                    return acc + jnp.sum(meta[0:1, :])
                n_in = end - start - c * CHUNK
                alpha, eligible, _nc, _G, _dx, _dy = bp._chunk_alpha(
                    meta, px, py, n_in, CHUNK)
                if level == "alpha":
                    return acc + jnp.sum(alpha)
                om = 1.0 - alpha
                lw = jnp.log(om)
                cum_log = bp._dot_tri(lw, tri)
                E = jnp.exp(cum_log - lw)
                test_T = E * om
                if level == "cumlog":
                    return acc + jnp.sum(
                        jnp.where(test_T >= bp.T_EPS, alpha, 0.0)
                    )
                # + the accumulation contraction and lane reductions, but
                # NO (pix, 8) state read-modify-write and NO while-loop
                before_bad = test_T >= bp.T_EPS
                w = jnp.where(before_bad & eligible, alpha * E, 0.0)
                a4 = bp._dot3(
                    w, meta[bp.F_R : bp.F_INVD + 1, :],
                    (((1,), (1,)), ((), ())),
                )  # (pix, 4)
                m_all = jnp.min(test_T, axis=1, keepdims=True)
                m_ok = jnp.min(
                    jnp.where(before_bad, test_T, bp.BIG_T),
                    axis=1, keepdims=True,
                )
                lane = jax.lax.broadcasted_iota(jnp.int32, (pix, CHUNK), 1)
                pos = (c * CHUNK + lane + 1).astype(jnp.float32)
                nc = jnp.max(jnp.where(before_bad, pos, 0.0), axis=1,
                             keepdims=True)
                return (
                    acc + jnp.sum(a4) + jnp.sum(m_all) + jnp.sum(m_ok)
                    + jnp.sum(nc)
                )

            acc = jax.lax.fori_loop(0, nchunks, body, jnp.float32(0))
            out_ref[t] = jnp.full((pix, 8), acc)


def run_stripped(level, meta, starts, ends):
    kernel = functools.partial(_stripped_kernel, level=level)
    nprog = -(-num_tiles // T_PER)
    pad = nprog * T_PER - num_tiles
    s = jnp.pad(starts.astype(jnp.int32), (0, pad))
    e = jnp.pad(ends.astype(jnp.int32), (0, pad))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((T_PER, pix, 8), lambda i, s_, e_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, bp.NUM_FIELDS, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprog * T_PER, pix, 8), jnp.float32),
    )(s, e, meta)


def _sync(out):
    # block_until_ready can return immediately for tunnel arrays; a scalar
    # fetch is the reliable sync (DEVNOTES round 2)
    return float(jnp.asarray(out).ravel()[0])


def timeit(name, fn, *args, n=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    print(f"{name:>10}: {(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
          flush=True)


proj = jax.jit(lambda m, s, q, o, sh: preprocess(
    m, s, q, o, sh, scene.cam, sh_degree=3))(
    scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
demand = int(jnp.sum(jnp.maximum(proj.tiles_touched, 1)))
capacity = -(-int(demand * 1.05) // 128) * 128


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

for level in ("dma", "alpha", "cumlog", "accum"):
    timeit(level, jax.jit(functools.partial(run_stripped, level)),
           layout.meta_sorted, layout.tile_starts, layout.tile_ends)

timeit("full", jax.jit(lambda m, s, e: bp.blend_forward_pallas(
    m, s, e, grid_x=grid_x, grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
    chunk=CHUNK)), layout.meta_sorted, layout.tile_starts, layout.tile_ends)
