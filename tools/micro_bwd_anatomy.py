#!/usr/bin/env python
"""STALE (round 4): written against the round-3 rotation-based backward
(aligned reads + cstarts + bp._dot_exact_rhs01); the production kernel now
reads the compact stream directly.  Kept for the recorded DEVNOTES numbers.

Anatomy probe for the compact backward blend: time the kernel with parts
disabled to locate the µs/chunk. Variants:
  full        - production kernel
  nostage     - gradient math kept, rotation+staging+flush replaced by a
                single add into a fixed VMEM accumulator (output-path cost)
  nomath      - DMA + staging kept, gblock replaced by a cheap broadcast of
                alpha row sums (per-chunk gradient math cost)
  skeleton    - DMA + loop + state only (fixed per-chunk floor)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
tile_w = tile_h = 16
grid_x, grid_y = W // 16, (H + 15) // 16
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
cap_int = layout.sorted_src.shape[0]
packed = jax.jit(lambda m, s, e: bp.blend_forward_pallas(
    m, s, e, grid_x=grid_x, grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
    chunk=cfg.chunk))(layout.meta_sorted, layout.tile_starts, layout.tile_ends)
ct = jnp.ones(packed.shape[:2] + (bp.CT_COLS,), packed.dtype)

CHUNK = 128
T_PER = 2
PIX = 256


def variant_kernel(
    starts_ref, ends_ref, cstarts_ref, meta_hbm, fwd_ref, ct_ref, grad_hbm,
    state_ref, meta_vmem, staging, in_sems, flush_sems, sm,
    *, mode, grid_x, num_tiles,
):
    tri = bp._upper_tri(CHUNK)

    @pl.when(pl.program_id(0) == 0)
    def _():
        staging[...] = jnp.zeros_like(staging)
        sm[0] = 0

    for t in range(T_PER):
        tile_id = pl.program_id(0) * T_PER + t

        @pl.when(tile_id < num_tiles)
        def _():
            start = pl.multiple_of(starts_ref[tile_id], CHUNK)
            end = ends_ref[tile_id]
            px, py = bp._tile_pixel_coords(tile_id, grid_x, 16, 16)
            ox = ((tile_id % grid_x) * 16).astype(jnp.float32)
            oy = ((tile_id // grid_x) * 16).astype(jnp.float32)
            pxl, pyl = px - ox, py - oy
            ones_col = jnp.ones((PIX, 1), jnp.float32)
            Pmat = jnp.concatenate(
                [ones_col, pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl,
                 jnp.zeros((PIX, 2), jnp.float32)], axis=1)
            fwd = fwd_ref[t]
            T_final = fwd[:, bp.O_T:bp.O_T+1]
            n_contrib = fwd[:, bp.O_NB:bp.O_NB+1]  # NB >= last-contrib bound
            ctb = ct_ref[t]
            ctmat = ctb[:, :4]
            Ctot_q = (fwd[:, :4] * ctb[:, :4]).sum(1, keepdims=True) + T_final * ctb[:, 4:5]
            nchunks = pl.cdiv(end - start, CHUNK)
            max_nc = jnp.max(n_contrib).astype(jnp.int32)
            active = jnp.minimum(nchunks, pl.cdiv(max_nc, CHUNK))
            lane_s = jax.lax.broadcasted_iota(jnp.int32, (PIX, 8), 1)
            state_ref[:] = jnp.where(lane_s == 0, 1.0, 0.0)

            def in_dma(slot, c):
                return pltpu.make_async_copy(
                    meta_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
                    meta_vmem.at[slot], in_sems.at[slot])

            @pl.when(active > 0)
            def _():
                in_dma(0, 0).start()

            def body(c, _):
                @pl.when(c < active)
                def _():
                    slot = jax.lax.rem(c, 2)

                    @pl.when(c + 1 < active)
                    def _():
                        in_dma(jax.lax.rem(c + 1, 2), c + 1).start()
                    in_dma(slot, c).wait()
                    st = state_ref[:]
                    T = st[:, 0:1]
                    Bq = st[:, 1:2]
                    meta = meta_vmem[slot]
                    n_in = end - start - c * CHUNK
                    if mode == "skeleton":
                        T_new = T * (1.0 - 1e-6 * meta[0, 0])
                        Bq_new = Bq + meta[1, 0]
                        gblock = None
                    elif mode == "nomath":
                        a, el, _, _ = bp._chunk_alpha(meta, px, py, n_in, CHUNK)
                        s0 = jnp.sum(a, axis=0, keepdims=True)  # (1, CHUNK)
                        gblock = jnp.broadcast_to(s0, (16, CHUNK))
                        T_new = T * (1.0 - 1e-7)
                        Bq_new = Bq
                    else:
                        gblock, T_new, Bq_new = bp._bwd_chunk_math(
                            meta, c, n_in, T, Bq, px, py, ox, oy, Pmat, tri,
                            Ctot_q, ctmat, n_contrib, CHUNK, PIX)
                    if gblock is not None and mode != "nostage":
                        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                        gblock = jnp.where(lane_row < n_in, gblock, 0.0)
                        cstart = cstarts_ref[tile_id]
                        d0 = cstart + c * CHUNK
                        w0 = d0 // CHUNK
                        rot = d0 - w0 * CHUNK
                        ii = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 2 * CHUNK), 0)
                        jj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 2 * CHUNK), 1)
                        sel = (jj == ii + rot).astype(jnp.float32)
                        rotg = bp._dot_exact_rhs01(gblock, sel)
                        hA = jax.lax.rem(w0, 2)
                        staging[hA] = staging[hA] + rotg[:, :CHUNK]
                        staging[1 - hA] = staging[1 - hA] + rotg[:, CHUNK:]
                    elif gblock is not None:
                        staging[0] = staging[0] + gblock
                    state_ref[:] = jnp.concatenate(
                        [T_new, Bq_new, jnp.zeros((PIX, 6), jnp.float32)], axis=1)
                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        cp = pltpu.make_async_copy(
            staging.at[0], grad_hbm.at[:, pl.ds(0, CHUNK)], flush_sems.at[0])
        cp.start()
        cp.wait()


def run_variant(mode):
    num_tiles = grid_x * grid_y
    nprog = -(-num_tiles // T_PER)
    pad = nprog * T_PER - num_tiles
    starts = jnp.pad(layout.tile_starts.astype(jnp.int32), (0, pad))
    ends = jnp.pad(layout.tile_ends.astype(jnp.int32), (0, pad))
    cstarts = jnp.pad(layout.starts_compact.astype(jnp.int32), (0, pad))
    fwd_p = jnp.pad(packed, ((0, pad), (0, 0), (0, 0)))
    ct_p = jnp.pad(ct, ((0, pad), (0, 0), (0, 0)))
    kernel = functools.partial(variant_kernel, mode=mode, grid_x=grid_x,
                               num_tiles=num_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((T_PER, PIX, 8), lambda i, s_, e_, c_: (i, 0, 0)),
            pl.BlockSpec((T_PER, PIX, bp.CT_COLS), lambda i, s_, e_, c_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((PIX, 8), jnp.float32),
            pltpu.VMEM((2, 16, CHUNK), jnp.float32),
            pltpu.VMEM((2, 16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((8,), jnp.int32),
        ],
    )
    fn = jax.jit(lambda s, e, c_, m, f, ctp: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, cap_int + 2 * CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(s, e, c_, m, f, ctp))
    out = jax.block_until_ready(fn(starts, ends, cstarts, layout.meta_sorted, fwd_p, ct_p))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(starts, ends, cstarts, layout.meta_sorted, fwd_p, ct_p)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"{mode:>10}: {dt*1e3:8.2f} ms", flush=True)


prod = jax.jit(lambda m, s, e, c_, f, ctp: bp.blend_backward_compact_pallas(
    m, s, e, c_, f, ctp, capacity=cap_int, grid_x=grid_x, grid_y=grid_y,
    tile_w=16, tile_h=16, chunk=128, t_per=2))
out = jax.block_until_ready(prod(layout.meta_sorted, layout.tile_starts,
                                 layout.tile_ends, layout.starts_compact, packed, ct))
t0 = time.perf_counter()
for _ in range(10):
    out = prod(layout.meta_sorted, layout.tile_starts, layout.tile_ends,
               layout.starts_compact, packed, ct)
jax.block_until_ready(out)
print(f"{'prod':>10}: {(time.perf_counter()-t0)/10*1e3:8.2f} ms", flush=True)

for mode in ("full", "nostage", "nomath", "skeleton"):
    run_variant(mode)
