"""Pallas instance-expansion kernel: Gaussian table -> per-instance records.

Replaces round 1's XLA chain (scatter-marks + cumsum + two row gathers,
~45 ms/iter at bench scale) for the ``duplicateWithKeys`` role
(rasterizer_impl.cu:78-126): every Gaussian's record is replicated once per
overlapped tile, in *expansion order* (each Gaussian's instances contiguous).

Key idea: expansion order makes the slot->Gaussian map MONOTONE, so a
sequential-grid kernel can fetch a 256-row window of the table per 128-slot
chunk and expand it ENTIRELY on the MXU:

  geT[j, i]   = (offset[window j] <= slot i)            (256, 128) compare
  onehotT     = geT - shift_down(geT)                   one 1.0 per column
  out[f, i]   = table_T[f, window] @ onehotT            (16,256)@(256,128)

The one-hot operand is exactly bf16; the table rides a 3-way bf16 split
(hi+mid+lo covers all 24 f32 mantissa bits), so the expansion is EXACT — a
requirement, because these records feed the blend kernel whose image parity
budget vs the oracle is 2e-4.

Boundedness: every Gaussian is given at least one instance (zero-tile
Gaussians emit one *sentinel* instance with tile=num_tiles that sorts to the
dropped tail), so 128 consecutive slots can span at most 128 table rows and
the 256-row window (aligned down to a 128 boundary) always covers the chunk.

The kernel also computes each instance's tile id and depth key, so its
outputs feed ``jax.lax.sort`` directly — the sort carries the blend fields
as payload operands, replacing the post-sort random row-gather.  Slot
demand is EXACT (round 3): preprocess counts only tiles whose nearest pixel
center lies within the opacity-aware cut radius (contiguous per-row spans,
preprocess.compute_tile_spans), so culled corner cells of the bounding rect
never consume slots in any downstream stage — the kernel maps
slot -> (row, tile) with cumulative-span compares instead of a per-cell
circle test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Table column layout (TBL_ROWS, P_pad), field-major (Mosaic cannot DMA row
# slices of 16-minor arrays).  Round 5: small-integer fields ride PACKED
# rows (a + PACK_BASE*b, exact f32 integers < 2^24) — the expansion matmul's
# 3-way bf16 split is exact for EVERY f32, so packing costs nothing in
# precision while cutting the per-chunk window DMA from 48 to 32 rows and
# the expansion matmul from 112 to 96 row-passes.
PACK_BASE = 4096.0  # 2^12: packed pairs stay < 2^24 (f32-exact)
T_OFFSET = 0  # first instance slot (f32-exact integer)
T_PACKXY = 1  # rect_min_x + 4096*rect_min_y (tile units; grids < 4096)
T_PACKWF = 2  # rect width (>= 1) + 4096*span_flag
T_DEPTH = 3  # view depth; BIG marks invalid (sentinel-only) Gaussians
T_MX = 4  # means2d x (pixels)
T_MY = 5  # means2d y
T_CA = 6  # conic a
T_CB = 7  # conic b
T_CC = 8  # conic c
T_OP = 9  # opacity
T_R = 10
T_G = 11
T_B = 12
# Inverse depth is recomputed from the sorted depth key (see instances.py)
# so it needs no expanded row; rows 13-15 are zero padding (Mosaic requires
# the second-minor dim of any sliced HBM memref to be a multiple of the
# 8-sublane tile).
# Exact-cull span tables (preprocess.compute_tile_spans): instance slots are
# allocated only for tiles whose nearest pixel center is within the cut
# radius, so the slot -> (row, tile) mapping needs each row's first tile x
# and the cumulative count through each row.  No per-cell test runs in the
# kernel — the spans are computed ONCE in preprocess, so XLA/Mosaic sqrt
# rounding can never disagree about a slot's destination.  Row r of T_SP
# packs span_x0[r] + 4096*span_cum[r]; preprocess guarantees both < 4096
# (span_flag is cleared for footprints that would exceed it, falling back
# to exact full-rect expansion).
T_SP = 16  # rows 16..31
N_SPAN = 16
TBL_ROWS = 32

# Output meta row order == blend_pallas field order (F_X..F_B).  F_INVD is
# NOT expanded or sorted: inverse depth is recomputed from the sorted depth
# KEY (bitwise-identical 1/depth), saving one sort payload operand
# (~1.85 ms/iter at bench scale).
_META_ROWS = (T_MX, T_MY, T_CA, T_CB, T_CC, T_OP, T_R, T_G, T_B)
NUM_MROWS = len(_META_ROWS)  # 9 — meta output carries only real fields

WINDOW = 256  # table rows fetched per 128-slot chunk
CHUNK = 128

# Finite "infinity" for table sentinels (pad-row offsets, invalid depths).
# Must be finite: the expansion matmul's bf16 split turns inf into NaN
# (inf - bf16(inf) = NaN), and 0*NaN poisons the MXU accumulation.  2^24 is
# exact in f32/bf16 and exceeds every legal slot index and scene depth.
BIG = float(1 << 24)


def _split3(x):
    """Exact 3-way bf16 split: x == hi + mid + lo (24 mantissa bits)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r1 - mid
    return hi, mid, lo


def _dot_exact_rhs01(x, onehot):
    """x @ onehot, exact when onehot is 0/1: 3 default-precision MXU passes."""
    hi, mid, lo = _split3(x)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(hi, onehot) + d(mid, onehot) + d(lo, onehot)


def _expand_kernel(
    base_ref,  # (nchunks,) int32 scalar prefetch: 128-aligned window base
    table_hbm,  # (TBL_ROWS, P_pad) HBM, field-major
    tile_ref,  # out (1, T_PER*CHUNK) int32
    depth_ref,  # out (1, T_PER*CHUNK) f32
    g_ref,  # out (1, T_PER*CHUNK) int32
    *refs,  # NUM_MROWS x (1, T_PER*CHUNK) f32 meta-row outputs + scratch:
    #          win_vmem (2, t_per, TBL_ROWS, WINDOW) VMEM, sems (2, t_per)
    **kw,
):
    _expand_kernel_impl(
        base_ref, table_hbm, tile_ref, depth_ref, g_ref,
        refs[:NUM_MROWS], refs[NUM_MROWS], refs[NUM_MROWS + 1], **kw
    )


def _expand_kernel_impl(
    base_ref,
    table_hbm,
    tile_ref,
    depth_ref,
    g_ref,
    meta_refs,  # tuple of NUM_MROWS (1, T_PER*CHUNK) f32 — sort operands,
    #             written separately so no post-kernel row slicing is needed
    win_vmem,
    sems,
    *,
    nchunks: int,
    t_per: int,
    grid_x: int,
    grid_y: int,
    tile_w: int,
    tile_h: int,
):
    """Processes ``t_per`` chunks per grid step: the whole group's window
    DMAs are issued together (and the next group's prefetched), so the
    per-chunk HBM latency and the fixed per-grid-step cost amortize."""
    i = pl.program_id(0)
    num_tiles = grid_x * grid_y

    def win_dma(buf, t, cc):
        base = pl.multiple_of(base_ref[cc], CHUNK)
        return pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(base, WINDOW)],
            win_vmem.at[buf, t],
            sems.at[buf, t],
        )

    def start_group(buf, grp):
        for t in range(t_per):
            c = grp * t_per + t

            @pl.when(c < nchunks)
            def _():
                win_dma(buf, t, c).start()

    @pl.when(i == 0)
    def _():
        start_group(0, 0)

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        start_group(jax.lax.rem(i + 1, 2), i + 1)

    buf = jax.lax.rem(i, 2)
    for t in range(t_per):
        c = i * t_per + t

        @pl.when(c < nchunks)
        def _():
            win_dma(buf, t, c).wait()
            win = win_vmem[buf, t]  # (TBL_ROWS, WINDOW)

            base = base_ref[c]
            slot0 = c * CHUNK
            # slots of this chunk, (1, CHUNK)
            slot = (
                jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + slot0
            ).astype(jnp.float32)

            offs = win[T_OFFSET, :]  # (WINDOW,) f32-exact ints (BIG on pads)
            # geT[j, i] = offset[j] <= slot[i]
            geT = (offs[:, None] <= slot).astype(jnp.float32)  # (WINDOW, CHUNK)
            # one-hot ownership: last j with offset[j] <= slot
            ge_below = jnp.concatenate(
                [geT[1:, :], jnp.zeros((1, CHUNK), jnp.float32)], axis=0
            )
            onehotT = geT - ge_below  # exactly one 1.0 per column

            # One exact 3-way-split expansion over the whole packed table
            # (round 5: 32 rows instead of 48, see the layout note above).
            rows = _dot_exact_rhs01(win, onehotT)  # (TBL_ROWS, CHUNK)

            # g index: count of offsets <= slot, single exact pass (0/1)
            counts = jnp.dot(
                jnp.ones((1, WINDOW), jnp.float32), geT,
                preferred_element_type=jnp.float32,
            )  # (1, CHUNK)
            g = base + counts.astype(jnp.int32) - 1

            local = slot - rows[T_OFFSET : T_OFFSET + 1, :]  # (1, CHUNK)
            # --- unpack the integer-pair rows (exact: packed values are
            # f32-exact integers, /4096 is a power-of-two divide) ---
            pxy = rows[T_PACKXY : T_PACKXY + 1, :]
            rect_y = jnp.floor(pxy * (1.0 / PACK_BASE))
            rect_x = pxy - PACK_BASE * rect_y
            pwf = rows[T_PACKWF : T_PACKWF + 1, :]
            span_flag = jnp.floor(pwf * (1.0 / PACK_BASE))
            w = pwf - PACK_BASE * span_flag
            # --- rect mapping (tall rects + sentinels/terminator) ---
            # local // w and local % w in f32: (local + 0.5) / w never lands
            # on an integer for local < 2^22, w < 2^10, so floor is safe.
            ty_off_rect = jnp.floor((local + 0.5) / w)
            tx_rect = rect_x + (local - ty_off_rect * w)
            # --- span mapping: r = #(cum_j <= local) skips culled cells
            # and empty rows by construction; tx = x0_r + (local - cum_{r-1})
            sp = rows[T_SP : T_SP + N_SPAN, :]  # (16, CHUNK) packed
            cum = jnp.floor(sp * (1.0 / PACK_BASE))
            x0 = sp - PACK_BASE * cum
            le = (cum <= local).astype(jnp.float32)
            r = jnp.sum(le, axis=0, keepdims=True)  # (1, CHUNK) in [0, 16]
            # Mosaic only supports integer iota; cast (exact for 0..15).
            j = jax.lax.broadcasted_iota(
                jnp.int32, (N_SPAN, CHUNK), 0
            ).astype(jnp.float32)
            base = jnp.sum(jnp.where(j == r - 1.0, cum, 0.0), axis=0,
                           keepdims=True)
            x0_sel = jnp.sum(jnp.where(j == r, x0, 0.0), axis=0,
                             keepdims=True)
            is_span = span_flag > 0.5
            ty_off = jnp.where(is_span, r, ty_off_rect)
            tx = jnp.where(is_span, x0_sel + (local - base), tx_rect)
            ty = rect_y + ty_off

            depth = rows[T_DEPTH : T_DEPTH + 1, :]
            valid = depth < BIG
            tile = jnp.where(valid, ty * grid_x + tx, float(num_tiles))
            depth_out = jnp.where(valid, depth, BIG)

            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            tile_ref[:, sl] = tile.astype(jnp.int32)
            depth_ref[:, sl] = depth_out
            g_ref[:, sl] = g
            # one (1, cap) output per blend field: these ARE the sort's
            # payload operands, so emitting them separately kills the
            # 9-row post-kernel slice copies (~1.7 ms/iter at bench scale)
            # AND the 7 zero-pad rows of the old (16, cap) block.
            for k, r in enumerate(_META_ROWS):
                meta_refs[k][:, sl] = rows[r : r + 1, :]


def expand_instances(
    table_T: jnp.ndarray,  # (TBL_ROWS, P_pad) field-major table
    chunk_bases: jnp.ndarray,  # (nchunks,) int32, 128-aligned window starts
    *,
    capacity: int,
    grid_x: int,
    grid_y: int,
    tile_w: int,
    tile_h: int,
    t_per: int = 8,
    interpret: bool = False,
):
    """Expansion-order instance records + (tile, depth) sort keys + g.

    Returns (tile (cap,) i32, depth (cap,) f32, g (cap,) i32,
    meta_rows: tuple of NUM_MROWS (cap,) f32 in F_X..F_B order).
    """
    assert capacity % (t_per * CHUNK) == 0
    nchunks = capacity // CHUNK
    assert chunk_bases.shape[0] == nchunks
    nprog = nchunks // t_per
    kernel = functools.partial(
        _expand_kernel,
        nchunks=nchunks,
        t_per=t_per,
        grid_x=grid_x,
        grid_y=grid_y,
        tile_w=tile_w,
        tile_h=tile_h,
    )
    row_spec = pl.BlockSpec((1, t_per * CHUNK), lambda i, b_: (0, i))
    row_shape = jax.ShapeDtypeStruct((1, capacity), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[row_spec, row_spec, row_spec]
        + [row_spec] * NUM_MROWS,
        scratch_shapes=[
            pltpu.VMEM((2, t_per, TBL_ROWS, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, t_per)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, capacity), jnp.int32),
            row_shape,
            jax.ShapeDtypeStruct((1, capacity), jnp.int32),
        ]
        + [row_shape] * NUM_MROWS,
        interpret=interpret,
    )(chunk_bases, table_T)
    tile, depth, g = out[0], out[1], out[2]
    meta_rows = tuple(m[0] for m in out[3:])
    return tile[0], depth[0], g[0], meta_rows
