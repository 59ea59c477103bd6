"""Instance pipeline v2: expand -> payload sort -> aligned relayout.

Round-2 redesign of ops/binning.py driven by measured XLA-on-TPU costs
(tools/micro_sortgather*.py, DEVNOTES): random gathers/scatters run at
~5-15 GB/s effective (latency-bound), while ``jax.lax.sort`` moves extra
payload operands at ~1.85 ms per (2.25M,) f32 column — so ALL per-instance
data movement rides the sort:

  1. ``expand_instances`` (Pallas, ops/expand.py): Gaussian table ->
     expansion-order records + (tile, depth) keys, replacing the round-1
     scatter-marks + cumsum + two row gathers (~45 ms -> ~8 ms).
  2. One 13-operand ``lax.sort`` carries the 10 blend fields + source index
     with the keys (~25 ms), replacing the post-sort random row gather
     (~21 ms) AND the separate 4-op key sort (~15 ms).
  3. (round 4) The blend kernels read the sorted COMPACT stream directly —
     chunk-aligned window DMAs below each tile's start with head-masked
     lanes — so no aligned relayout exists anymore (the round-2/3 Pallas
     align kernel + its chunk-map glue cost ~10 ms/iter at bench scale).

Sentinels: every Gaussian emits >= 1 instance (zero-tile Gaussians get one
dropped sentinel with tile == num_tiles) so the expansion window stays
bounded (see ops/expand.py).  Capacity accounting therefore includes +P.

Reference semantics anchor: duplicateWithKeys -> RadixSort ->
identifyTileRanges (rasterizer_impl.cu:309-350).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.ops import expand as ex
from gaussian_splatting_tpu.ops.preprocess import ProjectedGaussians

CHUNK = ex.CHUNK
WINDOW = ex.WINDOW
MAX_CAPACITY = 1 << 24  # f32-exact integer range


class InstanceLayout(NamedTuple):
    """Sorted compact instance records + everything the VJP needs."""

    meta_sorted: jnp.ndarray  # (16, cap_int) compact blend-kernel records
    tile_starts: jnp.ndarray  # (num_tiles,) int32 compact (gapless) starts
    tile_ends: jnp.ndarray  # (num_tiles,) int32 = start + true count
    n_valid: jnp.ndarray  # () int32 — compact stream length (non-sentinel)
    sorted_src: jnp.ndarray  # (capacity,) int32 expansion slot per sorted pos
    g_exp: jnp.ndarray  # (capacity,) int32 owning Gaussian per expansion slot
    flags_exp: jnp.ndarray  # (capacity,) f32 1.0 at each Gaussian's first slot
    seg_ends: jnp.ndarray  # (P,) int32 expansion segment end per Gaussian
    nonempty: jnp.ndarray  # (P,) bool — Gaussian owns >= 1 real instance
    num_instances: jnp.ndarray  # () int32 sentinel-inclusive slot demand
    overflow: jnp.ndarray  # () bool


def required_capacity(P: int, instance_slack: float) -> int:
    """Instance-buffer size.  ``instance_slack`` must cover real instances
    AND one sentinel per untouched Gaussian (``demand`` in the layout /
    RenderResult.num_instances reports the sentinel-inclusive total, which
    is what slack estimation measures)."""
    cap = int(instance_slack * P) + 1024
    return -(-cap // CHUNK) * CHUNK


def build_instances(
    proj: ProjectedGaussians,
    diff_fields: jnp.ndarray,  # (10, P): mx,my,ca,cb,cc,op,r,g,b,invd (diff)
    *,
    grid_x: int,
    grid_y: int,
    capacity: int,
    tile_w: int,
    tile_h: int,
    grad_layout: bool = True,
    interpret: bool = False,
) -> InstanceLayout:
    """proj supplies the non-differentiable binning geometry (callers pass
    stop_gradient-ed projections); diff_fields carries the blend records the
    custom VJP differentiates through.  Tile ranges are COMPACT: the blend
    kernels DMA the 128-aligned window below each start and head-mask."""
    if capacity >= MAX_CAPACITY:
        raise ValueError(f"instance capacity {capacity} exceeds f32-exact range")
    assert capacity % CHUNK == 0
    P = proj.tiles_touched.shape[0]
    num_tiles = grid_x * grid_y

    # Internal working size: capacity + one align-window of tail slack,
    # rounded to the expand kernel's grid granularity.  Everything from the
    # expansion through the sorts runs at cap_int, so no stage needs a
    # slice/pad copy between kernels (round-2 spent ~6 ms/iter at bench
    # scale on those copies).  Slots past the real demand are terminator-
    # owned (tile == num_tiles, depth BIG) and sort to the dropped tail.
    gran = 8 * CHUNK  # expand kernel t_per = 8
    # Tail slack must cover the LARGEST blend-kernel chunk (the kernels clamp
    # tile ends to cap_int - chunk so the last window DMA stays in bounds;
    # with only WINDOW=256 of slack a 512/1024-lane chunk would truncate real
    # instances on non-overflow steps).  8*CHUNK = 1024 supports chunks up to
    # 1024 for <= 0.05% extra sort capacity.
    cap_int = -(-(capacity + 8 * CHUNK) // gran) * gran

    touched = proj.tiles_touched > 0
    counts = jnp.where(touched, proj.tiles_touched, 1)  # sentinels
    incl = jnp.cumsum(counts)
    offsets = (incl - counts).astype(jnp.float32)
    total_sent = incl[-1] if counts.size else jnp.int32(0)
    overflow = total_sent > capacity

    # ---- Gaussian table (32, P_pad), field-major: packed integer rows +
    # f32 blend fields + packed exact-cull span tables (round 5 layout;
    # see ops/expand.py) ----
    depth_key = jnp.where(touched & proj.valid, proj.depths, ex.BIG)
    rect_w = jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 1)
    pb = ex.PACK_BASE
    table_rows = [None] * ex.TBL_ROWS
    table_rows[ex.T_OFFSET] = offsets
    table_rows[ex.T_PACKXY] = (
        proj.rect_min[:, 0] + proj.rect_min[:, 1] * int(pb)
    ).astype(jnp.float32)
    table_rows[ex.T_PACKWF] = (
        rect_w + proj.span_flag.astype(jnp.int32) * int(pb)
    ).astype(jnp.float32)
    table_rows[ex.T_DEPTH] = depth_key
    table_rows[ex.T_MX] = diff_fields[0]
    table_rows[ex.T_MY] = diff_fields[1]
    table_rows[ex.T_CA] = diff_fields[2]
    table_rows[ex.T_CB] = diff_fields[3]
    table_rows[ex.T_CC] = diff_fields[4]
    table_rows[ex.T_OP] = diff_fields[5]
    table_rows[ex.T_R] = diff_fields[6]
    table_rows[ex.T_G] = diff_fields[7]
    table_rows[ex.T_B] = diff_fields[8]
    # Inverse depth is not carried: it is recomputed from the sorted depth
    # key (bitwise-identical 1/depth; diff_fields[9] == 1/safe_depth with
    # safe_depth == depth for every instance that reaches the blend).
    # Rows 13-15 are zero padding — Mosaic only DMAs 8-row-aligned windows.
    zero_row = jnp.zeros_like(diff_fields[0])
    for r in range(13, ex.T_SP):
        table_rows[r] = zero_row
    for r in range(ex.N_SPAN):
        table_rows[ex.T_SP + r] = proj.span_x0[:, r] + pb * proj.span_cum[:, r]
    table = jnp.stack(table_rows, axis=0)  # (32, P)

    # terminator column (owns every slot >= total) + BIG-offset pad columns
    P_pad = -(-(P + 1) // CHUNK) * CHUNK + WINDOW
    term = jnp.zeros((ex.TBL_ROWS, 1), jnp.float32)
    term = term.at[ex.T_OFFSET, 0].set(total_sent.astype(jnp.float32))
    term = term.at[ex.T_DEPTH, 0].set(ex.BIG)
    term = term.at[ex.T_PACKWF, 0].set(1.0)
    pad = jnp.zeros((ex.TBL_ROWS, P_pad - P - 1), jnp.float32)
    pad = pad.at[ex.T_OFFSET, :].set(ex.BIG)
    pad = pad.at[ex.T_PACKWF, :].set(1.0)
    table_T = jnp.concatenate([table, term, pad], axis=1)

    # ---- per-chunk window bases ----
    # n_before[j] = #offsets < j*CHUNK.  ``offsets`` is a cumsum, hence
    # sorted, so this is a searchsorted — a scatter-add histogram here
    # measured ~4.4 ms/iter at bench scale (round 5), the binary search is
    # sub-ms.
    nchunks = cap_int // CHUNK
    offs_ext = jnp.concatenate(
        [offsets, total_sent.astype(jnp.float32)[None]]
    ).astype(jnp.int32)
    n_before = jnp.searchsorted(
        offs_ext, jnp.arange(nchunks, dtype=jnp.int32) * CHUNK, side="left"
    ).astype(jnp.int32)
    u = jnp.maximum(n_before - 1, 0)
    chunk_bases = (u // CHUNK) * CHUNK

    tile, depth, g_exp, meta_rows = ex.expand_instances(
        table_T,
        chunk_bases,
        capacity=cap_int,
        grid_x=grid_x,
        grid_y=grid_y,
        tile_w=tile_w,
        tile_h=tile_h,
        interpret=interpret,
    )

    # ---- the payload sort (9 fields; invd recomputed from the depth key).
    # Payload operands are carried, never compared, so pairs of f32 rows
    # ride ONE complex64 operand — bit-exact, and payload movement is
    # per-operand overhead-bound (~1.85 ms per f32 column, tools/
    # micro_sortpack.py), so packing nearly halves the payload cost.  The
    # source index is exact in f32 (cap_int < 2^24, checked above).
    # NOTE (round 5): packing the (tile, depth) key pair into one complex64
    # key was tried and reverted — XLA decomposes complex sort operands back
    # into f32 pairs plus an extra iota at the HLO level, and the
    # lexicographic complex comparator measured ~1 ms SLOWER in a device
    # trace than the plain two-key sort.
    payload = meta_rows  # 9 (cap_int,) rows straight from the expand kernel
    if grad_layout:
        srcf = jnp.arange(cap_int, dtype=jnp.float32)
        ten = payload + (srcf,)
        packed5 = tuple(
            jax.lax.complex(ten[2 * i], ten[2 * i + 1]) for i in range(5)
        )
        out = jax.lax.sort((tile, depth) + packed5, num_keys=2, is_stable=True)
        sorted_tile = out[0]
        flat = []
        for c in out[2:7]:
            flat.append(jnp.real(c))
            flat.append(jnp.imag(c))
        sorted_fields = tuple(flat[:9])
        sorted_src = flat[9].astype(jnp.int32)
    else:
        packed4 = tuple(
            jax.lax.complex(payload[2 * i], payload[2 * i + 1]) for i in range(4)
        )
        out = jax.lax.sort(
            (tile, depth) + packed4 + (payload[8],), num_keys=2, is_stable=True
        )
        sorted_tile = out[0]
        flat = []
        for c in out[2:6]:
            flat.append(jnp.real(c))
            flat.append(jnp.imag(c))
        sorted_fields = tuple(flat) + (out[6],)
        sorted_src = None
    sorted_invd = 1.0 / out[1]  # depth key is finite (BIG, never inf/0)

    # ---- per-tile ranges: ONE searchsorted over the sorted keys.
    # (A scatter-add histogram with 2.75M updates into 8k bins measured
    # 24 ms/iter; 8k binary-search queries measure ~5 ms.)
    starts_ext = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    starts_t = starts_ext[:num_tiles]
    counts_t = starts_ext[1:] - starts_t

    # ---- compact sorted meta: the blend kernels read this DIRECTLY ----
    # Rows 0..9 are F_X..F_INVD; rows 10..15 zero padding (Mosaic DMAs only
    # 8- or 16-row HBM windows, and the blend is per-chunk-overhead bound,
    # so the pad rows cost ~nothing — tools/micro_rowslice_probe.py).
    # cap_int >= capacity + WINDOW, so the last window DMA past a tile end
    # stays in bounds (kernels also clamp ends to cap_int - chunk).
    zeros_rows = jnp.zeros((16 - 10, cap_int), jnp.float32)
    meta_sorted = jnp.concatenate(
        [jnp.stack(sorted_fields + (sorted_invd,), axis=0), zeros_rows], axis=0
    )

    # ---- gradient-layout bookkeeping ----
    if grad_layout:
        flags_exp = jnp.concatenate(
            [
                jnp.ones((1,), jnp.float32),
                (g_exp[1:] != g_exp[:-1]).astype(jnp.float32),
            ]
        )
    else:
        sorted_src = jnp.zeros((cap_int,), jnp.int32)
        flags_exp = jnp.zeros((cap_int,), jnp.float32)
        g_exp = jnp.zeros((cap_int,), jnp.int32)

    seg_ends = jnp.minimum(incl, cap_int).astype(jnp.int32)
    seg_starts = jnp.minimum(incl - counts, cap_int).astype(jnp.int32)
    nonempty = touched & (seg_ends > seg_starts)

    return InstanceLayout(
        meta_sorted=meta_sorted,
        tile_starts=starts_t,
        tile_ends=starts_t + counts_t,
        n_valid=starts_ext[num_tiles],
        sorted_src=sorted_src,
        g_exp=g_exp,
        flags_exp=flags_exp,
        seg_ends=seg_ends,
        nonempty=nonempty,
        num_instances=jnp.minimum(total_sent, capacity).astype(jnp.int32),
        overflow=overflow,
    )
