"""Tile binning: instance expansion, depth sort, tile ranges.

The reference builds a 64-bit (tileID << 32 | float-bits-of-depth) key per
(Gaussian, overlapped tile) pair, radix-sorts, and scans for tile boundaries
(``duplicateWithKeys``/``identifyTileRanges``, rasterizer_impl.cu:78-164,
309-350).  TPU-native redesign, shaped by measured XLA-on-TPU costs:

- The dynamic instance count (the reference's device->host ``num_rendered``
  sync, rasterizer_impl.cu:313) is replaced by a **fixed-capacity** instance
  buffer plus an overflow flag; the caller grows capacity between steps.
- Instance expansion is *gather*-based instead of scatter: slot s belongs to
  the last Gaussian whose first-instance offset is <= s.  That mapping is a
  scatter of ones at the offsets followed by a cumsum — orders of magnitude
  cheaper on TPU than the equivalent ``searchsorted`` (binary search is
  serial per query; the scan is one bandwidth-bound pass).
- All per-slot Gaussian attributes arrive via ONE row gather from a packed
  (P, 8) float table: XLA row gathers move whole 32-byte rows at bandwidth,
  while N separate 1-D gathers each pay the full latency-bound pass.
- The 64-bit radix sort becomes a two-key lexicographic ``jax.lax.sort`` on
  (tile_id, depth); depths are positive so float ordering == bit ordering.
- Tile ranges come from two ``searchsorted`` calls with only num_tiles
  queries (cheap — query count, not array size, is what matters).

The instance list is laid out *chunk-aligned*: every tile's range starts at
a multiple of ``chunk`` so the Pallas kernels' DMA slices are 128-lane
aligned (slots between a tile's true end and its aligned end hold
``gaussian_ids == -1``).

``pos_expansion`` maps each *expansion-order* slot (Gaussian-major, i.e.
instances of one Gaussian are contiguous) to its final aligned slot.  The
rasterizer's meta-gather VJP uses it to reduce per-instance gradients onto
Gaussians with a cumsum + segment-boundary differences instead of a
scatter-add (atomicAdd's role in backward.cu:592-609) — deterministic and
~3x faster than XLA's scatter on TPU.

Everything here is non-differentiable bookkeeping; callers pass
``stop_gradient``-ed projections.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.ops.preprocess import ProjectedGaussians

# f32 carries integers exactly up to 2^24; offsets/capacities must stay below.
MAX_CAPACITY = 1 << 24


class BinnedInstances(NamedTuple):
    """Sorted (tile, depth) instance list + per-tile ranges (see module doc)."""

    gaussian_ids: jnp.ndarray  # (aligned_capacity,) int32, -1 = padding
    tile_starts: jnp.ndarray  # (num_tiles,) int32, multiples of chunk
    tile_ends: jnp.ndarray  # (num_tiles,) int32 — start + true count
    pos_expansion: jnp.ndarray  # (capacity,) int32 expansion slot -> aligned slot
    seg_starts: jnp.ndarray  # (P,) int32 expansion-segment start per Gaussian
    seg_ends: jnp.ndarray  # (P,) int32 expansion-segment end (clamped)
    num_instances: jnp.ndarray  # () int32 actual (unaligned) instance count
    total_aligned: jnp.ndarray  # () int32 — end of the written region
    overflow: jnp.ndarray  # () bool — capacity exceeded, results truncated


def aligned_capacity(capacity: int, grid_x: int, grid_y: int, chunk: int) -> int:
    """Static instance-buffer size for chunk-aligned layout."""
    return capacity + grid_x * grid_y * chunk


def bin_gaussians(
    proj: ProjectedGaussians,
    *,
    grid_x: int,
    grid_y: int,
    capacity: int,
    chunk: int = 128,
    tile_w: int = 16,
    tile_h: int = 16,
    grad_layout: bool = True,
) -> BinnedInstances:
    """Expand Gaussians to per-tile instances and sort by (tile, depth).

    ``grad_layout=False`` skips the expansion->aligned mapping used only by
    the gradient reduction (a scatter worth ~15% of binning) for
    inference-only renders.
    """
    if capacity >= MAX_CAPACITY:
        raise ValueError(f"instance capacity {capacity} exceeds f32-exact range")
    num_tiles = grid_x * grid_y
    P = proj.tiles_touched.shape[0]
    tiles_touched = proj.tiles_touched

    # Exclusive cumsum of per-Gaussian tile counts: offsets[g] = first
    # instance slot of Gaussian g (rasterizer_impl.cu:309 InclusiveSum).
    incl = jnp.cumsum(tiles_touched)
    offsets = incl - tiles_touched
    total = incl[-1] if tiles_touched.size else jnp.int32(0)
    overflow = total > capacity

    # slot -> Gaussian: ones at each Gaussian's first slot, inclusive scan.
    # Zero-touch Gaussians mark the *next* Gaussian's start; the cumsum-1
    # still resolves to the largest g with offsets[g] <= s, which owns s.
    marks = jnp.zeros((capacity,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.cumsum(marks) - 1  # (capacity,)

    # Per-slot attributes in one row gather (f32 table, integers exact).
    table = jnp.stack(
        [
            offsets.astype(jnp.float32),
            proj.rect_min[:, 0].astype(jnp.float32),
            proj.rect_min[:, 1].astype(jnp.float32),
            jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 1).astype(
                jnp.float32
            ),
            jnp.where(proj.valid, proj.depths, jnp.inf),
            proj.means2d[:, 0],
            proj.means2d[:, 1],
            proj.cut_radius,
        ],
        axis=1,
    )  # (P, 8)
    rows = table[g]  # (capacity, 8)

    slots = jnp.arange(capacity, dtype=jnp.int32)
    in_range = slots < jnp.minimum(total, capacity)
    local = slots - rows[:, 0].astype(jnp.int32)
    safe_w = rows[:, 3].astype(jnp.int32)

    # Exact-cull slot -> (row, tile) mapping via the per-row circle spans
    # (preprocess.compute_tile_spans): tiles_touched counts ONLY tiles whose
    # closest pixel center lies within cut_radius, so corner cells of the
    # bounding rect never get slots at all.  Tall rects (span_flag False)
    # use the plain rect walk uncull'd.  Identical math to the expand
    # kernel (ops/expand.py) — this is the record-parity reference.
    cum = proj.span_cum[g].astype(jnp.int32)  # (capacity, 16)
    x0 = proj.span_x0[g].astype(jnp.int32)
    r = jnp.sum(cum <= local[:, None], axis=1)
    jj = jnp.arange(cum.shape[1], dtype=jnp.int32)[None, :]
    base = jnp.sum(jnp.where(jj == (r - 1)[:, None], cum, 0), axis=1)
    x0_sel = jnp.sum(jnp.where(jj == r[:, None], x0, 0), axis=1)
    is_span = proj.span_flag[g]
    ty = rows[:, 2].astype(jnp.int32) + jnp.where(is_span, r, local // safe_w)
    tx = jnp.where(
        is_span,
        x0_sel + (local - base),
        rows[:, 1].astype(jnp.int32) + local % safe_w,
    )

    tile = jnp.where(in_range, ty * grid_x + tx, num_tiles)
    depth = jnp.where(in_range, rows[:, 4], jnp.inf)

    # Two-key lexicographic sort replaces the packed 64-bit radix sort.
    # ``slots`` rides along to recover the expansion -> sorted permutation
    # (only needed for the gradient layout).
    if grad_layout:
        sorted_tile, _d, sorted_g, sorted_src = jax.lax.sort(
            (tile, depth, g, slots), num_keys=2, is_stable=True
        )
    else:
        sorted_tile, _d, sorted_g = jax.lax.sort(
            (tile, depth, g), num_keys=2, is_stable=True
        )
        sorted_src = None

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts

    # --- chunk-aligned relayout (see module docstring) ---
    cap_aligned = aligned_capacity(capacity, grid_x, grid_y, chunk)
    aligned_counts = ((counts + chunk - 1) // chunk) * chunk
    aligned_starts = (jnp.cumsum(aligned_counts) - aligned_counts).astype(jnp.int32)
    total_aligned = (
        (aligned_starts[-1] + aligned_counts[-1]).astype(jnp.int32)
        if num_tiles
        else jnp.int32(0)
    )

    # aligned destination per sorted position: one (num_tiles, 2) row gather
    tile_table = jnp.stack(
        [starts.astype(jnp.float32), aligned_starts.astype(jnp.float32)], axis=1
    )
    slot_tile = jnp.clip(sorted_tile, 0, num_tiles - 1)
    trow = tile_table[slot_tile]  # (capacity, 2)
    rank = slots - trow[:, 0].astype(jnp.int32)
    pos = trow[:, 1].astype(jnp.int32) + rank
    pos = jnp.where(sorted_tile < num_tiles, pos, cap_aligned)  # drop padding

    ids_aligned = jnp.full((cap_aligned,), -1, jnp.int32)
    ids_aligned = ids_aligned.at[pos].set(sorted_g, mode="drop")

    # expansion slot -> aligned slot (for the gradient segment reduction).
    # ``sorted_src`` is a permutation of [0, capacity): sorting (src, pos) by
    # src applies the inverse permutation — measurably cheaper than an XLA
    # scatter of the same size.
    if grad_layout:
        _, pos_expansion = jax.lax.sort((sorted_src, pos), num_keys=1)
    else:
        pos_expansion = jnp.full((capacity,), cap_aligned, jnp.int32)

    seg_starts = jnp.minimum(offsets, capacity).astype(jnp.int32)
    seg_ends = jnp.minimum(incl, capacity).astype(jnp.int32)

    return BinnedInstances(
        gaussian_ids=ids_aligned,
        tile_starts=aligned_starts,
        tile_ends=aligned_starts + counts,
        pos_expansion=pos_expansion,
        seg_starts=seg_starts,
        seg_ends=seg_ends,
        num_instances=jnp.minimum(total, capacity).astype(jnp.int32),
        total_aligned=total_aligned,
        overflow=overflow,
    )
