"""Tile binning: instance expansion, depth sort, tile ranges.

The reference builds a 64-bit (tileID << 32 | float-bits-of-depth) key per
(Gaussian, overlapped tile) pair, radix-sorts, and scans for tile boundaries
(``duplicateWithKeys``/``identifyTileRanges``, rasterizer_impl.cu:78-164,
309-350).  TPU-native redesign:

- The dynamic instance count (the reference's device->host ``num_rendered``
  sync, rasterizer_impl.cu:313) is replaced by a **fixed-capacity** instance
  buffer plus an overflow flag; the caller grows capacity between steps.
- Instance expansion is *gather*-based instead of scatter: each instance slot
  binary-searches the exclusive-cumsum of ``tiles_touched`` for its source
  Gaussian — no scatter, no atomics, fully vectorized.
- The 64-bit radix sort becomes a two-key lexicographic ``jax.lax.sort`` on
  (tile_id, depth); depths are positive so float ordering == bit ordering.
- Tile ranges come from two ``searchsorted`` calls over the sorted tile ids.

Everything here is non-differentiable bookkeeping; callers pass
``stop_gradient``-ed projections.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.ops.preprocess import ProjectedGaussians


class BinnedInstances(NamedTuple):
    """Sorted (tile, depth) instance list + per-tile ranges.

    The instance list is laid out *chunk-aligned*: every tile's range starts
    at a multiple of ``chunk`` (slots between a tile's true end and its
    aligned end hold ``gaussian_ids == -1``).  This guarantees the Pallas
    kernels' DMA slices are 128-lane aligned — a Mosaic requirement — and
    makes every instance DMA a full aligned block.
    """

    gaussian_ids: jnp.ndarray  # (aligned_capacity,) int32, -1 = padding
    tile_starts: jnp.ndarray  # (num_tiles,) int32, multiples of chunk
    tile_ends: jnp.ndarray  # (num_tiles,) int32 — start + true count
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
) -> BinnedInstances:
    """Expand Gaussians to per-tile instances and sort by (tile, depth)."""
    num_tiles = grid_x * grid_y
    tiles_touched = proj.tiles_touched

    # Exclusive cumsum of per-Gaussian tile counts: offsets[g] = first
    # instance slot of Gaussian g (rasterizer_impl.cu:309 InclusiveSum).
    offsets = jnp.cumsum(tiles_touched) - tiles_touched
    total = offsets[-1] + tiles_touched[-1] if tiles_touched.size else jnp.int32(0)
    overflow = total > capacity

    # Gather-based inverse of the reference's duplicateWithKeys scatter
    # (rasterizer_impl.cu:78-126): slot s belongs to Gaussian
    # g = searchsorted(offsets, s, 'right') - 1, local tile index s - offsets[g].
    slots = jnp.arange(capacity, dtype=jnp.int32)
    g = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32) - 1
    g = jnp.clip(g, 0, tiles_touched.shape[0] - 1)
    local = slots - offsets[g]
    in_range = slots < jnp.minimum(total, capacity)

    rect_min = proj.rect_min[g]
    rect_w = proj.rect_max[g, 0] - rect_min[:, 0]
    safe_w = jnp.maximum(rect_w, 1)
    ty = rect_min[:, 1] + local // safe_w
    tx = rect_min[:, 0] + local % safe_w
    tile = ty * grid_x + tx
    tile = jnp.where(in_range, tile, num_tiles)

    depth = jnp.where(in_range, proj.depths[g], jnp.inf)
    # Two-key lexicographic sort replaces the packed 64-bit radix sort.
    sorted_tile, _sorted_depth, sorted_g = jax.lax.sort(
        (tile, depth, g), num_keys=2, is_stable=True
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts

    # --- chunk-aligned relayout (see class docstring) ---
    cap_aligned = aligned_capacity(capacity, grid_x, grid_y, chunk)
    aligned_counts = ((counts + chunk - 1) // chunk) * chunk
    aligned_starts = (jnp.cumsum(aligned_counts) - aligned_counts).astype(jnp.int32)
    total_aligned = (
        (aligned_starts[-1] + aligned_counts[-1]).astype(jnp.int32)
        if num_tiles
        else jnp.int32(0)
    )

    slot_tile = jnp.clip(sorted_tile, 0, num_tiles - 1)
    rank = slots - starts[slot_tile]
    pos = aligned_starts[slot_tile] + rank
    pos = jnp.where(sorted_tile < num_tiles, pos, cap_aligned)  # drop padding
    ids_aligned = jnp.full((cap_aligned,), -1, jnp.int32)
    ids_aligned = ids_aligned.at[pos].set(sorted_g, mode="drop")

    return BinnedInstances(
        gaussian_ids=ids_aligned,
        tile_starts=aligned_starts,
        tile_ends=aligned_starts + counts,
        num_instances=jnp.minimum(total, capacity).astype(jnp.int32),
        total_aligned=total_aligned,
        overflow=overflow,
    )
