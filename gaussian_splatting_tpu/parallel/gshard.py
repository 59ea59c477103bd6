"""Gaussian-sharded + tile-sharded rendering (SURVEY.md §7 phase B).

The Gaussian axis is sharded over the mesh: each device preprocesses its own
shard (projection/covariance/SH — the per-Gaussian FLOPs scale 1/n), the
compact projected attributes are all-gathered over ICI, and each device
bins + blends only its horizontal stripe of tiles, producing its slice of
the image.  The backward follows automatically from autodiff through the
collectives (grad of all_gather = reduce-scatter), so per-Gaussian parameter
gradients land pre-sharded on their owner device.

This is the round-1 exchange strategy (gather projected Gaussians, ~56 B
each); the planned round-2 upgrade is an instance all-to-all by tile
ownership, which moves only the instances a stripe actually needs.

Alpha compositing is order-dependent; sharding by *tiles* (not by depth)
keeps each pixel's full blend list on one device, so no cross-device
composition is ever needed (redistribute-then-sort, SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gaussian_splatting_tpu.config import RasterizeConfig
from gaussian_splatting_tpu.ops import blend_pallas as bp
from gaussian_splatting_tpu.ops.binning import bin_gaussians
from gaussian_splatting_tpu.ops.camera_math import CameraParams
from gaussian_splatting_tpu.ops.preprocess import preprocess
from gaussian_splatting_tpu.ops.rasterize import _build_meta, _make_blend_core, _untile


def render_gaussian_sharded(
    means3d: jnp.ndarray,  # (P, 3) sharded over 'data' by the caller
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    sh: jnp.ndarray,
    cam: CameraParams,
    bg_color: jnp.ndarray,
    mesh: Mesh,
    *,
    sh_degree: int,
    cfg: RasterizeConfig = RasterizeConfig(),
    capacity_per_device: int = 0,
) -> jnp.ndarray:
    """Distributed render; returns the assembled (3, H, W) image.

    The Gaussian count must divide the mesh size; the image height is padded
    so each device owns an equal stripe of tile rows.
    """
    n = mesh.devices.size
    tile_w, tile_h = cfg.tile_w, cfg.tile_h
    W, H = cam.width, cam.height
    grid_x = (W + tile_w - 1) // tile_w
    grid_y_total = -(-H // tile_h)
    grid_y_total = -(-grid_y_total // n) * n  # pad so stripes are equal
    grid_y_local = grid_y_total // n
    P_total = means3d.shape[0]
    if capacity_per_device <= 0:
        capacity_per_device = int(cfg.instance_slack * P_total) // n + 1024
    capacity_per_device = -(-capacity_per_device // cfg.chunk) * cfg.chunk

    interpret = jax.default_backend() != "tpu"
    core = _make_blend_core(grid_x, grid_y_local, tile_w, tile_h, cfg.chunk, interpret)

    def body(m, s, q, o, shs):
        # --- per-Gaussian stage on the local shard ---
        proj_local = preprocess(
            m, s, q, o, shs, cam,
            sh_degree=sh_degree, tile_w=tile_w, tile_h=tile_h,
            antialiasing=cfg.antialiasing,
        )
        # --- gather compact projected attributes over ICI ---
        proj = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, "data", tiled=True), proj_local
        )
        # --- clip tile rects to this device's stripe of tile rows ---
        d = jax.lax.axis_index("data")
        y0 = d * grid_y_local
        rmin = proj.rect_min
        rmax = proj.rect_max
        ry_min = jnp.clip(rmin[:, 1] - y0, 0, grid_y_local)
        ry_max = jnp.clip(rmax[:, 1] - y0, 0, grid_y_local)
        tiles = (rmax[:, 0] - rmin[:, 0]) * (ry_max - ry_min)
        # shift screen-space means into the stripe's local pixel frame (the
        # blend kernel derives pixel coords from local tile ids)
        y_shift = (y0 * tile_h).astype(jnp.float32)
        means2d_local = proj.means2d - jnp.stack(
            [jnp.zeros_like(y_shift), y_shift]
        )[None, :]
        proj = proj._replace(
            means2d=means2d_local,
            rect_min=jnp.stack([rmin[:, 0], ry_min], axis=-1),
            rect_max=jnp.stack([rmax[:, 0], ry_max], axis=-1),
            tiles_touched=jnp.where(proj.valid, tiles, 0),
        )
        binned = bin_gaussians(
            jax.tree_util.tree_map(jax.lax.stop_gradient, proj),
            grid_x=grid_x,
            grid_y=grid_y_local,
            capacity=capacity_per_device,
            chunk=cfg.chunk,
            tile_w=tile_w,
            tile_h=tile_h,
        )
        meta = _build_meta(proj, binned, cfg.chunk)
        packed = core(meta, binned.tile_starts, binned.tile_ends, binned.total_aligned)
        img = _untile(
            packed, grid_x, grid_y_local, tile_w, tile_h,
            grid_x * tile_w, grid_y_local * tile_h,
        )
        c_nobg = img[bp.O_R : bp.O_B + 1]
        T_img = img[bp.O_T]
        return c_nobg + T_img[None] * bg_color[:, None, None]

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(None, "data", None),
        check_vma=False,
    )(means3d, scales, quats, opacities, sh)
    return jnp.clip(out[:, :H, :W], 0.0, 1.0)
