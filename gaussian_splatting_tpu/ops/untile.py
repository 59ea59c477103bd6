"""Pallas untile: packed per-tile blend output -> image layout, and back.

The rasterizer's Pallas kernels produce (num_tiles, PIX, CT_COLS) tile-major
blocks; losses want (C, H, W).  XLA's transpose for this pattern costs
~2.1 ms per direction at bench scale (trace: rasterize.py untile copies);
the same relayout as a Pallas kernel with a (C, 1, tile_h, t_per*tile_w)
output block measures ~0.2 ms (tools/micro_untile.py), because the per-tile
(PIX, C) -> (C, th, tw) relayout stays in registers.

The backward of untile is exactly retile (a permutation), wired as a
custom_vjp so the cotangent path uses the mirror kernel instead of XLA's
transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _untile_kernel(x_ref, o_ref, *, t_per, cols, tile_w, tile_h):
    for t in range(t_per):
        st = x_ref[t]  # (PIX, cols)
        img = st.reshape(tile_h, tile_w, cols)  # splits the major dim: free
        img = jnp.transpose(img, (2, 0, 1))  # in-register relayout
        o_ref[:, 0, :, t * tile_w : (t + 1) * tile_w] = img


def _retile_kernel(x_ref, o_ref, *, t_per, cols, tile_w, tile_h):
    for t in range(t_per):
        img = x_ref[:, 0, :, t * tile_w : (t + 1) * tile_w]  # (cols, th, tw)
        st = jnp.transpose(img, (1, 2, 0)).reshape(tile_h * tile_w, cols)
        o_ref[t] = st


def _untile_raw(packed, *, grid_x, grid_y, tile_w, tile_h, t_per, interpret):
    num_tiles, pix, cols = packed.shape
    nxg = grid_x // t_per
    kernel = functools.partial(
        _untile_kernel, t_per=t_per, cols=cols, tile_w=tile_w, tile_h=tile_h
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid_y, nxg),
        in_specs=[
            pl.BlockSpec((t_per, pix, cols), lambda y, xg: (y * nxg + xg, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (cols, 1, tile_h, t_per * tile_w), lambda y, xg: (0, y, 0, xg)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (cols, grid_y, tile_h, grid_x * tile_w), packed.dtype
        ),
        interpret=interpret,
    )(packed)
    return out.reshape(cols, grid_y * tile_h, grid_x * tile_w)


def _retile_raw(img, *, grid_x, grid_y, tile_w, tile_h, t_per, interpret):
    cols = img.shape[0]
    pix = tile_w * tile_h
    nxg = grid_x // t_per
    x = img.reshape(cols, grid_y, tile_h, grid_x * tile_w)
    kernel = functools.partial(
        _retile_kernel, t_per=t_per, cols=cols, tile_w=tile_w, tile_h=tile_h
    )
    return pl.pallas_call(
        kernel,
        grid=(grid_y, nxg),
        in_specs=[
            pl.BlockSpec(
                (cols, 1, tile_h, t_per * tile_w), lambda y, xg: (0, y, 0, xg)
            ),
        ],
        out_specs=pl.BlockSpec(
            (t_per, pix, cols), lambda y, xg: (y * nxg + xg, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid_y * grid_x, pix, cols), img.dtype
        ),
        interpret=interpret,
    )(x)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6)
)
def untile_pallas(packed, grid_x, grid_y, tile_w, tile_h, t_per, interpret):
    """(num_tiles, PIX, C) tile-major -> (C, grid_y*tile_h, grid_x*tile_w).

    Requires grid_x % t_per == 0 (callers pick t_per = a divisor).  The VJP
    is the mirror retile kernel — both directions stay off XLA's transpose
    path.  Callers crop the padded image to (H, W).
    """
    return _untile_raw(
        packed, grid_x=grid_x, grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
        t_per=t_per, interpret=interpret,
    )


def _untile_fwd(packed, grid_x, grid_y, tile_w, tile_h, t_per, interpret):
    return _untile_raw(
        packed, grid_x=grid_x, grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
        t_per=t_per, interpret=interpret,
    ), None


def _untile_bwd(grid_x, grid_y, tile_w, tile_h, t_per, interpret, _res, ct):
    return (_retile_raw(
        ct, grid_x=grid_x, grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
        t_per=t_per, interpret=interpret,
    ),)


untile_pallas.defvjp(_untile_fwd, _untile_bwd)


def pick_t_per(grid_x: int, tile_w: int = 16, target: int = 8) -> int:
    """Largest Mosaic-legal tile group: the output block's last dim
    (t_per*tile_w) must be a multiple of 128 OR span the full padded row
    (Mosaic block-shape rule; t_per must also divide grid_x).  Falls back
    to one whole row per block — always legal, still one program per row."""
    for t in range(min(target, grid_x), 0, -1):
        if grid_x % t == 0 and (t * tile_w) % 128 == 0:
            return t
    return grid_x
