"""Dense reference renderer (the correctness oracle).

A deliberately simple, fully differentiable renderer: every pixel scans every
Gaussian in global depth order, with the same tile-rect coverage test, alpha
thresholds and early-termination semantics as the reference's tiled blend
kernel (``renderCUDA``, forward.cu:367-513).  It plays the role the
``--convert_SHs_python`` / ``--compute_cov3D_python`` fallbacks play in the
reference (arguments/__init__.py:68-69): an oracle the fast kernels are
verified against — forward values AND pixel gradients.

Only use on small scenes: O(P * H * W) work, O(P) scan steps.

Blend-order note: instances within a tile are processed in view-depth order
(ties broken by Gaussian index, matching the reference's stable radix sort of
(tileID | depth-bits) keys, rasterizer_impl.cu:332-340).

One deliberate semantic deviation from the reference CUDA: the gradient of
``alpha = min(0.99, op * G)`` is taken as exactly 0 on the capped branch
(autodiff semantics), where backward.cu:600-609 ignores the cap.  This only
differs for Gaussians whose alpha saturates at 0.99 at a pixel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.ops.camera_math import CameraParams
from gaussian_splatting_tpu.ops.preprocess import ProjectedGaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_CAP = 0.99
T_EPS = 1e-4


class RenderOutput(NamedTuple):
    color: jnp.ndarray  # (3, H, W)
    invdepth: jnp.ndarray  # (H, W) expected inverse depth
    final_T: jnp.ndarray  # (H, W) remaining transmittance
    n_contrib: jnp.ndarray  # (H, W) int32 count of contributing instances


def depth_order(proj: ProjectedGaussians) -> jnp.ndarray:
    """Global front-to-back order with culled Gaussians pushed to the end."""
    key = jnp.where(proj.valid, proj.depths, jnp.inf)
    return jnp.argsort(key, stable=True)


def render_dense(
    proj: ProjectedGaussians,
    cam: CameraParams,
    bg_color: jnp.ndarray,
    *,
    tile_w: int = 16,
    tile_h: int = 16,
) -> RenderOutput:
    """Blend all Gaussians per pixel, front to back."""
    H, W = cam.height, cam.width
    order = depth_order(proj)

    means2d = proj.means2d[order]
    conics = proj.conics[order]
    colors = proj.colors[order]
    opac = proj.opacities[order]
    depths = proj.depths[order]
    rect_min = proj.rect_min[order]
    rect_max = proj.rect_max[order]
    valid = proj.valid[order]

    px = jnp.arange(W, dtype=jnp.float32)[None, :]  # (1, W)
    py = jnp.arange(H, dtype=jnp.float32)[:, None]  # (H, 1)
    tile_x = (jnp.arange(W, dtype=jnp.int32) // tile_w)[None, :]
    tile_y = (jnp.arange(H, dtype=jnp.int32) // tile_h)[:, None]

    def step(carry, g):
        T, done, C, invd, ncontrib = carry
        xy, con, col, op, z, rmin, rmax, ok = g
        cover = (
            (tile_x >= rmin[0])
            & (tile_x < rmax[0])
            & (tile_y >= rmin[1])
            & (tile_y < rmax[1])
            & ok
        )
        dx = xy[0] - px
        dy = xy[1] - py
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(ALPHA_CAP, op * jnp.exp(power))
        eligible = cover & (power <= 0.0) & (alpha >= ALPHA_MIN)
        test_T = T * (1.0 - alpha)
        trigger = eligible & (test_T < T_EPS) & (~done)
        contrib = eligible & (~done) & (test_T >= T_EPS)
        w = jnp.where(contrib, alpha * T, 0.0)
        C = C + w[None, :, :] * col[:, None, None]
        invd = invd + w / z
        T = jnp.where(contrib, test_T, T)
        done = done | trigger
        ncontrib = ncontrib + contrib.astype(jnp.int32)
        return (T, done, C, invd, ncontrib), None

    init = (
        jnp.ones((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.bool_),
        jnp.zeros((3, H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.int32),
    )
    (T, _done, C, invd, ncontrib), _ = jax.lax.scan(
        step, init, (means2d, conics, colors, opac, depths, rect_min, rect_max, valid)
    )
    color = C + T[None] * bg_color[:, None, None]
    return RenderOutput(color=color, invdepth=invd, final_T=T, n_contrib=ncontrib)
