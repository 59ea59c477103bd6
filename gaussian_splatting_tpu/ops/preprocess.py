"""Per-Gaussian preprocessing: projection, EWA 2D covariance, conics, culling.

This is the JAX equivalent of the reference's ``preprocessCUDA`` kernel
(forward.cu:222-351) — embarrassingly parallel per-Gaussian math that XLA
vectorizes onto the VPU without a hand-written kernel.  Being pure JAX it is
fully differentiable, which replaces the reference's hand-derived (and, in the
checked-in fork, truncated — see SURVEY.md §2.2 N1g) preprocess backward
(backward.cu:153-420) with autodiff.

Semantics matched to the reference:
- frustum cull at view z <= 0.2 (auxiliary.h:164-190),
- perspective divide with +1e-7 on w (forward.cu: p_w),
- EWA Jacobian with the 1.3*tan_fov clamp (forward.cu:95-106),
- +0.3 pixel dilation of the 2D covariance and the antialiasing opacity
  rescale sqrt(det/det_dilated) clamped at 2.5e-5 (forward.cu:286-303),
- radius = ceil(3*sqrt(max eigenvalue)) with the 0.1 discriminant floor
  (forward.cu:305-318),
- NDC->pixel ((v+1)*S-1)/2 (auxiliary.h:43-46),
- tile rect + tiles_touched count (auxiliary.h:49-59, forward.cu:320-350).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.ops.camera_math import CameraParams, ndc_to_pixel
from gaussian_splatting_tpu.ops.sh import sh_to_color
from gaussian_splatting_tpu.ops.transforms import apply_affine, apply_rot, build_covariance


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians ready for binning + blending.

    All arrays are length-P (the Gaussian axis); ``valid`` marks Gaussians
    that survived culling — invalid rows have radius 0 / tiles 0 and never
    enter the instance list.
    """

    means2d: jnp.ndarray  # (P, 2) pixel coordinates
    depths: jnp.ndarray  # (P,) view-space z
    conics: jnp.ndarray  # (P, 3) inverse 2D covariance [a, b, c]
    opacities: jnp.ndarray  # (P,) after antialiasing rescale
    colors: jnp.ndarray  # (P, 3) RGB from SH (clamped at 0)
    radii: jnp.ndarray  # (P,) int32 pixel radius (0 = culled)
    rect_min: jnp.ndarray  # (P, 2) int32 tile coords (x, y)
    rect_max: jnp.ndarray  # (P, 2) int32 exclusive tile coords (x, y)
    tiles_touched: jnp.ndarray  # (P,) int32 EXACT circle-intersecting count
    valid: jnp.ndarray  # (P,) bool
    cut_radius: jnp.ndarray  # (P,) float conservative visibility radius
    span_x0: jnp.ndarray  # (P, MAX_SPAN_ROWS) f32 first tile-x per rect row
    span_cum: jnp.ndarray  # (P, MAX_SPAN_ROWS) f32 cum. cell count thru row
    span_flag: jnp.ndarray  # (P,) bool — span culling applies (rect_h <= 16)


# Per-row span culling handles rects up to this many tile rows; taller rects
# (rare giant footprints) fall back to uncull'd full-rect expansion.
MAX_SPAN_ROWS = 16


def compute_tile_spans(
    mean2d: jnp.ndarray,  # (P, 2) pixel coords
    conic: jnp.ndarray,  # (P, 3) inverse 2D covariance [a, b, c]
    tau: jnp.ndarray,  # (P,) eligibility level 2*ln(255*op) (>= 0)
    r_cut: jnp.ndarray,  # (P,) circle cut radius (pixels), <= 3-sigma
    rx_min: jnp.ndarray,  # (P,) int32 tile coords
    ry_min: jnp.ndarray,
    rx_max: jnp.ndarray,  # exclusive
    ry_max: jnp.ndarray,
    *,
    tile_w: int,
    tile_h: int,
):
    """Exact ELLIPSE-vs-tile intersection spans, one per bounding-rect row.

    The true eligibility set of the blend (alpha >= 1/255, forward.cu:475)
    is the conic ellipse {d : a dx^2 + 2b dx dy + c dy^2 <= tau} — for
    anisotropic Gaussians its area is sqrt(lam2/lam1) of the bounding
    circle's, so span-culling against the ellipse (round 5; the circle was
    rounds 3-4) shrinks every per-instance pipeline stage again while
    leaving the rendered image identical: culled tiles contain no pixel
    the blend's own eligibility test would accept.

    Per tile row the ellipse's x-extent over the row's pixel-center band
    dy in [l, u] is computed EXACTLY from unimodality: x_max(dy) =
    (-b dy + sqrt(a tau - detc dy^2))/a is concave in dy, so its max over
    a band is its value at the clamped unconstrained argmax
    dy* = -b sqrt(tau/(c detc)); symmetrically x_min is convex.  The
    interval is then intersected with the per-row CIRCLE bound from r_cut
    (so the set never grows past rounds 3-4's, whose +-0.3-pixel dilation
    and 3-sigma rect clamp it inherits) and padded by a conservative
    SLACK that dominates every f32 rounding in the chain — over-inclusion
    only adds instances the blend skips, under-inclusion would drop
    contributions, so all rounding is pushed one way.

    Within one tile row the intersecting tiles form a contiguous x-span
    (the ellipse is convex), so the exact per-Gaussian instance count is a
    sum of <= MAX_SPAN_ROWS span widths — computed ONCE here so the expand
    kernel maps slot -> (row, tile) with cumulative-count compares and no
    per-cell test (no sqrt whose rounding could disagree between XLA and
    Mosaic).  Reference semantics anchor: getRect + the per-tile loop of
    duplicateWithKeys (auxiliary.h:49-59, rasterizer_impl.cu:78-126) — the
    reference expands the full rect; the exact cull is an
    output-preserving TPU optimization.

    Returns (span_x0 (P, 16) f32, span_cum (P, 16) f32, tiles (P,) int32,
    is_span (P,) bool).  For ``is_span == False`` rows (tall rects, or
    degenerate non-PD conics) the span table is zero and ``tiles`` is the
    full rect count.
    """
    sg = jax.lax.stop_gradient
    cx = sg(mean2d[:, 0])
    cy = sg(mean2d[:, 1])
    a = sg(conic[:, 0])
    b = sg(conic[:, 1])
    c = sg(conic[:, 2])
    tau = sg(tau)
    r_cut = sg(r_cut)
    rect_w = rx_max - rx_min
    rect_h = ry_max - ry_min
    detc = a * c - b * b
    is_pd = (detc > 0.0) & (a > 0.0) & (c > 0.0)
    is_span = (
        (rect_h <= MAX_SPAN_ROWS) & (rect_h > 0) & (rect_w > 0) & is_pd
    )
    # Conservative slacks: taus absorbs the blend's POWER_EPS eligibility
    # margin plus matmul rounding of the power (ops/blend_pallas), SLACK_PX
    # absorbs the f32 rounding of the interval arithmetic below (relative
    # ~1e-6 on |coords| <= ~4k pixels, so 0.05 px is >> any rounding).
    taus = tau + 1e-3
    SLACK_PX = 0.05
    safe_a = jnp.maximum(a, 1e-30)
    safe_detc = jnp.maximum(detc, 1e-30)
    inv_a = 1.0 / safe_a
    dy_lim = jnp.sqrt(jnp.maximum(taus * a, 0.0) / safe_detc)
    s_shared = jnp.sqrt(
        jnp.maximum(taus, 0.0) / jnp.maximum(c * detc, 1e-30)
    )
    dy_star = -b * s_shared  # argmax of x_max(dy); argmin of x_min is -dy_star

    x0_rows = []
    cum_rows = []
    cum = jnp.zeros_like(cx)
    for r in range(MAX_SPAN_ROWS):
        ty = ry_min + r
        tyf = ty.astype(jnp.float32)
        # pixel-center band of this tile row, relative to the mean
        l = tyf * tile_h - cy
        u = l + (tile_h - 1)
        lo_d = jnp.maximum(l, -dy_lim)
        hi_d = jnp.minimum(u, dy_lim)

        dyc = jnp.clip(dy_star, lo_d, hi_d)
        D = jnp.maximum(taus * a - detc * dyc * dyc, 0.0)
        xmax_e = (-b * dyc + jnp.sqrt(D)) * inv_a
        dyc2 = jnp.clip(-dy_star, lo_d, hi_d)
        D2 = jnp.maximum(taus * a - detc * dyc2 * dyc2, 0.0)
        xmin_e = (-b * dyc2 - jnp.sqrt(D2)) * inv_a

        # intersect with the row's circle bound (nearest point of the band
        # to the mean), keeping the set inside rounds 3-4's circle cull
        dyn = jnp.clip(0.0, l, u)
        rem = r_cut * r_cut - dyn * dyn
        xc = jnp.sqrt(jnp.maximum(rem, 0.0)) + SLACK_PX
        xmax = jnp.minimum(xmax_e + SLACK_PX, xc)
        xmin = jnp.maximum(xmin_e - SLACK_PX, -xc)

        lo = jnp.ceil((cx + xmin - (tile_w - 1)) / tile_w).astype(jnp.int32)
        hi = jnp.floor((cx + xmax) / tile_w).astype(jnp.int32)
        lo = jnp.maximum(lo, rx_min)
        hi = jnp.minimum(hi, rx_max - 1)
        row_ok = (r < rect_h) & (lo_d <= hi_d) & (rem >= 0.0) & (xmin <= xmax)
        span = jnp.where(row_ok, jnp.maximum(hi - lo + 1, 0), 0)
        x0_rows.append(jnp.where(span > 0, lo, 0).astype(jnp.float32))
        cum = cum + span.astype(jnp.float32)
        cum_rows.append(cum)

    span_x0 = jnp.stack(x0_rows, axis=1)
    span_cum = jnp.stack(cum_rows, axis=1)
    # The expand kernel reads spans as packed rows x0 + 4096*cum
    # (ops/expand.PACK_BASE); exactness needs both < 4096.  Footprints that
    # would exceed it (grids wider than ~4k tiles, or >4095 span cells) fall
    # back to exact full-rect expansion.
    is_span = is_span & (cum < 4096.0) & (rx_max.astype(jnp.float32) <= 4096.0)
    rect_tiles = jnp.maximum(rect_w, 0) * jnp.maximum(rect_h, 0)
    tiles = jnp.where(is_span, cum.astype(jnp.int32), rect_tiles)
    span_x0 = jnp.where(is_span[:, None], span_x0, 0.0)
    span_cum = jnp.where(is_span[:, None], span_cum, 0.0)
    return span_x0, span_cum, tiles, is_span


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    cam: CameraParams,
) -> jnp.ndarray:
    """EWA projection of 3D covariance to 2D (forward.cu:89-141).

    Returns (P, 3) packed [cov_xx, cov_xy, cov_yy] BEFORE dilation.
    """
    W = cam.viewmatrix[:3, :3]
    t = apply_affine(cam.viewmatrix, means3d)
    # Rows culled by the z>0.2 frustum test never use this result; clamp z so
    # their garbage stays finite (no NaN leaking through autodiff).
    tz = jnp.maximum(t[:, 2], 0.2)
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    fx, fy = cam.focal_x, cam.focal_y
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J is the 2x3 Jacobian of the perspective projection at the (clamped)
    # view-space point; rows [fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2].
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # M = J @ W: (P, 2, 3)
    M0 = j00[:, None] * W[0] + j02[:, None] * W[2]
    M1 = j11[:, None] * W[1] + j12[:, None] * W[2]

    # cov2d = M Sigma M^T with Sigma the full symmetric 3x3 from packed cov3d.
    xx, xy, xz, yy, yz, zz = (cov3d[:, i] for i in range(6))

    def quad(a, b):
        # a^T Sigma b for row vectors a,b of shape (P, 3)
        sa0 = a[:, 0] * xx + a[:, 1] * xy + a[:, 2] * xz
        sa1 = a[:, 0] * xy + a[:, 1] * yy + a[:, 2] * yz
        sa2 = a[:, 0] * xz + a[:, 1] * yz + a[:, 2] * zz
        return sa0 * b[:, 0] + sa1 * b[:, 1] + sa2 * b[:, 2]

    c_xx = quad(M0, M0)
    c_xy = quad(M0, M1)
    c_yy = quad(M1, M1)
    return jnp.stack([c_xx, c_xy, c_yy], axis=-1)


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    sh: jnp.ndarray,
    cam: CameraParams,
    *,
    sh_degree: int,
    tile_w: int = 16,
    tile_h: int = 16,
    scale_modifier: float = 1.0,
    antialiasing: bool = False,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
) -> ProjectedGaussians:
    """Project P Gaussians to screen space (reference preprocessCUDA).

    ``quats`` must be normalized; ``opacities`` are post-sigmoid; ``sh`` is
    (P, K, 3).  Width/height/tile sizes are static.
    """
    P = means3d.shape[0]
    W, H = cam.width, cam.height
    grid_x = (W + tile_w - 1) // tile_w
    grid_y = (H + tile_h - 1) // tile_h

    # --- frustum cull (auxiliary.h:164-190) ---
    p_view = apply_affine(cam.viewmatrix, means3d)
    depth = p_view[:, 2]
    in_front = depth > 0.2

    # --- projection (forward.cu: transformPoint4x4 + perspective divide) ---
    p_hom = apply_affine(cam.projmatrix, means3d)
    w_hom = (
        means3d[:, 0] * cam.projmatrix[3, 0]
        + means3d[:, 1] * cam.projmatrix[3, 1]
        + means3d[:, 2] * cam.projmatrix[3, 2]
        + cam.projmatrix[3, 3]
    )
    # Culled rows are masked out below; guard w so no inf/NaN leaks into
    # autodiff (for surviving rows w_hom == view z > 0.2, so this is exact).
    w_hom = jnp.where(in_front, w_hom, 1.0)
    p_w = 1.0 / (w_hom + 1e-7)
    ndc_xy = p_hom[:, :2] * p_w[:, None]
    mean2d = jnp.stack(
        [ndc_to_pixel(ndc_xy[:, 0], W), ndc_to_pixel(ndc_xy[:, 1], H)], axis=-1
    )

    # --- covariances ---
    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = build_covariance(scales, quats, scale_modifier)
    cov2d = compute_cov2d(means3d, cov3d, cam)

    # --- dilation + antialiasing rescale (forward.cu:286-303) ---
    h_var = 0.3
    det_orig = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    cxx = cov2d[:, 0] + h_var
    cyy = cov2d[:, 2] + h_var
    cxy = cov2d[:, 1]
    det = cxx * cyy - cxy * cxy
    if antialiasing:
        aa_scale = jnp.sqrt(jnp.maximum(0.000025, det_orig / det))
    else:
        aa_scale = jnp.ones_like(det)

    det_ok = det != 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / safe_det
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], axis=-1)

    # --- radius from eigenvalues (forward.cu:305-318) ---
    mid = 0.5 * (cxx + cyy)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # --- opacity-aware cut radius (output-preserving instance culling) ---
    # alpha = op * exp(-0.5 d^T Sigma^-1 d) <= op * exp(-|d|^2 / (2 lam1)), so
    # every pixel farther than r_cut = sqrt(2 lam1 ln(255 op)) from the center
    # is guaranteed below the blend's 1/255 eligibility floor
    # (forward.cu:475) and can never contribute.  Shrinking the tile rect to
    # min(3 sigma, r_cut) therefore leaves the rendered image bit-identical
    # while skipping instances of low-opacity Gaussians entirely (op < 1/255
    # emits no instances at all — including dead capacity slots).
    op_for_cut = opacities * aa_scale
    log_term = 2.0 * jnp.log(jnp.maximum(255.0 * op_for_cut, 1.0))
    r_cut = jnp.minimum(jnp.sqrt(lam1 * log_term), radius_f)
    # Per-axis ELLIPSE extents (round 5): the eligibility ellipse
    # {d^T Conic d <= tau} has x-extent sqrt(tau * Cov_xx) and y-extent
    # sqrt(tau * Cov_yy) (the marginal variances of the DILATED covariance),
    # each <= the circle's sqrt(tau * lam1) — so the bounding rect shrinks
    # per-axis for anisotropic Gaussians.  Clamped by r_cut (which carries
    # the reference's 3-sigma rect bound).  Non-PD degenerates (det <= 0,
    # impossible for real EWA + dilation but guarded) keep the circle rect.
    # taus/+0.1 mirror compute_tile_spans' slacks so the rect always covers
    # the slack-padded span intervals (rect clamping must never trim a tile
    # the span test accepts).
    taus = log_term + 1e-3
    ell_x = jnp.sqrt(jnp.maximum(taus * cxx, 0.0)) + 0.1
    ell_y = jnp.sqrt(jnp.maximum(taus * cyy, 0.0)) + 0.1
    is_pd = det > 0.0
    rect_rx = jnp.ceil(jnp.where(is_pd, jnp.minimum(ell_x, r_cut), r_cut))
    rect_ry = jnp.ceil(jnp.where(is_pd, jnp.minimum(ell_y, r_cut), r_cut))

    # --- tile rect (semantics anchor auxiliary.h:49-59).  The exclusive max
    # is floor((c + R)/tile) + 1: the farthest possibly-eligible pixel sits
    # at c + R, so its tile is always included.  (The reference's
    # (c + R + tile - 1)/tile form needs R >= extent + 1 px to guarantee
    # that — true for its 3-sigma integer radius, not for our tight
    # ellipse extents.) ---
    rx_min = jnp.clip(((mean2d[:, 0] - rect_rx) / tile_w).astype(jnp.int32), 0, grid_x)
    ry_min = jnp.clip(((mean2d[:, 1] - rect_ry) / tile_h).astype(jnp.int32), 0, grid_y)
    rx_max = jnp.clip(
        jnp.floor((mean2d[:, 0] + rect_rx) / tile_w).astype(jnp.int32) + 1,
        0, grid_x,
    )
    ry_max = jnp.clip(
        jnp.floor((mean2d[:, 1] + rect_ry) / tile_h).astype(jnp.int32) + 1,
        0, grid_y,
    )
    # EXACT instance counts: per rect row, the ellipse-intersecting tiles
    # form a contiguous span; cells of the bounding rect with no eligible
    # pixel never enter the instance pipeline at all.
    span_x0, span_cum, tiles, span_flag = compute_tile_spans(
        mean2d, conic, log_term, r_cut, rx_min, ry_min, rx_max, ry_max,
        tile_w=tile_w, tile_h=tile_h,
    )
    tiles = jnp.where(op_for_cut * 255.0 > 1.0, tiles, 0)

    valid = in_front & det_ok & (tiles > 0)
    tiles = jnp.where(valid, tiles, 0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # --- color ---
    if colors_precomp is not None:
        colors = colors_precomp
    else:
        colors = sh_to_color(sh_degree, sh, means3d, cam.campos)

    opac = opacities * aa_scale

    return ProjectedGaussians(
        means2d=mean2d,
        depths=depth,
        conics=conic,
        opacities=opac,
        colors=colors,
        radii=radius,
        rect_min=jnp.stack([rx_min, ry_min], axis=-1),
        rect_max=jnp.stack([rx_max, ry_max], axis=-1),
        tiles_touched=tiles,
        valid=valid,
        cut_radius=r_cut,
        span_x0=span_x0,
        span_cum=span_cum,
        span_flag=span_flag,
    )
