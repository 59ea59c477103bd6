"""Differentiable rasterization: the public render op.

Pipeline (reference call stack: gaussian_renderer/__init__.py:19-157 ->
rasterize_points.cu -> rasterizer_impl.cu::forward):

  preprocess (pure JAX, autodiff)          forward.cu:222-351
  binning    (non-diff bookkeeping)        rasterizer_impl.cu:309-350
  gather     (instance records, autodiff)  duplicateWithKeys analogue
  blend      (Pallas custom_vjp | oracle)  forward.cu:367-513 / backward.cu

Only the blend is a hand-written kernel; every other gradient (projection,
EWA covariance chain, SH, antialiasing opacity rescale, inverse-depth) comes
from autodiff — which also sidesteps the reference fork's truncated
cov2D backward (SURVEY.md §2.2 N1g).

The densification "screen-space gradient tap" mirrors the reference's
``screenspace_points`` trick (gaussian_renderer/__init__.py:42-46): pass a
zeros (P, 2) array as ``means2d_tap`` and read its gradient — it is scaled by
(0.5*W, 0.5*H), i.e. NDC units, matching backward.cu:509-510 so the
``densify_grad_threshold`` keeps its reference meaning.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.config import RasterizeConfig
from gaussian_splatting_tpu.ops import blend_pallas as bp
from gaussian_splatting_tpu.ops import instances as inst
from gaussian_splatting_tpu.ops.camera_math import CameraParams
from gaussian_splatting_tpu.ops.oracle import render_dense
from gaussian_splatting_tpu.ops.preprocess import ProjectedGaussians, preprocess


def mark_visible(means3d: jnp.ndarray, viewmatrix: jnp.ndarray) -> jnp.ndarray:
    """Frustum-visibility mask (reference ``GaussianRasterizer.markVisible``,
    rasterize_points.cu:250-274: present = view-space z > 0.2)."""
    from gaussian_splatting_tpu.ops.transforms import apply_affine

    return apply_affine(viewmatrix, means3d)[:, 2] > 0.2


class RenderResult(NamedTuple):
    image: jnp.ndarray  # (3, H, W) with background composited
    invdepth: jnp.ndarray  # (H, W)
    final_T: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (P,) int32
    visibility: jnp.ndarray  # (P,) bool
    overflow: jnp.ndarray  # () bool — instance buffer overflowed
    num_instances: jnp.ndarray  # () int32


def _float0_zeros(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.lru_cache(maxsize=64)
def _make_render_core(grid_x, grid_y, tile_w, tile_h, chunk, capacity, interpret):
    """Round-2 fused rasterize core (custom_vjp spanning the whole
    instance pipeline + blend kernels).

    Forward: ops/instances.build_instances (Pallas expand -> packed payload
    sort; the blend reads the sorted compact stream directly) + the Pallas
    blend.
    Backward: blend backward kernel -> per-instance grads reordered to
    expansion order -> sequential segmented scan -> per-Gaussian field grads
    (the atomicAdd-free replacement of backward.cu:592-609).
    """
    kw = dict(
        grid_x=grid_x, grid_y=grid_y, tile_w=tile_w, tile_h=tile_h,
        chunk=chunk, interpret=interpret,
    )
    # Asymmetric lane-chunks: the forward is per-chunk-fixed-cost bound
    # (bigger chunks pay, tools/micro_blend_floor.py) while the backward's
    # per-lane gradient math dominates (bigger chunks LOSE — measured
    # 29.8 -> 30.8 ms at 256).  Both read the compact stream through
    # 128-aligned window DMAs, so the chunk sizes are independent.
    kw_bwd = dict(kw, chunk=min(chunk, 128))

    def _forward(diff_fields, proj_sg, grad_layout):
        layout = inst.build_instances(
            proj_sg,
            diff_fields,
            grid_x=grid_x,
            grid_y=grid_y,
            capacity=capacity,
            tile_w=tile_w,
            tile_h=tile_h,
            grad_layout=grad_layout,
            interpret=interpret,
        )
        packed = bp.blend_forward_pallas(
            layout.meta_sorted, layout.tile_starts, layout.tile_ends, **kw
        )
        return packed, layout

    # The core outputs only the OUT_COLS columns the render consumes
    # (RGB, T, invdepth); the full packed block — including the internal
    # n_contrib/done columns the backward replay needs — is saved as a VJP
    # residual.  This keeps the untile transpose AND the incoming cotangent
    # at 5/8 of the bytes with no zero-pad op (see bp.CT_COLS).

    @jax.custom_vjp
    def core(diff_fields, proj_sg):
        packed, layout = _forward(diff_fields, proj_sg, True)
        return packed[:, :, : bp.CT_COLS], (layout.overflow, layout.num_instances)

    def core_fwd(diff_fields, proj_sg):
        packed, layout = _forward(diff_fields, proj_sg, True)
        res = (
            layout.meta_sorted,
            layout.tile_starts,
            layout.tile_ends,
            layout.n_valid,
            layout.sorted_src,
            layout.g_exp,
            packed,
            jax.tree_util.tree_map(_float0_zeros, proj_sg),
        )
        out = packed[:, :, : bp.CT_COLS]
        return (out, (layout.overflow, layout.num_instances)), res

    def core_bwd(res, ct):
        from gaussian_splatting_tpu.ops.segreduce import segment_reduce_rows

        (meta, starts, ends, n_valid, sorted_src, g_exp,
         packed, proj_zeros) = res
        num_gaussians = proj_zeros.opacities.shape[0]
        cap_int = sorted_src.shape[0]  # internal pipeline size (>= capacity)
        ct_packed, _ = ct  # aux outputs (overflow, count) carry float0 cts
        # per-instance grads in COMPACT sorted order (staging-stream kernel)
        dmeta = bp.blend_backward_compact_pallas(
            meta, starts, ends, packed, ct_packed,
            capacity=cap_int, **kw_bwd
        )
        # compact order -> expansion order rides a payload sort (the random
        # lane gather this replaces measured ~35 ms/iter at bench scale).
        # SELECT the valid stream first: slots past n_valid (sentinels,
        # circle-culled instances, overflow) are uninitialized HBM, and
        # NaN * 0 == NaN would leak into real gradients.
        iota = jnp.arange(cap_int, dtype=jnp.int32)
        valid = iota < n_valid
        rows = tuple(
            jnp.where(valid, dmeta[i, :cap_int], 0.0) for i in range(10)
        )
        # Pairs of gradient rows ride ONE complex64 payload operand (carried,
        # never compared — bit-exact; see the main sort in instances.py).
        packed5 = tuple(
            jax.lax.complex(rows[2 * i], rows[2 * i + 1]) for i in range(5)
        )
        # keys are a PERMUTATION (every slot index appears exactly once), so
        # an unstable sort is bit-identical to a stable one — and XLA skips
        # the internal iota tiebreak operand stable sorts carry.
        sorted_out = jax.lax.sort(
            (sorted_src,) + packed5, num_keys=1, is_stable=False
        )
        flat = []
        for c in sorted_out[1:]:
            flat.append(jnp.real(c))
            flat.append(jnp.imag(c))
        # 16 rows (10 real + 6 zero): Mosaic only DMAs 8/16-row HBM blocks.
        e = jnp.concatenate(
            [
                jnp.stack(flat, axis=0),
                jnp.zeros((bp.NUM_FIELDS - 10, cap_int), jnp.float32),
            ],
            axis=0,
        )
        # Streaming MXU segment reduce straight to per-Gaussian field-major
        # sums (round 3: replaces the sequential segmented cumsum + the
        # per-Gaussian segment-end gather).  Exact zeros for zero-grad
        # Gaussians (Adam turns gradient dust into full-size steps).
        d16 = segment_reduce_rows(e, g_exp, num_gaussians, interpret=interpret)
        d_fields = d16[:10, :num_gaussians]  # (10, P)
        return d_fields, proj_zeros

    core.defvjp(core_fwd, core_bwd)

    def core_inference(diff_fields, proj_sg):
        packed, layout = _forward(diff_fields, proj_sg, False)
        return packed[:, :, : bp.CT_COLS], (layout.overflow, layout.num_instances)

    return core, core_inference


def _untile(
    packed: jnp.ndarray,
    grid_x: int,
    grid_y: int,
    tile_w: int,
    tile_h: int,
    W: int,
    H: int,
    interpret: bool = False,
):
    """(num_tiles, PIX, OUT_COLS) -> per-pixel images cropped to (H, W).

    Rides the Pallas untile kernel (custom_vjp: the cotangent retiles via
    the mirror kernel) — XLA's transpose for this pattern costs ~2.1 ms per
    direction at bench scale vs ~0.2 ms in-kernel (tools/micro_untile.py)."""
    from gaussian_splatting_tpu.ops.untile import pick_t_per, untile_pallas

    t_per = pick_t_per(grid_x, tile_w)
    img = untile_pallas(packed, grid_x, grid_y, tile_w, tile_h, t_per, interpret)
    return img[:, :H, :W]


def render(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    sh: jnp.ndarray,
    cam: CameraParams,
    bg_color: jnp.ndarray,
    *,
    sh_degree: int,
    cfg: RasterizeConfig = RasterizeConfig(),
    means2d_tap: Optional[jnp.ndarray] = None,
    capacity: Optional[int] = None,
    scale_modifier: float = 1.0,
    impl: Optional[str] = None,
    inference: bool = False,
) -> RenderResult:
    """Render P Gaussians to an image (reference ``render()``,
    gaussian_renderer/__init__.py:19-157, minus exposure — applied by callers).
    """
    P = means3d.shape[0]
    W, H = cam.width, cam.height
    tile_w, tile_h = cfg.tile_w, cfg.tile_h
    grid_x = (W + tile_w - 1) // tile_w
    grid_y = (H + tile_h - 1) // tile_h

    impl = impl or cfg.impl
    if impl == "auto":
        impl = "pallas"

    # Debug fallbacks (reference gaussian_renderer/__init__.py:86-111): when
    # requested, compute colors/cov3D up front and route them through the
    # precomp hooks — exercises the same code path the reference's
    # --convert_SHs_python/--compute_cov3D_python flags do.
    cov3d_precomp = None
    colors_precomp = None
    if cfg.compute_cov3D_python:
        from gaussian_splatting_tpu.ops.preprocess import build_covariance

        cov3d_precomp = build_covariance(scales, quats, scale_modifier)
    if cfg.convert_SHs_python:
        from gaussian_splatting_tpu.ops.preprocess import sh_to_color

        colors_precomp = sh_to_color(sh_degree, sh, means3d, cam.campos)

    proj = preprocess(
        means3d,
        scales,
        quats,
        opacities,
        sh,
        cam,
        sh_degree=sh_degree,
        tile_w=tile_w,
        tile_h=tile_h,
        scale_modifier=scale_modifier,
        antialiasing=cfg.antialiasing,
        cov3d_precomp=cov3d_precomp,
        colors_precomp=colors_precomp,
    )
    if means2d_tap is not None:
        # NDC-scaled gradient tap (see module docstring).
        ndc_scale = jnp.array([0.5 * W, 0.5 * H], jnp.float32)
        proj = proj._replace(means2d=proj.means2d + means2d_tap * ndc_scale)

    if impl == "dense":
        out = render_dense(proj, cam, bg_color, tile_w=tile_w, tile_h=tile_h)
        return RenderResult(
            image=jnp.clip(out.color, 0.0, 1.0),
            invdepth=out.invdepth,
            final_T=out.final_T,
            radii=proj.radii,
            visibility=proj.radii > 0,
            overflow=jnp.asarray(False),
            num_instances=jnp.sum(proj.tiles_touched),
        )

    if impl != "pallas":
        raise ValueError(f"unknown rasterizer impl: {impl}")

    if capacity is None:
        capacity = inst.required_capacity(P, cfg.instance_slack)
    else:
        capacity = -(-capacity // cfg.chunk) * cfg.chunk

    proj_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, proj)
    safe_depth = jnp.where(proj.valid, proj.depths, 1.0)
    diff_fields = jnp.stack(
        [
            proj.means2d[:, 0],
            proj.means2d[:, 1],
            proj.conics[:, 0],
            proj.conics[:, 1],
            proj.conics[:, 2],
            proj.opacities,
            proj.colors[:, 0],
            proj.colors[:, 1],
            proj.colors[:, 2],
            1.0 / safe_depth,
        ],
        axis=0,
    )  # (10, P) — everything the blend differentiates through

    interpret = jax.default_backend() != "tpu"
    core, core_inference = _make_render_core(
        grid_x, grid_y, tile_w, tile_h, cfg.chunk, capacity, interpret
    )
    fn = core_inference if inference else core
    packed, (overflow, num_instances) = fn(diff_fields, proj_sg)

    img = _untile(packed, grid_x, grid_y, tile_w, tile_h, W, H, interpret)
    c_nobg = img[bp.O_R : bp.O_B + 1]
    T_img = img[bp.O_T]
    invd = img[bp.O_INVD]
    color = c_nobg + T_img[None] * bg_color[:, None, None]

    return RenderResult(
        image=jnp.clip(color, 0.0, 1.0),
        invdepth=invd,
        final_T=T_img,
        radii=proj.radii,
        visibility=proj.radii > 0,
        overflow=overflow,
        num_instances=num_instances,
    )
