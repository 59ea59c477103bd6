"""Gaussian-sharded + tile-sharded rendering and training (SURVEY.md §7 B).

The Gaussian axis is sharded over the mesh; the image is sharded into
horizontal stripes of tile rows.  Round-2 exchange: instead of all-gathering
every projected Gaussian to every device (round 1, P x 56 B per device),
each device packs the 64-byte records of ONLY the Gaussians that overlap
each destination stripe and swaps them with a single ``all_to_all`` over
ICI.  Most Gaussians overlap one stripe, so the per-device exchange volume
is ~P/n x 64 B x (1 + boundary crossers) — an ~n/2x traffic reduction that
grows with the mesh.

Alpha compositing is order-dependent; sharding by *tiles* keeps each
pixel's full blend list on one device, so no cross-device composition is
ever needed (redistribute-then-sort, SURVEY.md §7).

``gshard_train_step`` is the full sharded analogue of train.step.train_step:
per-shard preprocessing and densification stats, exchange + stripe blending,
a STRIPE-LOCAL loss (L1/SSIM partial sums psum'd across the mesh; SSIM's
11x11 window sees cross-stripe content through a 5-row ppermute halo of the
predicted image — exact parity with the single-device step), and a SHARDED
Adam update — the optimizer state never leaves the Gaussian's owner device.

The backward needs no hand-written communication: autodiff through
``all_to_all`` emits the reverse exchange and through ``ppermute`` the
reverse halo (XLA inserts the collectives).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gaussian_splatting_tpu.config import OptimizationConfig, RasterizeConfig
from gaussian_splatting_tpu.models.densify import add_densification_stats
from gaussian_splatting_tpu.ops import blend_pallas as bp
from gaussian_splatting_tpu.ops.camera_math import CameraParams
from gaussian_splatting_tpu.ops.expand import BIG
from gaussian_splatting_tpu.ops.losses import fused_ssim_weighted_sum
from gaussian_splatting_tpu.ops.preprocess import (
    ProjectedGaussians,
    compute_tile_spans,
    preprocess,
)
from gaussian_splatting_tpu.ops.rasterize import _make_render_core, _untile
from gaussian_splatting_tpu.train.optim import (
    adam_update,
    exposure_lr,
    group_lrs,
)
from gaussian_splatting_tpu.utils.schedules import expon_lr
from gaussian_splatting_tpu.train.step import (
    StepBatch,
    TrainState,
    apply_exposure,
)

# Exchange record layout: 10 differentiable blend fields (matching the
# render core's diff_fields rows) + 6 stop-gradient geometry fields.
R_DEPTH, R_RX0, R_RY0, R_RX1, R_RY1, R_CUTR = range(10, 16)
REC_COLS = 16


def _pack_records(proj: ProjectedGaussians) -> jnp.ndarray:
    """(P_loc, 16) exchange records; cols 0-9 carry gradients."""
    sg = jax.lax.stop_gradient
    safe_depth = jnp.where(proj.valid, proj.depths, 1.0)
    return jnp.stack(
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
            sg(jnp.where(proj.valid & (proj.tiles_touched > 0), proj.depths, BIG)),
            sg(proj.rect_min[:, 0].astype(jnp.float32)),
            sg(proj.rect_min[:, 1].astype(jnp.float32)),
            sg(proj.rect_max[:, 0].astype(jnp.float32)),
            sg(proj.rect_max[:, 1].astype(jnp.float32)),
            sg(proj.cut_radius),
        ],
        axis=1,
    )


def _exchange_records(rec, proj, *, n, grid_y_local, cap_x):
    """Pack per-destination-stripe buffers and swap them with all_to_all.

    Returns (flat (n*cap_x, 16) records for THIS device's stripe,
    overflow flag).  Pad rows carry depth == BIG.
    """
    P_loc = rec.shape[0]
    touched = proj.valid & (proj.tiles_touched > 0)
    ry0 = proj.rect_min[:, 1]
    ry1 = proj.rect_max[:, 1]
    s0 = jnp.clip(ry0 // grid_y_local, 0, n - 1)
    s1 = jnp.clip((ry1 - 1) // grid_y_local, 0, n - 1) + 1
    s1 = jnp.where(touched, s1, s0)  # untouched: sent nowhere

    iota = jnp.arange(P_loc, dtype=jnp.int32)
    sends = []
    counts = []
    for e in range(n):
        mask = touched & (s0 <= e) & (e < s1)
        key = jnp.where(mask, 0, 1).astype(jnp.int32)
        _, order = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
        idx = order[: cap_x]
        rows = rec[idx]
        ok = mask[idx]
        rows = jnp.where(
            (jnp.arange(REC_COLS) == R_DEPTH)[None, :] & (~ok)[:, None],
            BIG,
            rows,
        )
        sends.append(rows)
        counts.append(jnp.sum(mask))
    send = jnp.stack(sends)  # (n, cap_x, 16)
    overflow = jnp.max(jnp.stack(counts)) > cap_x

    recv = jax.lax.all_to_all(
        send, "data", split_axis=0, concat_axis=0, tiled=True
    )
    return recv.reshape(n * cap_x, REC_COLS), overflow


def _stripe_from_records(flat, *, d, n, grid_x, grid_y_local, tile_w, tile_h,
                         capacity_dev, cfg, bg_color, interpret,
                         inference=False):
    """Blend THIS device's stripe from received records.

    Returns the packed stripe image rows (OUT_COLS planes) plus
    (overflow, num_instances)."""
    y0_tiles = d * grid_y_local
    depths = flat[:, R_DEPTH]
    valid = depths < BIG
    ry0 = jnp.clip(flat[:, R_RY0].astype(jnp.int32) - y0_tiles, 0, grid_y_local)
    ry1 = jnp.clip(flat[:, R_RY1].astype(jnp.int32) - y0_tiles, 0, grid_y_local)
    rx0 = flat[:, R_RX0].astype(jnp.int32)
    rx1 = flat[:, R_RX1].astype(jnp.int32)

    y_shift = jnp.float32(y0_tiles * tile_h)
    diff_fields = jnp.concatenate(
        [
            flat[:, 0:1].T,
            flat[:, 1:2].T - y_shift,
            flat[:, 2:10].T,
        ],
        axis=0,
    )  # (10, n*cap_x), differentiable back through the all_to_all

    Pn = flat.shape[0]
    mean2d_local = jnp.stack([flat[:, 0], flat[:, 1] - y_shift], axis=1)
    # Exact-cull spans on the STRIPE-CLIPPED rect: the y shift is a tile
    # multiple (exact f32 subtraction for on-screen coords), so the span set
    # is bitwise the stripe's slice of the single-device span set.  tau is
    # recomputed from the received (post-aa) opacity with the exact formula
    # preprocess used — same input bits, same elementwise ops, same result.
    conic_rec = jax.lax.stop_gradient(flat[:, 2:5])
    tau_rec = 2.0 * jnp.log(
        jnp.maximum(255.0 * jax.lax.stop_gradient(flat[:, 5]), 1.0)
    )
    span_x0, span_cum, tiles, span_flag = compute_tile_spans(
        mean2d_local, conic_rec, tau_rec, flat[:, R_CUTR], rx0, ry0, rx1, ry1,
        tile_w=tile_w, tile_h=tile_h,
    )
    tiles = jnp.where(valid, tiles, 0)
    pseudo = ProjectedGaussians(
        means2d=mean2d_local,
        depths=depths,
        conics=jnp.zeros((Pn, 3), jnp.float32),
        opacities=jnp.zeros((Pn,), jnp.float32),
        colors=jnp.zeros((Pn, 3), jnp.float32),
        radii=jnp.zeros((Pn,), jnp.int32),
        rect_min=jnp.stack([rx0, ry0], axis=1),
        rect_max=jnp.stack([rx1, ry1], axis=1),
        tiles_touched=tiles.astype(jnp.int32),
        valid=valid,
        cut_radius=flat[:, R_CUTR],
        span_x0=span_x0,
        span_cum=span_cum,
        span_flag=span_flag,
    )
    pseudo = jax.tree_util.tree_map(jax.lax.stop_gradient, pseudo)

    core, core_inference = _make_render_core(
        grid_x, grid_y_local, tile_w, tile_h, cfg.chunk, capacity_dev,
        interpret,
    )
    fn = core_inference if inference else core
    packed, (ovf, ninst) = fn(diff_fields, pseudo)
    img = _untile(
        packed, grid_x, grid_y_local, tile_w, tile_h,
        grid_x * tile_w, grid_y_local * tile_h, interpret,
    )
    c_nobg = img[bp.O_R : bp.O_B + 1]
    T_img = img[bp.O_T]
    invd = img[bp.O_INVD]
    color = c_nobg + T_img[None] * bg_color[:, None, None]
    return color, invd, ovf, ninst


def _geometry(cam, cfg, n):
    tile_w, tile_h = cfg.tile_w, cfg.tile_h
    grid_x = (cam.width + tile_w - 1) // tile_w
    grid_y_total = -(-cam.height // tile_h)
    grid_y_total = -(-grid_y_total // n) * n
    return tile_w, tile_h, grid_x, grid_y_total // n


def _capacities(P_total, n, cfg, cap_x, capacity_per_device):
    if cap_x <= 0:
        cap_x = max(256, 2 * P_total // (n * n) + 128)
    cap_x = min(cap_x, P_total // n)  # cannot send more than the local shard
    if capacity_per_device <= 0:
        capacity_per_device = int(cfg.instance_slack * P_total) // n + n * cap_x + 1024
    capacity_per_device = -(-capacity_per_device // cfg.chunk) * cfg.chunk
    return cap_x, capacity_per_device


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
    exchange_capacity: int = 0,
    return_overflow: bool = False,
) -> jnp.ndarray:
    """Distributed render; returns the assembled (3, H, W) image.

    With ``return_overflow=True`` also returns a () bool that is True when
    either the per-destination exchange buffer (cap_x) or a stripe's
    instance capacity overflowed — i.e. the render silently dropped
    Gaussians/instances and the caller should grow capacities and retry
    (the distributed analogue of RenderResult.overflow).
    """
    n = mesh.devices.size
    tile_w, tile_h, grid_x, grid_y_local = _geometry(cam, cfg, n)
    W, H = cam.width, cam.height
    P_total = means3d.shape[0]
    cap_x, capacity_dev = _capacities(
        P_total, n, cfg, exchange_capacity, capacity_per_device
    )
    interpret = jax.default_backend() != "tpu"

    def body(m, s, q, o, shs):
        proj = preprocess(
            m, s, q, o, shs, cam,
            sh_degree=sh_degree, tile_w=tile_w, tile_h=tile_h,
            antialiasing=cfg.antialiasing,
        )
        rec = _pack_records(proj)
        flat, xovf = _exchange_records(
            rec, proj, n=n, grid_y_local=grid_y_local, cap_x=cap_x
        )
        d = jax.lax.axis_index("data")
        color, _invd, ovf, _ni = _stripe_from_records(
            flat, d=d, n=n, grid_x=grid_x, grid_y_local=grid_y_local,
            tile_w=tile_w, tile_h=tile_h, capacity_dev=capacity_dev,
            cfg=cfg, bg_color=bg_color, interpret=interpret,
        )
        any_ovf = jax.lax.pmax((ovf | xovf).astype(jnp.int32), "data") > 0
        return color, any_ovf

    out, overflow = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P(None, "data", None), P()),
        check_vma=False,
    )(means3d, scales, quats, opacities, sh)
    image = jnp.clip(out[:, :H, :W], 0.0, 1.0)
    if return_overflow:
        return image, overflow
    return image


def gshard_train_step(
    state: TrainState,
    cam: CameraParams,
    batch: StepBatch,
    mesh: Mesh,
    *,
    opt: OptimizationConfig,
    raster: RasterizeConfig,
    use_exposure: bool = False,
    use_depth: bool = False,
    exchange_capacity: int = 0,
    capacity_per_device: int = 0,
) -> Tuple[TrainState, dict]:
    """Full sharded training step (train.step.train_step parity).

    TrainState per-Gaussian arrays must be sharded over ``mesh`` axis
    'data' on their capacity axis (capacity divisible by the mesh size);
    exposures/step stay replicated.  The loss is stripe-local (psum'd
    partial sums + a 5-row SSIM halo exchange) and matches the
    single-device step exactly; Adam runs shard-local.
    """
    model = state.model
    step = state.step + 1
    n = mesh.devices.size
    tile_w, tile_h, grid_x, grid_y_local = _geometry(cam, raster, n)
    W, H = cam.width, cam.height
    P_total = model.capacity
    cap_x, capacity_dev = _capacities(
        P_total, n, raster, exchange_capacity, capacity_per_device
    )
    interpret = jax.default_backend() != "tpu"
    sh_degree = model.max_sh_degree

    def body(params, alive, exposures, sh_deg):
        def loss_fn(p, exposures, tap):
            sh = jnp.concatenate([p.features_dc, p.features_rest], axis=1)
            K = sh.shape[1]
            degs = jnp.floor(
                jnp.sqrt(jnp.arange(K, dtype=jnp.float32))
            ).astype(jnp.int32)
            sh = jnp.where((degs <= sh_deg)[None, :, None], sh, 0.0)
            proj = preprocess(
                p.means3d,
                jnp.exp(p.scales),
                p.quats / jnp.linalg.norm(p.quats, axis=-1, keepdims=True),
                jax.nn.sigmoid(p.opacities) * alive,
                sh,
                cam,
                sh_degree=sh_degree,
                tile_w=tile_w,
                tile_h=tile_h,
                antialiasing=raster.antialiasing,
            )
            # densification gradient tap in NDC units (rasterize.render)
            ndc_scale = jnp.array([0.5 * W, 0.5 * H], jnp.float32)
            proj = proj._replace(means2d=proj.means2d + tap * ndc_scale)
            rec = _pack_records(proj)
            flat, xovf = _exchange_records(
                rec, proj, n=n, grid_y_local=grid_y_local, cap_x=cap_x
            )
            d = jax.lax.axis_index("data")
            color, invd, ovf, ninst = _stripe_from_records(
                flat, d=d, n=n, grid_x=grid_x, grid_y_local=grid_y_local,
                tile_w=tile_w, tile_h=tile_h, capacity_dev=capacity_dev,
                cfg=raster, bg_color=batch.bg_color, interpret=interpret,
            )
            # ---- STRIPE-LOCAL loss (round 3): instead of all-gathering the
            # image and computing a replicated loss n times, each device
            # computes L1/SSIM partial sums over its own Sh pixel rows and
            # the scalars are psum'd.  SSIM's 11x11 window needs only a
            # 5-row halo of the *predicted* image from each stripe neighbor
            # (ppermute); gt/masks are replicated so their halos are static
            # slices.  Per-device loss FLOPs drop from full-image to ~1/n,
            # and parity with the single-device step is exact: pixel rows
            # past H and the mesh-edge halos are zero, which is precisely
            # the blur's zero-padding (ops/losses.py SAME-conv semantics).
            Sh = grid_y_local * tile_h
            Hpad = n * Sh
            y0 = d * Sh
            img_s = jnp.clip(color[:, :, :W], 0.0, 1.0)
            if use_exposure:
                img_s = apply_exposure(img_s, exposures[batch.exposure_idx])
            # alpha mask rows for this stripe; rows >= H become zero via the
            # bottom padding so they contribute |0-0| = 0 to L1 below
            mask_pad = jnp.pad(
                jnp.broadcast_to(batch.alpha_mask, (1, H, W)).astype(
                    jnp.float32
                ),
                ((0, 0), (0, Hpad - H), (0, 0)),
            )
            mask_s = jax.lax.dynamic_slice(mask_pad, (0, y0, 0), (1, Sh, W))
            img_s = img_s * mask_s
            gt_full = batch.gt_image * batch.alpha_mask
            gt_pad = jnp.pad(gt_full, ((0, 0), (5, Hpad - H + 5), (0, 0)))
            gt_ext = jax.lax.dynamic_slice(
                gt_pad, (0, y0, 0), (3, Sh + 10, W)
            )
            gt_s = gt_ext[:, 5:-5]
            # predicted-image halo: bottom 5 rows ride down the mesh, top 5
            # rows ride up; edge devices receive ppermute's zero fill (the
            # image boundary's conv zero-padding)
            from_up = jax.lax.ppermute(
                img_s[:, -5:], "data", [(i, i + 1) for i in range(n - 1)]
            )
            from_down = jax.lax.ppermute(
                img_s[:, :5], "data", [(i + 1, i) for i in range(n - 1)]
            )
            pred_ext = jnp.concatenate([from_up, img_s, from_down], axis=1)
            # weight selects THIS stripe's real image rows and carries the
            # full-image mean denominator (3 channels summed per pixel)
            rows_valid = (y0 + jnp.arange(Sh)) < H
            weight = jnp.pad(
                rows_valid.astype(jnp.float32), (5, 5)
            )[:, None] * jnp.ones((1, W), jnp.float32) / (3.0 * H * W)
            ssim_val = jax.lax.psum(
                fused_ssim_weighted_sum(pred_ext, gt_ext, weight), "data"
            )
            l1v = (
                jax.lax.psum(jnp.sum(jnp.abs(img_s - gt_s)), "data")
                / (3.0 * H * W)
            )
            loss = (
                (1.0 - opt.lambda_dssim) * l1v
                + opt.lambda_dssim * (1.0 - ssim_val)
            )
            depth_loss = jnp.float32(0.0)
            if use_depth:
                w_ = expon_lr(
                    step,
                    lr_init=opt.depth_l1_weight_init,
                    lr_final=opt.depth_l1_weight_final,
                    max_steps=opt.iterations,
                )
                dmask_pad = jnp.pad(
                    jnp.broadcast_to(
                        batch.depth_mask, (H, W)
                    ).astype(jnp.float32),
                    ((0, Hpad - H), (0, 0)),
                )
                dgt_pad = jnp.pad(
                    jnp.broadcast_to(batch.invdepth_gt, (H, W)),
                    ((0, Hpad - H), (0, 0)),
                )
                dmask_s = jax.lax.dynamic_slice(dmask_pad, (y0, 0), (Sh, W))
                dgt_s = jax.lax.dynamic_slice(dgt_pad, (y0, 0), (Sh, W))
                depth_loss = w_ * (
                    jax.lax.psum(
                        jnp.sum(
                            jnp.abs(invd[:, :W] - dgt_s) * dmask_s
                            * rows_valid[:, None]
                        ),
                        "data",
                    )
                    / (H * W)
                )
                loss = loss + depth_loss
            aux_out = {
                "radii": proj.radii,
                "overflow": ovf | xovf,
                "num_instances": jax.lax.psum(ninst, "data"),
                "l1": l1v,
                "depth_loss": depth_loss,
            }
            return loss, aux_out

        P_loc = params.means3d.shape[0]
        tap = jnp.zeros((P_loc, 2), jnp.float32)
        (loss, aux_out), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(params, exposures, tap)
        g_params, g_exp, g_tap = grads
        # Under shard_map(check_vma=False) the transpose of psum is psum
        # (verified empirically: grad of psum(sum(x^2)) returns 2*n*x), so
        # every gradient path through the stripe-local loss's psum carries a
        # uniform extra factor of the mesh size.  Divide it back out.
        # Exposure is applied to the LOCAL stripe only, so its (already
        # n-scaled) gradient is a stripe partial that must additionally be
        # psum'd across devices to form the full-image exposure gradient.
        n_rep = jax.lax.psum(1, "data")
        g_params = jax.tree_util.tree_map(lambda g: g / n_rep, g_params)
        g_tap = g_tap / n_rep
        g_exp = jax.lax.psum(g_exp, "data") / n_rep
        overflow = jax.lax.pmax(
            aux_out["overflow"].astype(jnp.int32), "data"
        )
        return (
            loss, g_params, g_exp, g_tap, aux_out["radii"], overflow,
            aux_out["num_instances"], aux_out["l1"], aux_out["depth_loss"],
        )

    param_specs = jax.tree_util.tree_map(lambda _: P("data"), model.params)
    (loss, g_params, g_exp, g_tap, radii, overflow, ninst, l1v, dloss) = (
        shard_map(
            body,
            mesh=mesh,
            in_specs=(param_specs, P("data"), P(), P()),
            out_specs=(
                P(), param_specs, P(), P("data"), P("data"), P(), P(), P(),
                P(),
            ),
            check_vma=False,
        )(model.params, model.aux.alive, state.exposures, model.sh_degree)
    )

    # ---- shard-local optimizer (arrays stay sharded under jit) ----
    alive = model.aux.alive
    g_params = jax.tree_util.tree_map(
        lambda g: g * alive.reshape((-1,) + (1,) * (g.ndim - 1)), g_params
    )
    lrs = group_lrs(opt, step, model.spatial_lr_scale)
    visible = radii > 0 if opt.optimizer_type == "sparse_adam" else None
    new_params, new_adam = adam_update(
        g_params, state.adam, model.params, lrs, visible=visible
    )
    e_lr = exposure_lr(opt, step)
    if use_exposure:
        new_exp, new_exp_adam = adam_update(
            g_exp, state.exp_adam, state.exposures, e_lr
        )
    else:
        new_exp, new_exp_adam = state.exposures, state.exp_adam

    new_aux = add_densification_stats(model.aux, g_tap, radii)
    new_model = dataclasses.replace(model, params=new_params, aux=new_aux)
    new_state = TrainState(
        model=new_model,
        adam=new_adam,
        exposures=new_exp,
        exp_adam=new_exp_adam,
        step=step,
    )
    # device-side overflow no-op: see train.step.train_step.  overflow is
    # pmax'd across the mesh, so every shard takes the same branch.
    new_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(overflow > 0, old, new), new_state, state
    )
    metrics = {
        "loss": loss,
        "l1": l1v,
        "depth_loss": dloss,
        "overflow": overflow,
        "num_instances": ninst,
        "num_alive": new_model.num_alive(),
        "packed": jnp.stack(
            [
                loss,
                l1v,
                dloss,
                overflow.astype(jnp.float32),
                ninst.astype(jnp.float32),
                new_model.num_alive().astype(jnp.float32),
            ]
        ),
    }
    return new_state, metrics
