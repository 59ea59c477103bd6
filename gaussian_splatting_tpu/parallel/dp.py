"""Camera data-parallel training step (SURVEY.md §7 phase A).

Gaussians are replicated; each device renders one camera of a batch and the
parameter gradients are ``psum``-reduced over ICI before a replicated Adam
step.  Implemented with ``shard_map`` so the per-device body can call the
Pallas rasterizer directly (no vmap batching rule needed).

Semantics match train.step.train_step per camera — photometric + optional
depth loss, per-image exposure optimization, overflow reporting, sparse-Adam
visibility (union over the batch), densification stats — averaged over the
camera batch.  Static camera attributes (width/height/fov) must be identical
across the batch; heterogeneous resolutions belong to separate DP batches
(each shape is its own compiled step, exactly like the single-device path).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gaussian_splatting_tpu.config import OptimizationConfig, RasterizeConfig
from gaussian_splatting_tpu.models.densify import add_densification_stats
from gaussian_splatting_tpu.ops.camera_math import CameraParams
from gaussian_splatting_tpu.ops.losses import (
    depth_l1_loss,
    l1_loss,
    photometric_loss,
)
from gaussian_splatting_tpu.ops.rasterize import render
from gaussian_splatting_tpu.train.optim import adam_update, exposure_lr, group_lrs
from gaussian_splatting_tpu.train.step import StepBatch, TrainState, apply_exposure
from gaussian_splatting_tpu.utils.schedules import expon_lr


def dp_train_step(
    state: TrainState,
    cams: CameraParams,  # pytree with leading batch axis B (sharded over 'data')
    batch: StepBatch,  # leading batch axis B
    mesh: Mesh,
    *,
    opt: OptimizationConfig,
    raster: RasterizeConfig,
    use_exposure: bool = False,
    use_depth: bool = False,
) -> Tuple[TrainState, dict]:
    """One DP iteration over a batch of B cameras (B divisible by mesh size)."""
    model = state.model
    step = state.step + 1
    width = cams.width
    height = cams.height
    tan_fovx = cams.tan_fovx
    tan_fovy = cams.tan_fovy

    def per_device(viewmatrix, projmatrix, campos, b: StepBatch, params,
                   alive, exposures, sh_deg):
        # local shard has leading axis B/n == 1
        cam = CameraParams(
            viewmatrix=viewmatrix[0],
            projmatrix=projmatrix[0],
            campos=campos[0],
            tan_fovx=tan_fovx,
            tan_fovy=tan_fovy,
            width=width,
            height=height,
        )
        local = jax.tree_util.tree_map(lambda x: x[0], b)

        def loss_fn(p, exposures, tap):
            sh = jnp.concatenate([p.features_dc, p.features_rest], axis=1)
            K = sh.shape[1]
            degs = jnp.floor(jnp.sqrt(jnp.arange(K, dtype=jnp.float32))).astype(jnp.int32)
            sh = jnp.where((degs <= sh_deg)[None, :, None], sh, 0.0)
            out = render(
                p.means3d,
                jnp.exp(p.scales),
                p.quats / jnp.linalg.norm(p.quats, axis=-1, keepdims=True),
                jax.nn.sigmoid(p.opacities) * alive,
                sh,
                cam,
                local.bg_color,
                sh_degree=model.max_sh_degree,
                cfg=raster,
                means2d_tap=tap,
            )
            image = out.image
            if use_exposure:
                image = apply_exposure(image, exposures[local.exposure_idx])
            image = image * local.alpha_mask
            gt = local.gt_image * local.alpha_mask
            loss = photometric_loss(image, gt, opt.lambda_dssim)
            depth_loss = jnp.float32(0.0)
            if use_depth:
                w_ = expon_lr(
                    step,
                    lr_init=opt.depth_l1_weight_init,
                    lr_final=opt.depth_l1_weight_final,
                    max_steps=opt.iterations,
                )
                depth_loss = w_ * depth_l1_loss(
                    out.invdepth, local.invdepth_gt, local.depth_mask
                )
                loss = loss + depth_loss
            aux = {
                "radii": out.radii,
                "overflow": out.overflow,
                "num_instances": out.num_instances,
                "l1": l1_loss(image, gt),
                "depth_loss": depth_loss,
            }
            return loss, aux

        tap = jnp.zeros((params.means3d.shape[0], 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(params, exposures, tap)
        g_params, g_exp, g_tap = grads
        # mean gradients over the camera batch, reduced over ICI.  Exposure
        # grads are per-image rows of the exposure table, so the psum merges
        # disjoint updates (each device touched only its camera's row).
        n = jax.lax.psum(1, "data")
        g_params = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "data") / n, g_params
        )
        g_exp = jax.lax.psum(g_exp, "data")
        g_tap = jax.lax.psum(g_tap, "data") / n
        loss = jax.lax.psum(loss, "data") / n
        l1v = jax.lax.psum(aux["l1"], "data") / n
        dlv = jax.lax.psum(aux["depth_loss"], "data") / n
        radii_max = jax.lax.pmax(aux["radii"], "data")
        overflow = jax.lax.pmax(aux["overflow"].astype(jnp.int32), "data")
        ninst = jax.lax.pmax(aux["num_instances"], "data")
        return loss, l1v, dlv, g_params, g_exp, g_tap, radii_max, overflow, ninst

    from jax import shard_map

    body = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    (loss, l1v, dlv, g_params, g_exp, g_tap, radii, overflow, ninst) = body(
        cams.viewmatrix,
        cams.projmatrix,
        cams.campos,
        batch,
        model.params,
        model.aux.alive,
        state.exposures,
        model.sh_degree,
    )

    alive = model.aux.alive
    g_params = jax.tree_util.tree_map(
        lambda g: g * alive.reshape((-1,) + (1,) * (g.ndim - 1)), g_params
    )
    lrs = group_lrs(opt, step, model.spatial_lr_scale)
    visible = radii > 0 if opt.optimizer_type == "sparse_adam" else None
    new_params, new_adam = adam_update(
        g_params, state.adam, model.params, lrs, visible=visible
    )
    if use_exposure:
        new_exp, new_exp_adam = adam_update(
            g_exp, state.exp_adam, state.exposures, exposure_lr(opt, step)
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
    # device-side overflow no-op: see train.step.train_step
    new_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(overflow > 0, old, new), new_state, state
    )
    metrics = {
        "loss": loss,
        "l1": l1v,
        "depth_loss": dlv,
        "overflow": overflow,
        "num_instances": ninst,
        "num_alive": new_model.num_alive(),
        "packed": jnp.stack(
            [
                loss,
                l1v,
                dlv,
                overflow.astype(jnp.float32),
                ninst.astype(jnp.float32),
                new_model.num_alive().astype(jnp.float32),
            ]
        ),
    }
    return new_state, metrics
