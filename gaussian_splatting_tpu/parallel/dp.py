"""Camera data-parallel training step (SURVEY.md §7 phase A).

Gaussians are replicated; each device renders one camera of a batch and the
parameter gradients are ``psum``-reduced over ICI before a replicated Adam
step.  Implemented with ``shard_map`` so the per-device body can call the
Pallas rasterizer directly (no vmap batching rule needed).
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
from gaussian_splatting_tpu.ops.losses import photometric_loss
from gaussian_splatting_tpu.ops.rasterize import render
from gaussian_splatting_tpu.train.optim import adam_update, group_lrs
from gaussian_splatting_tpu.train.step import StepBatch, TrainState


def dp_train_step(
    state: TrainState,
    cams: CameraParams,  # pytree with leading batch axis B (sharded over 'data')
    batch: StepBatch,  # leading batch axis B
    mesh: Mesh,
    *,
    opt: OptimizationConfig,
    raster: RasterizeConfig,
) -> Tuple[TrainState, dict]:
    """One DP iteration over a batch of B cameras (B divisible by mesh size).

    Static camera attributes (width/height/fov) must be identical across the
    batch — only matrices/images are batched.
    """
    model = state.model
    step = state.step + 1
    width = cams.width
    height = cams.height
    tan_fovx = cams.tan_fovx
    tan_fovy = cams.tan_fovy

    def per_device(viewmatrix, projmatrix, campos, b: StepBatch, params, alive, sh_deg):
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

        def loss_fn(p, tap):
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
            img = out.image * local.alpha_mask
            gt = local.gt_image * local.alpha_mask
            return photometric_loss(img, gt, opt.lambda_dssim), out.radii

        tap = jnp.zeros((params.means3d.shape[0], 2), jnp.float32)
        (loss, radii), (g_params, g_tap) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, tap)
        # mean gradients over the camera batch, reduced over ICI
        n = jax.lax.psum(1, "data")
        g_params = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "data") / n, g_params
        )
        g_tap = jax.lax.psum(g_tap, "data") / n
        loss = jax.lax.psum(loss, "data") / n
        radii_max = jax.lax.pmax(radii, "data")
        return loss, g_params, g_tap, radii_max

    from jax import shard_map

    body = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    loss, g_params, g_tap, radii = body(
        cams.viewmatrix,
        cams.projmatrix,
        cams.campos,
        batch,
        model.params,
        model.aux.alive,
        model.sh_degree,
    )

    lrs = group_lrs(opt, step, model.spatial_lr_scale)
    visible = radii > 0 if opt.optimizer_type == "sparse_adam" else None
    new_params, new_adam = adam_update(
        g_params, state.adam, model.params, lrs, visible=visible
    )
    new_aux = add_densification_stats(model.aux, g_tap, radii)
    new_model = dataclasses.replace(model, params=new_params, aux=new_aux)
    new_state = dataclasses.replace(
        state, model=new_model, adam=new_adam, step=step
    )
    return new_state, {"loss": loss}
