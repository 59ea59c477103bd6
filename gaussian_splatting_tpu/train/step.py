"""The jitted training step and densification step.

Reimplements the reference's per-iteration hot path (train.py:91-256) as two
pure functions:

- ``train_step``: render -> photometric(+depth) loss -> backward -> Adam on
  Gaussian params + exposure -> densification-stat accumulation.  Fully
  jitted; one compilation per image resolution.
- ``densify_step``: clone/split/prune + moment zeroing (runs every
  ``densification_interval`` iterations inside the densify window).

Exposure compensation mirrors gaussian_renderer/__init__.py:139-143:
``rgb_out = rgb @ M + t`` with a per-image (3, 4) affine applied after
rasterization (only when train_test_exp is enabled).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.config import OptimizationConfig, RasterizeConfig
from gaussian_splatting_tpu.models.densify import (
    add_densification_stats,
    densify_and_prune,
    reset_opacity,
)
from gaussian_splatting_tpu.models.gaussians import GaussianModel
from gaussian_splatting_tpu.ops.camera_math import CameraParams
from gaussian_splatting_tpu.ops.losses import depth_l1_loss, l1_loss, photometric_loss
from gaussian_splatting_tpu.ops.rasterize import render
from gaussian_splatting_tpu.train.optim import (
    AdamState,
    adam_init,
    adam_update,
    exposure_lr,
    group_lrs,
    zero_moment_rows,
    zero_opacity_moments,
)
from gaussian_splatting_tpu.utils.schedules import expon_lr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    model: GaussianModel
    adam: AdamState
    exposures: jnp.ndarray  # (N_images, 3, 4)
    exp_adam: AdamState
    step: jnp.ndarray  # () int32 (1-based iteration like the reference)


def init_train_state(model: GaussianModel, num_images: int) -> TrainState:
    exposures = jnp.tile(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)[None],
        (max(num_images, 1), 1, 1),
    ).astype(jnp.float32)
    return TrainState(
        model=model,
        adam=adam_init(model.params),
        exposures=exposures,
        exp_adam=adam_init(exposures),
        step=jnp.zeros((), jnp.int32),
    )


class StepBatch(NamedTuple):
    """Per-iteration device inputs for one camera."""

    gt_image: jnp.ndarray  # (3, H, W)
    alpha_mask: jnp.ndarray  # (1, H, W) (ones if absent)
    invdepth_gt: jnp.ndarray  # (H, W) (zeros if absent)
    depth_mask: jnp.ndarray  # (H, W) (zeros if absent)
    exposure_idx: jnp.ndarray  # () int32
    bg_color: jnp.ndarray  # (3,)


def apply_exposure(image: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    """gaussian_renderer/__init__.py:139-143 (pixels as rows: rgb' = rgb @ M + t)."""
    M = exposure[:3, :3]
    t = exposure[:3, 3]
    chw = jnp.einsum("chw,ck->khw", image, M, precision=jax.lax.Precision.HIGHEST)
    return chw + t[:, None, None]


def train_step(
    state: TrainState,
    cam: CameraParams,
    batch: StepBatch,
    *,
    opt: OptimizationConfig,
    raster: RasterizeConfig,
    use_exposure: bool = False,
    use_depth: bool = False,
) -> Tuple[TrainState, dict]:
    """One optimization iteration (train.py:118-251)."""
    model = state.model
    step = state.step + 1
    sh_degree = model.max_sh_degree  # static upper bound; active degree masks SH

    def loss_fn(params, exposures, tap):
        # active-SH-degree masking: zero out coefficients above the current
        # degree (oneupSHdegree semantics without recompilation)
        sh = jnp.concatenate([params.features_dc, params.features_rest], axis=1)
        K = sh.shape[1]
        degs = jnp.floor(jnp.sqrt(jnp.arange(K, dtype=jnp.float32))).astype(jnp.int32)
        sh = jnp.where((degs <= model.sh_degree)[None, :, None], sh, 0.0)

        out = render(
            params.means3d,
            jnp.exp(params.scales),
            params.quats / jnp.linalg.norm(params.quats, axis=-1, keepdims=True),
            jax.nn.sigmoid(params.opacities) * model.aux.alive,
            sh,
            cam,
            batch.bg_color,
            sh_degree=sh_degree,
            cfg=raster,
            means2d_tap=tap,
        )
        image = out.image
        if use_exposure:
            exp = exposures[batch.exposure_idx]
            image = apply_exposure(image, exp)
        image = image * batch.alpha_mask  # train.py:149-151
        gt = batch.gt_image * batch.alpha_mask

        loss = photometric_loss(image, gt, opt.lambda_dssim)
        depth_loss = jnp.float32(0.0)
        if use_depth:
            w = expon_lr(
                step,
                lr_init=opt.depth_l1_weight_init,
                lr_final=opt.depth_l1_weight_final,
                max_steps=opt.iterations,
            )
            depth_loss = w * depth_l1_loss(
                out.invdepth, batch.invdepth_gt, batch.depth_mask
            )
            loss = loss + depth_loss
        aux_out = {
            "radii": out.radii,
            "overflow": out.overflow,
            "num_instances": out.num_instances,
            "l1": l1_loss(image, gt),
            "depth_loss": depth_loss,
        }
        return loss, aux_out

    tap = jnp.zeros((model.capacity, 2), jnp.float32)
    (loss, aux_out), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
        model.params, state.exposures, tap
    )
    g_params, g_exp, g_tap = grads

    # dead capacity slots do not exist in the reference's exactly-sized
    # arrays; mask their gradients so no numerical dust ever moves them
    alive = model.aux.alive
    g_params = jax.tree_util.tree_map(
        lambda g: g * alive.reshape((-1,) + (1,) * (g.ndim - 1)), g_params
    )

    lrs = group_lrs(opt, step, model.spatial_lr_scale)
    visible = aux_out["radii"] > 0 if opt.optimizer_type == "sparse_adam" else None
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

    new_aux = add_densification_stats(model.aux, g_tap, aux_out["radii"])

    new_model = dataclasses.replace(model, params=new_params, aux=new_aux)
    new_state = TrainState(
        model=new_model,
        adam=new_adam,
        exposures=new_exp,
        exp_adam=new_exp_adam,
        step=step,
    )
    # Overflow guard ON DEVICE: a truncated instance stream means truncated
    # gradients, so an overflowed step keeps the input state bit-for-bit
    # (including the step counter — LR schedules see the retry, like the
    # reference's exact realloc-and-redo).  The host can therefore process
    # step metrics on a 1-step lag (no per-step sync) and grow capacity
    # when it notices, without ever rolling back corrupted state.
    ovf = aux_out["overflow"]
    new_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ovf, old, new), new_state, state
    )
    metrics = {
        "loss": loss,
        "l1": aux_out["l1"],
        "depth_loss": aux_out["depth_loss"],
        "overflow": aux_out["overflow"],
        "num_instances": aux_out["num_instances"],
        "num_alive": new_model.num_alive(),
    }
    # one fetchable array so the host pays a single device round-trip per
    # step (each separate scalar fetch costs a full RTT on remote devices)
    metrics["packed"] = jnp.stack(
        [
            loss,
            aux_out["l1"],
            aux_out["depth_loss"],
            aux_out["overflow"].astype(jnp.float32),
            aux_out["num_instances"].astype(jnp.float32),
            new_model.num_alive().astype(jnp.float32),
        ]
    )
    return new_state, metrics


def densify_step(
    state: TrainState,
    key: jax.Array,
    *,
    opt: OptimizationConfig,
    max_screen_size: int,
) -> Tuple[TrainState, dict]:
    """Densify + prune + moment zeroing (train.py:219-224)."""
    model = state.model
    res = densify_and_prune(
        model.params,
        model.aux,
        key,
        grad_threshold=opt.densify_grad_threshold,
        min_opacity=0.005,
        extent=model.spatial_lr_scale,
        max_screen_size=max_screen_size,
        percent_dense=opt.percent_dense,
    )
    adam = zero_moment_rows(state.adam, res.new_slot_mask)
    new_model = dataclasses.replace(model, params=res.params, aux=res.aux)
    stats = {
        "cloned": res.num_cloned,
        "split": res.num_split,
        "pruned": res.num_pruned,
        "dropped": res.dropped,
        "num_alive": new_model.num_alive(),
    }
    return dataclasses.replace(state, model=new_model, adam=adam), stats


def opacity_reset_step(state: TrainState) -> TrainState:
    """train.py:229-230 + optimizer surgery."""
    params = reset_opacity(state.model.params)
    adam = zero_opacity_moments(state.adam)
    return dataclasses.replace(
        state, model=dataclasses.replace(state.model, params=params), adam=adam
    )
