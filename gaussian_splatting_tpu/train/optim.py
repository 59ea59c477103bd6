"""Adam with per-group learning rates, visibility masking, and slot surgery.

A deliberately explicit Adam implementation instead of optax internals: the
densification path needs direct access to the moment pytree (the reference
performs optimizer-state surgery in ``cat_tensors_to_optimizer`` /
``_prune_optimizer``, gaussian_model.py:383-480 — here it is a masked zeroing
of moment rows), and the sparse-adam variant (train.py:240-246,
SparseGaussianAdam) updates only the rows visible in the current view.

Hyperparameters mirror the reference: betas (0.9, 0.999), eps 1e-15
(gaussian_model.py:245); per-group LRs from OptimizationConfig with the xyz
group on the log-lerp schedule scaled by the scene extent
(gaussian_model.py:248-263).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.config import OptimizationConfig
from gaussian_splatting_tpu.models.gaussians import GaussianParams
from gaussian_splatting_tpu.utils.schedules import expon_lr

B1 = 0.9
B2 = 0.999
EPS = 1e-15


class AdamState(NamedTuple):
    count: jnp.ndarray  # () int32
    mu: GaussianParams  # first moments (pytree matching params)
    nu: GaussianParams  # second moments


def adam_init(params) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=zeros)


def adam_update(
    grads,
    state: AdamState,
    params,
    lrs,
    *,
    visible: Optional[jnp.ndarray] = None,
    eps: float = EPS,
):
    """One Adam step. ``lrs`` is a pytree of scalar LRs matching ``params``.

    ``visible`` (C,) bool restricts both the parameter update and the moment
    update to visible rows (SparseGaussianAdam semantics) — rows are assumed
    to lead the first axis of every leaf.
    """
    count = state.count + 1
    c1 = 1.0 - B1 ** count.astype(jnp.float32)
    c2 = 1.0 - B2 ** count.astype(jnp.float32)
    tmap = jax.tree_util.tree_map

    def mask(new, old):
        if visible is None:
            return new
        sel = visible.reshape((-1,) + (1,) * (new.ndim - 1))
        return jnp.where(sel, new, old)

    new_mu = tmap(lambda g, mu: mask(B1 * mu + (1.0 - B1) * g, mu), grads, state.mu)
    new_nu = tmap(lambda g, nu: mask(B2 * nu + (1.0 - B2) * g * g, nu), grads, state.nu)

    def step_leaf(p, mu, nu, lr):
        step = lr * (mu / c1) / (jnp.sqrt(nu / c2) + eps)
        return p - mask(step, jnp.zeros_like(step))

    new_params = tmap(step_leaf, params, new_mu, new_nu, lrs)
    return new_params, AdamState(count=count, mu=new_mu, nu=new_nu)


def zero_moment_rows(state: AdamState, row_mask: jnp.ndarray) -> AdamState:
    """Zero moments for slots in ``row_mask`` (new densify rows /
    reused slots), replacing the reference's optimizer surgery."""

    def z(m):
        sel = row_mask.reshape((-1,) + (1,) * (m.ndim - 1))
        return jnp.where(sel, 0.0, m)

    return AdamState(
        count=state.count,
        mu=jax.tree_util.tree_map(z, state.mu),
        nu=jax.tree_util.tree_map(z, state.nu),
    )


def zero_opacity_moments(state: AdamState) -> AdamState:
    """After reset_opacity the reference zeroes the opacity group's moments
    (replace_tensor_to_optimizer, gaussian_model.py:383-397)."""
    return AdamState(
        count=state.count,
        mu=state.mu._replace(opacities=jnp.zeros_like(state.mu.opacities)),
        nu=state.nu._replace(opacities=jnp.zeros_like(state.nu.opacities)),
    )


def group_lrs(cfg: OptimizationConfig, step, spatial_lr_scale) -> GaussianParams:
    """Per-group LRs at ``step`` (gaussian_model.py:228-285)."""
    xyz_lr = expon_lr(
        step,
        lr_init=cfg.position_lr_init,
        lr_final=cfg.position_lr_final,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    ) * spatial_lr_scale
    return GaussianParams(
        means3d=xyz_lr,
        features_dc=jnp.asarray(cfg.feature_lr, jnp.float32),
        features_rest=jnp.asarray(cfg.feature_lr / 20.0, jnp.float32),
        opacities=jnp.asarray(cfg.opacity_lr, jnp.float32),
        scales=jnp.asarray(cfg.scaling_lr, jnp.float32),
        quats=jnp.asarray(cfg.rotation_lr, jnp.float32),
    )


def exposure_lr(cfg: OptimizationConfig, step):
    return expon_lr(
        step,
        lr_init=cfg.exposure_lr_init,
        lr_final=cfg.exposure_lr_final,
        lr_delay_steps=cfg.exposure_lr_delay_steps,
        lr_delay_mult=cfg.exposure_lr_delay_mult,
        max_steps=cfg.iterations,
    )
