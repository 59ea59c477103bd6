"""Adaptive density control: clone / split / prune as jitted masked ops.

Functional redesign of ``densify_and_prune`` and friends
(scene/gaussian_model.py:508-654).  The reference resizes tensors and
performs optimizer-state surgery in Python (``cat_tensors_to_optimizer``
:439-480, ``_prune_optimizer`` :400-417); here everything operates on
fixed-capacity arrays with an alive mask:

- *prune*: clear ``alive`` (moments untouched — slots are reinitialized on
  reuse, matching the reference's zeroed moments for new rows),
- *clone*: copy candidate rows into free slots (densify_and_clone :552-571),
- *split*: sample two children from N(mean, Sigma) with scale/1.6, one child
  overwrites the parent slot, one goes to a free slot
  (densify_and_split :508-549),
- new slots get zeroed Adam moments via the returned ``new_slot_mask``.

If candidates outnumber free slots the extras are dropped and reported so
the host can grow capacity between steps (the XLA-static replacement for
dynamic reallocation).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.models.gaussians import GaussianAux, GaussianParams
from gaussian_splatting_tpu.ops.transforms import quat_to_rotmat


class DensifyResult(NamedTuple):
    params: GaussianParams
    aux: GaussianAux
    new_slot_mask: jnp.ndarray  # (C,) bool — slots whose Adam moments must reset
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    dropped: jnp.ndarray  # candidates that found no free slot


def _assign_free_slots(cand_mask: jnp.ndarray, free_mask: jnp.ndarray):
    """Pair the i-th candidate with the i-th free slot, statically shaped.

    Returns (src_idx, dst_idx, pair_valid) of length C: for valid pairs,
    row ``src_idx[i]`` should be copied into slot ``dst_idx[i]``.
    """
    C = cand_mask.shape[0]
    order_src = jnp.argsort(~cand_mask, stable=True)  # candidates first
    order_dst = jnp.argsort(~free_mask, stable=True)  # free slots first
    n_cand = jnp.sum(cand_mask.astype(jnp.int32))
    n_free = jnp.sum(free_mask.astype(jnp.int32))
    i = jnp.arange(C, dtype=jnp.int32)
    valid = (i < n_cand) & (i < n_free)
    return order_src, order_dst, valid, n_cand, n_free


def _copy_rows(params: GaussianParams, src, dst, valid) -> GaussianParams:
    def cp(arr):
        rows = arr[src]
        cur = arr[dst]
        sel = valid.reshape((-1,) + (1,) * (arr.ndim - 1))
        return arr.at[dst].set(jnp.where(sel, rows, cur))

    return GaussianParams(*[cp(a) for a in params])


def densify_and_prune(
    params: GaussianParams,
    aux: GaussianAux,
    key: jax.Array,
    *,
    grad_threshold: float,
    min_opacity: float,
    extent,
    max_screen_size: int,
    percent_dense: float,
) -> DensifyResult:
    """One density-control step (gaussian_model.py:574-633).

    ``aux.xyz_grad_accum / aux.denom`` hold the accumulated NDC-space
    positional gradient norms (add_densification_stats :643-654).
    """
    C = params.means3d.shape[0]
    alive = aux.alive
    grads = jnp.where(aux.denom > 0, aux.xyz_grad_accum / jnp.maximum(aux.denom, 1.0), 0.0)
    scales = jnp.exp(params.scales)
    max_scale = jnp.max(scales, axis=-1)
    high_grad = alive & (grads >= grad_threshold)

    # ---------------- clone (small Gaussians) ----------------
    clone_mask = high_grad & (max_scale <= percent_dense * extent)
    free = ~alive
    src, dst, valid, n_clone, _ = _assign_free_slots(clone_mask, free)
    params = _copy_rows(params, src, dst, valid)
    alive = alive.at[dst].set(jnp.where(valid, True, alive[dst]))
    new_slots = jnp.zeros((C,), bool).at[dst].set(valid)
    num_cloned = jnp.minimum(n_clone, jnp.sum(free.astype(jnp.int32)))
    dropped = jnp.maximum(n_clone - num_cloned, 0)

    # ---------------- split (large Gaussians) ----------------
    split_mask = high_grad & (max_scale > percent_dense * extent)
    # child sampling: x = mean + R @ (sigma * eps)  (gaussian_model.py:523-533)
    k1, k2 = jax.random.split(key)
    R = quat_to_rotmat(
        params.quats / jnp.linalg.norm(params.quats, axis=-1, keepdims=True)
    )

    def sample_child(k):
        eps = jax.random.normal(k, (C, 3)) * scales
        offset = jnp.einsum("nij,nj->ni", R, eps)
        return params.means3d + offset

    childA_mean = sample_child(k1)
    childB_mean = sample_child(k2)
    child_scales = jnp.log(scales / (0.8 * 2.0))  # :535

    free = ~alive
    src_s, dst_s, valid_s, n_split, _ = _assign_free_slots(split_mask, free)
    # child B -> free slot (copy all params from parent, then fix mean/scale)
    params = _copy_rows(params, src_s, dst_s, valid_s)
    sel = valid_s[:, None]
    params = params._replace(
        means3d=params.means3d.at[dst_s].set(
            jnp.where(sel, childB_mean[src_s], params.means3d[dst_s])
        ),
        scales=params.scales.at[dst_s].set(
            jnp.where(sel, child_scales[src_s], params.scales[dst_s])
        ),
    )
    alive = alive.at[dst_s].set(jnp.where(valid_s, True, alive[dst_s]))
    new_slots = new_slots.at[dst_s].set(jnp.where(valid_s, True, new_slots[dst_s]))
    num_split = jnp.minimum(n_split, jnp.sum(free.astype(jnp.int32)))
    dropped = dropped + jnp.maximum(n_split - num_split, 0)

    # child A overwrites the parent slot in place (parent is pruned either
    # way, :547-549) — but only for parents whose child B found a slot; a
    # dropped split keeps the parent untouched.
    placedB = jnp.zeros((C,), bool).at[src_s].set(valid_s)
    splitA = split_mask & placedB
    params = params._replace(
        means3d=jnp.where(splitA[:, None], childA_mean, params.means3d),
        scales=jnp.where(splitA[:, None], child_scales, params.scales),
    )
    new_slots = new_slots | splitA

    # ---------------- prune ----------------
    opac = jax.nn.sigmoid(params.opacities)
    prune_mask = opac < min_opacity
    if max_screen_size:
        # new rows have no screen-radius history (reference pads with zeros)
        radii_hist = jnp.where(new_slots, 0.0, aux.max_radii2d)
        prune_mask = (
            prune_mask
            | (radii_hist > max_screen_size)
            | (jnp.max(jnp.exp(params.scales), axis=-1) > 0.1 * extent)
        )
    # The reference applies the prune conditions to the full post-densify
    # array, new rows included (gaussian_model.py:612-622); new rows have
    # max_radii2D == 0 so only the opacity/world-size conditions can hit them.
    prune_mask = prune_mask & alive
    num_pruned = jnp.sum(prune_mask.astype(jnp.int32))
    alive = alive & ~prune_mask

    aux = GaussianAux(
        alive=alive,
        max_radii2d=jnp.zeros((C,), jnp.float32),
        xyz_grad_accum=jnp.zeros((C,), jnp.float32),
        denom=jnp.zeros((C,), jnp.float32),
    )
    return DensifyResult(
        params=params,
        aux=aux,
        new_slot_mask=new_slots,
        num_cloned=num_cloned,
        num_split=num_split,
        num_pruned=num_pruned,
        dropped=dropped,
    )


def add_densification_stats(
    aux: GaussianAux,
    tap_grad: jnp.ndarray,  # (C, 2) NDC-space mean2d gradients
    radii: jnp.ndarray,  # (C,) int32 from the render
) -> GaussianAux:
    """gaussian_model.py:643-654 + the max_radii2D update (train.py:213-216)."""
    visible = radii > 0
    norm = jnp.linalg.norm(tap_grad, axis=-1)
    return aux._replace(
        xyz_grad_accum=aux.xyz_grad_accum + jnp.where(visible, norm, 0.0),
        denom=aux.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32) * visible),
    )


def reset_opacity(params: GaussianParams) -> GaussianParams:
    """Clamp opacity to at most 0.01 (gaussian_model.py:323-326)."""
    new_op = jnp.minimum(jax.nn.sigmoid(params.opacities), 0.01)
    logits = jnp.log(new_op / (1.0 - new_op))
    return params._replace(opacities=logits)
