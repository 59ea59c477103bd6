"""Gaussian model state: fixed-capacity functional pytrees.

Replaces the reference's ``GaussianModel`` object (scene/gaussian_model.py:30)
with plain pytrees sized to a static *capacity*: live Gaussians occupy a
prefix/subset marked by ``alive``; densify/prune write into free slots under
jit instead of reallocating tensors (the reference performs Python-side
optimizer-state surgery instead, gaussian_model.py:383-480).

Activations mirror ``setup_functions`` (gaussian_model.py:32-55):
scales = exp(log-scale), opacity = sigmoid(logit), rotation = normalized quat,
covariance from build_scaling_rotation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.ops.knn import knn_mean_sq_dist, knn_mean_sq_dist_exact
from gaussian_splatting_tpu.ops.sh import num_sh_coeffs, rgb_to_sh
from gaussian_splatting_tpu.ops.transforms import inverse_sigmoid, normalize_quat


class GaussianParams(NamedTuple):
    """Learnable (pre-activation) parameters, each padded to capacity C.

    Layout matches the reference's parameter groups (gaussian_model.py:228-263):
    xyz / f_dc / f_rest / opacity / scaling / rotation.
    """

    means3d: jnp.ndarray  # (C, 3)
    features_dc: jnp.ndarray  # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, K-1, 3)
    opacities: jnp.ndarray  # (C,) logits
    scales: jnp.ndarray  # (C, 3) log-scales
    quats: jnp.ndarray  # (C, 4) unnormalized wxyz


class GaussianAux(NamedTuple):
    """Non-learnable per-Gaussian state (densification bookkeeping).

    Mirrors max_radii2D / xyz_gradient_accum / denom
    (gaussian_model.py:84-90, 643-654) plus the alive mask that replaces
    dynamic tensor resizing.
    """

    alive: jnp.ndarray  # (C,) bool
    max_radii2d: jnp.ndarray  # (C,) float32
    xyz_grad_accum: jnp.ndarray  # (C,) float32
    denom: jnp.ndarray  # (C,) float32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianModel:
    params: GaussianParams
    aux: GaussianAux
    spatial_lr_scale: jnp.ndarray  # () float32 (cameras_extent)
    sh_degree: jnp.ndarray  # () int32 — active degree (oneupSHdegree)
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.params.means3d.shape[0]

    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.aux.alive.astype(jnp.int32))

    # ---- activations -----------------------------------------------------
    def get_scales(self) -> jnp.ndarray:
        return jnp.exp(self.params.scales)

    def get_opacities(self) -> jnp.ndarray:
        # dead slots render as fully transparent
        return jax.nn.sigmoid(self.params.opacities) * self.aux.alive

    def get_quats(self) -> jnp.ndarray:
        return normalize_quat(self.params.quats)

    def get_sh(self) -> jnp.ndarray:
        return jnp.concatenate(
            [self.params.features_dc, self.params.features_rest], axis=1
        )

    def one_up_sh_degree(self) -> "GaussianModel":
        """train.py:123-124 / gaussian_model.py:173-175."""
        return dataclasses.replace(
            self,
            sh_degree=jnp.minimum(self.sh_degree + 1, self.max_sh_degree),
        )


def empty_params(capacity: int, max_sh_degree: int) -> GaussianParams:
    K = num_sh_coeffs(max_sh_degree)
    return GaussianParams(
        means3d=jnp.zeros((capacity, 3), jnp.float32),
        features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, K - 1, 3), jnp.float32),
        opacities=jnp.full((capacity,), -10.0, jnp.float32),
        scales=jnp.zeros((capacity, 3), jnp.float32),
        quats=jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32), (capacity, 1)),
    )


def empty_aux(capacity: int) -> GaussianAux:
    return GaussianAux(
        alive=jnp.zeros((capacity,), bool),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    *,
    max_sh_degree: int,
    spatial_lr_scale: float,
    capacity: Optional[int] = None,
    exact_knn: Optional[bool] = None,
) -> GaussianModel:
    """Initialize from a point cloud (``create_from_pcd``,
    gaussian_model.py:178-226): SH DC from RGB, isotropic log-scales from the
    mean 3-NN squared distance, identity rotations, opacity 0.1.
    """
    n = points.shape[0]
    capacity = capacity or int(n * 1.5) + 1024
    if n > capacity:
        print(
            f"[create_from_pcd] subsampling init cloud {n} -> {capacity} points "
            "(capacity limit)"
        )
        sel = np.random.default_rng(0).choice(n, capacity, replace=False)
        points = np.asarray(points)[sel]
        colors = np.asarray(colors)[sel]
        n = capacity
    pts = jnp.asarray(points, jnp.float32)

    if exact_knn is None:
        exact_knn = n <= 20_000
    dist_fn = knn_mean_sq_dist_exact if exact_knn else knn_mean_sq_dist
    dist2 = jnp.clip(dist_fn(pts), 1e-7, None)  # gaussian_model.py:198
    log_scale = jnp.log(jnp.sqrt(dist2))

    params = empty_params(capacity, max_sh_degree)
    aux = empty_aux(capacity)
    sl = slice(0, n)
    params = params._replace(
        means3d=params.means3d.at[sl].set(pts),
        features_dc=params.features_dc.at[sl].set(
            rgb_to_sh(jnp.asarray(colors, jnp.float32))[:, None, :]
        ),
        opacities=params.opacities.at[sl].set(float(inverse_sigmoid(jnp.asarray(0.1)))),
        scales=params.scales.at[sl].set(jnp.tile(log_scale[:, None], (1, 3))),
    )
    aux = aux._replace(alive=aux.alive.at[sl].set(True))
    return GaussianModel(
        params=params,
        aux=aux,
        spatial_lr_scale=jnp.asarray(spatial_lr_scale, jnp.float32),
        sh_degree=jnp.asarray(0, jnp.int32),
        max_sh_degree=max_sh_degree,
    )


def grow_capacity(model: GaussianModel, new_capacity: int) -> GaussianModel:
    """Host-side capacity bump (recompile boundary)."""
    old = model.capacity
    assert new_capacity >= old
    extra = new_capacity - old
    pad_p = empty_params(extra, model.max_sh_degree)
    pad_a = empty_aux(extra)
    params = GaussianParams(
        *[jnp.concatenate([a, b], axis=0) for a, b in zip(model.params, pad_p)]
    )
    aux = GaussianAux(
        *[jnp.concatenate([a, b], axis=0) for a, b in zip(model.aux, pad_a)]
    )
    return dataclasses.replace(model, params=params, aux=aux)
