"""Quaternion / covariance math for anisotropic 3D Gaussians.

Numerics match the reference's ``utils/general_utils.py:78-110`` (python) and
``computeCov3D`` (forward.cu:149-190): quaternions are stored (w, x, y, z),
the covariance is built as ``Sigma = R S S^T R^T = L L^T`` with
``L = R @ diag(scale)``.  All functions are batched over a leading axis and
fully differentiable (the reference's hand-derived scale/rotation backward,
backward.cu:296-365, is replaced by autodiff).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize (..., 4) quaternions (reference uses ``F.normalize``)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Assumes ``q`` is already normalized (matches ``build_rotation``,
    utils/general_utils.py:78-99, after its internal normalization).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_scaling_rotation(scale: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): (..., 3) scales + (..., 4) quats -> (..., 3, 3).

    Reference: ``build_scaling_rotation`` (utils/general_utils.py:101-110).
    """
    R = quat_to_rotmat(q)
    return R * scale[..., None, :]


def build_covariance(
    scale: jnp.ndarray, q: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """3D covariance Sigma = L L^T, returned as packed upper triangle.

    Returns (..., 6): [xx, xy, xz, yy, yz, zz] — the layout of the reference's
    ``cov3D`` buffer (forward.cu:178-190).
    """
    L = build_scaling_rotation(scale_modifier * scale, q)
    # Sigma_ij = sum_k L_ik L_jk, written elementwise: tiny 3x3 products would
    # otherwise lower onto the MXU where TPU's default bf16 matmul precision
    # destroys the covariance conditioning.  Elementwise keeps it on the VPU
    # in full fp32.
    def dot_rows(i, j):
        return (
            L[..., i, 0] * L[..., j, 0]
            + L[..., i, 1] * L[..., j, 1]
            + L[..., i, 2] * L[..., j, 2]
        )

    return jnp.stack(
        [
            dot_rows(0, 0),
            dot_rows(0, 1),
            dot_rows(0, 2),
            dot_rows(1, 1),
            dot_rows(1, 2),
            dot_rows(2, 2),
        ],
        axis=-1,
    )


def unpack_sym3(cov6: jnp.ndarray) -> jnp.ndarray:
    """Packed (..., 6) upper triangle -> full (..., 3, 3) symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def apply_rot(M: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Row-convention ``p @ M.T`` for (3,3) M and (..., 3) points, elementwise.

    Written without a matmul so TPU keeps it on the VPU in fp32 (the MXU's
    default bf16 precision is unacceptable for pose/projection math).
    """
    return jnp.stack(
        [
            p[..., 0] * M[0, 0] + p[..., 1] * M[0, 1] + p[..., 2] * M[0, 2],
            p[..., 0] * M[1, 0] + p[..., 1] * M[1, 1] + p[..., 2] * M[1, 2],
            p[..., 0] * M[2, 0] + p[..., 1] * M[2, 1] + p[..., 2] * M[2, 2],
        ],
        axis=-1,
    )


def apply_affine(M: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply the top-left 3x3 + translation column of a 4x4 to (..., 3) points."""
    return apply_rot(M[:3, :3], p) + M[:3, 3]


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Logit (reference ``inverse_sigmoid``, utils/general_utils.py:18)."""
    return jnp.log(x / (1.0 - x))
