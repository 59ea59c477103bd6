"""Training losses: L1, windowed SSIM, depth L1.

SSIM matches the reference ``utils/loss_utils.py:46-86`` exactly: 11x11
Gaussian window (sigma 1.5), per-channel depthwise convolution with
zero-padded SAME borders (torch ``F.conv2d(padding=window//2)`` semantics),
C1 = 0.01^2, C2 = 0.03^2.  The separable convolution is expressed as two XLA
``conv_general_dilated`` calls, which XLA fuses and runs on the MXU — the
role the hand-fused CUDA kernel plays in the reference's ``fused-ssim``
submodule (SURVEY.md §2.2 N3).  A Pallas fused variant can slot in behind
the same function signature later; the numerics here are the contract.

Depth loss: mean |invdepth - mono_invdepth| * mask (train.py:166-175).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

C1 = 0.01**2
C2 = 0.03**2


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """utils/loss_utils.py:40-41."""
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """utils/loss_utils.py:43-44."""
    return jnp.mean((pred - target) ** 2)


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float):
    # pure numpy so the cached value is a constant, never a leaked tracer
    import numpy as np

    xs = np.array(
        [
            math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
            for x in range(window_size)
        ],
        np.float32,
    )
    return xs / xs.sum()


def _blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Depthwise separable Gaussian blur with zero padding, NCHW."""
    c = img.shape[1]
    g = _gaussian_window(window_size, sigma)
    pad = window_size // 2
    kh = jnp.tile(g.reshape(1, 1, window_size, 1), (c, 1, 1, 1))
    kw = jnp.tile(g.reshape(1, 1, 1, window_size), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(img.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        img, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    return out


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over (C, H, W) or (N, C, H, W) images in [0, 1]."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    mu1 = _blur(img1, window_size, sigma)
    mu2 = _blur(img2, window_size, sigma)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size, sigma) - mu1_mu2
    ssim_map = ((2.0 * mu1_mu2 + C1) * (2.0 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def photometric_loss(
    image: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float
) -> jnp.ndarray:
    """(1-λ)·L1 + λ·(1-SSIM)  (train.py:155-162)."""
    return (1.0 - lambda_dssim) * l1_loss(image, gt) + lambda_dssim * (
        1.0 - ssim(image, gt)
    )


def depth_l1_loss(
    invdepth: jnp.ndarray, mono_invdepth: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """train.py:166-175: masked mean absolute inverse-depth error."""
    return jnp.mean(jnp.abs(invdepth - mono_invdepth) * mask)
