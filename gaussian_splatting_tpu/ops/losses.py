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


def _ssim_partials(img1, img2, window_size, sigma):
    """SSIM map + the three partials the backward needs.

    The reference's ``fused-ssim`` submodule computes ssim_map together with
    dm/dmu1, dm/dsigma1_sq, dm/dsigma12 in one kernel (ssim.cu:187-286) so
    the backward is a single convolution instead of autodiff re-running the
    forward blurs.  Same trick here, expressed as batched XLA depthwise
    convolutions (MXU) instead of a hand-written shared-memory kernel.
    """
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=1
    )
    blurred = _blur(stacked, window_size, sigma)
    c = img1.shape[1]
    mu1, mu2, x2, y2, xy = (
        blurred[:, i * c : (i + 1) * c] for i in range(5)
    )
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = x2 - mu1_sq
    sigma2_sq = y2 - mu2_sq
    sigma12 = xy - mu1_mu2

    A1 = 2.0 * mu1_mu2 + C1
    A2 = 2.0 * sigma12 + C2
    B1 = mu1_sq + mu2_sq + C1
    B2 = sigma1_sq + sigma2_sq + C2
    inv_B1B2 = 1.0 / (B1 * B2)
    m = A1 * A2 * inv_B1B2

    # partial w.r.t. mu1 holding the sigmas fixed; the backward adds the
    # sigma1_sq/sigma12 dependence on mu1 via its -2*blur(G2*mu1) and
    # -blur(G3*mu2) terms (ssim.cu's formulation)
    dm_dmu1 = (2.0 * mu2 * A2 - 2.0 * mu1 * A1 * A2 / B1) * inv_B1B2
    dm_dsigma1_sq = -A1 * A2 * inv_B1B2 / B2
    dm_dsigma12 = 2.0 * A1 * inv_B1B2
    return m, (mu1, mu2, dm_dmu1, dm_dsigma1_sq, dm_dsigma12)


@jax.custom_vjp
def fused_ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM with a fused one-blur backward (reference fused-ssim, N3).

    Differentiable w.r.t. img1 only (the reference's ``train=True`` mode,
    fused-ssim/fused_ssim/__init__.py:8-41); img2 is the ground truth.
    Numerics identical to :func:`ssim` (11x11 Gaussian, sigma 1.5, SAME).
    """
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    m, _ = _ssim_partials(img1, img2, 11, 1.5)
    return jnp.mean(m)


def _fused_ssim_fwd(img1, img2):
    squeeze = img1.ndim == 3
    i1 = img1[None] if squeeze else img1
    i2 = img2[None] if squeeze else img2
    m, parts = _ssim_partials(i1, i2, 11, 1.5)
    return jnp.mean(m), (i1, i2, parts, squeeze)


def _fused_ssim_bwd(res, g):
    img1, img2, (mu1, mu2, dm_dmu1, dm_dsigma1_sq, dm_dsigma12), squeeze = res
    gmap = g / img1.size  # d mean / d map
    # Chain through x -> {mu1 (w), sigma1_sq (2xw - 2mu1 w), sigma12 (yw - mu2 w)}:
    # dL/dx = blur(G1) + 2x blur(G2) - 2 blur(G2 mu1) + y blur(G3) - blur(G3 mu2)
    G1 = dm_dmu1
    G2 = dm_dsigma1_sq
    G3 = dm_dsigma12
    stacked = jnp.concatenate([G1, G2, G2 * mu1, G3, G3 * mu2], axis=1)
    blurred = _blur(stacked, 11, 1.5)
    c = img1.shape[1]
    b1, b2, b2m1, b3, b3m2 = (blurred[:, i * c : (i + 1) * c] for i in range(5))
    dimg1 = gmap * (b1 + 2.0 * img1 * b2 - 2.0 * b2m1 + img2 * b3 - b3m2)
    if squeeze:
        dimg1 = dimg1[0]
    return dimg1, jnp.zeros_like(dimg1)


fused_ssim.defvjp(_fused_ssim_fwd, _fused_ssim_bwd)


@jax.custom_vjp
def fused_ssim_weighted_sum(
    img1: jnp.ndarray, img2: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """``sum(ssim_map * weight)`` with the fused one-blur backward.

    The stripe-local SSIM building block (parallel/gshard.py): callers pass
    a (3, Hext, W) strip extended by the 5-row blur halo and a per-pixel
    ``weight`` (Hext, W) that selects the strip's core rows and carries the
    1/denominator, so summing across devices reproduces the full-image
    ``fused_ssim`` mean exactly.  Differentiable w.r.t. ``img1`` only;
    ``weight`` is a constant.  Unlike the scalar-mean backward, a per-pixel
    cotangent does NOT commute with the blur, so the gmap factor multiplies
    the G-terms BEFORE the (self-adjoint: symmetric kernel + zero pad)
    backward blur.
    """
    m, _ = _ssim_partials(img1[None], img2[None], 11, 1.5)
    return jnp.sum(m[0] * weight[None])


def _fused_ssim_ws_fwd(img1, img2, weight):
    m, parts = _ssim_partials(img1[None], img2[None], 11, 1.5)
    return jnp.sum(m[0] * weight[None]), (img1[None], img2[None], parts, weight)


def _fused_ssim_ws_bwd(res, g):
    img1, img2, (mu1, mu2, G1, G2, G3), weight = res
    gmap = (g * weight)[None, None]  # (1, 1, Hext, W), broadcast over channels
    stacked = jnp.concatenate(
        [gmap * G1, gmap * G2, gmap * G2 * mu1, gmap * G3, gmap * G3 * mu2],
        axis=1,
    )
    blurred = _blur(stacked, 11, 1.5)
    c = img1.shape[1]
    b1, b2, b2m1, b3, b3m2 = (blurred[:, i * c : (i + 1) * c] for i in range(5))
    dimg1 = b1 + 2.0 * img1 * b2 - 2.0 * b2m1 + img2 * b3 - b3m2
    return dimg1[0], jnp.zeros_like(dimg1[0]), jnp.zeros_like(weight)


fused_ssim_weighted_sum.defvjp(_fused_ssim_ws_fwd, _fused_ssim_ws_bwd)


def photometric_loss(
    image: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float, fast_ssim: bool = True
) -> jnp.ndarray:
    """(1-λ)·L1 + λ·(1-SSIM)  (train.py:155-162)."""
    s = fused_ssim(image, gt) if fast_ssim else ssim(image, gt)
    return (1.0 - lambda_dssim) * l1_loss(image, gt) + lambda_dssim * (1.0 - s)


def depth_l1_loss(
    invdepth: jnp.ndarray, mono_invdepth: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """train.py:166-175: masked mean absolute inverse-depth error."""
    return jnp.mean(jnp.abs(invdepth - mono_invdepth) * mask)
