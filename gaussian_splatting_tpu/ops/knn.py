"""Mean squared distance to the 3 nearest neighbors (Gaussian scale init).

TPU-native equivalent of the reference's ``simple-knn`` CUDA submodule
(``simple_knn.cu``): its ``distCUDA2`` sorts points along a Morton curve and
scans nearby candidates (SURVEY.md §2.2 N2); the value feeds the initial
log-scale ``log(sqrt(dist2))`` (``scene/gaussian_model.py:198-200``).

Two implementations:
- ``knn_mean_sq_dist_exact``: O(N^2) in row-chunks — ground truth for tests
  and small point clouds.
- ``knn_mean_sq_dist``: Morton-sorted window scan, fully vectorized (sort +
  gathers), matching the reference's approximation strategy.  A window of
  2*W candidates along the Morton curve upper-bounds the true 3-NN distance;
  scale init only needs the right order of magnitude.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd position (Morton encoding helper)."""
    u = lambda x: jnp.uint32(x)
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes from (N, 3) points scaled into a 1024^3 grid."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((points - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)
    return (
        _expand_bits(q[:, 0])
        | (_expand_bits(q[:, 1]) << 1)
        | (_expand_bits(q[:, 2]) << 2)
    ).astype(jnp.uint32)


def knn_mean_sq_dist(points: jnp.ndarray, window: int = 32, k: int = 3) -> jnp.ndarray:
    """Approximate mean of squared distances to the k nearest neighbors."""
    n = points.shape[0]
    code = morton_codes(points)
    order = jnp.argsort(code)
    sorted_pts = points[order]

    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    ).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)[:, None] + offs[None, :]
    valid = (idx >= 0) & (idx < n)
    idx = jnp.clip(idx, 0, n - 1)
    cand = sorted_pts[idx]  # (N, 2W, 3)
    d2 = jnp.sum((cand - sorted_pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    best = -jax.lax.top_k(-d2, k)[0]  # k smallest
    mean = jnp.mean(jnp.where(jnp.isfinite(best), best, 0.0), axis=-1)
    # undo the sort
    return jnp.zeros(n, points.dtype).at[order].set(mean)


def knn_mean_sq_dist_exact(points: jnp.ndarray, k: int = 3, chunk: int = 1024) -> jnp.ndarray:
    """Exact O(N^2) version, row-chunked to bound memory."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))

    def row_block(carry, block):
        d2 = jnp.sum((block[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        row_ids = jnp.arange(n)
        best = -jax.lax.top_k(-d2, k + 1)[0]  # includes self (0)
        # drop the smallest (self distance 0); coincident points keep 0s.
        return carry, jnp.mean(best[:, 1:], axis=-1)

    blocks = pts_pad.reshape(-1, chunk, 3)
    _, means = jax.lax.scan(row_block, None, blocks)
    return means.reshape(-1)[:n]
