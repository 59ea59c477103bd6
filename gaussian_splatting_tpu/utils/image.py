"""Image metrics (reference utils/image_utils.py:14-19)."""

from __future__ import annotations

import jax.numpy as jnp


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((img1 - img2) ** 2)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse(img1, img2)))
