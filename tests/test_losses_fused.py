"""Fused SSIM vs the reference windowed SSIM (the role of
submodules/fused-ssim/tests/test.py in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.ops.losses import fused_ssim, photometric_loss, ssim


@pytest.fixture
def imgs(rng):
    a = jnp.asarray(rng.uniform(0, 1, (3, 37, 45)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (3, 37, 45)).astype(np.float32))
    return a, b


def test_fused_ssim_value_matches_reference(imgs):
    a, b = imgs
    assert float(fused_ssim(a, b)) == pytest.approx(float(ssim(a, b)), abs=1e-6)
    # batched input path
    a4, b4 = a[None], b[None]
    assert float(fused_ssim(a4, b4)) == pytest.approx(float(ssim(a4, b4)), abs=1e-6)


def test_fused_ssim_gradient_matches_autodiff(imgs):
    a, b = imgs
    g_ref = jax.grad(lambda x: ssim(x, b))(a)
    g_fused = jax.grad(lambda x: fused_ssim(x, b))(a)
    err = float(jnp.abs(g_ref - g_fused).max())
    scale = float(jnp.abs(g_ref).max())
    assert err / scale < 1e-4


def test_fused_ssim_identical_images(imgs):
    a, _ = imgs
    assert float(fused_ssim(a, a)) == pytest.approx(1.0, abs=1e-5)


def test_photometric_loss_fast_path_matches(imgs):
    a, b = imgs
    fast = float(photometric_loss(a, b, 0.2, fast_ssim=True))
    slow = float(photometric_loss(a, b, 0.2, fast_ssim=False))
    assert fast == pytest.approx(slow, abs=1e-6)


def test_fused_ssim_image_optimization_converges(rng):
    """The reference's tests/train_image.py sanity check, miniaturized:
    optimizing an image by SSIM alone should drive it toward the target."""
    target = jnp.asarray(rng.uniform(0, 1, (3, 24, 24)).astype(np.float32))
    x = jnp.full((3, 24, 24), 0.5, jnp.float32)

    @jax.jit
    def step(x):
        loss, g = jax.value_and_grad(lambda im: 1.0 - fused_ssim(im, target))(x)
        return x - 0.5 * g, loss

    first = None
    for i in range(60):
        x, loss = step(x)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first


def test_fused_ssim_weighted_sum_matches_autodiff():
    """Per-pixel-weighted SSIM sum (the stripe-local building block) must
    agree with autodiff through the plain ssim map formula, including the
    non-commuting gmap-inside-blur backward."""
    import jax

    from gaussian_splatting_tpu.ops.losses import (
        _blur,
        _ssim_partials,
        fused_ssim_weighted_sum,
    )

    rng = np.random.default_rng(11)
    H, W = 24, 20
    img1 = jnp.asarray(rng.random((3, H, W)), jnp.float32)
    img2 = jnp.asarray(rng.random((3, H, W)), jnp.float32)
    weight = jnp.asarray(rng.random((H, W)), jnp.float32)

    def ref(i1):
        m, _ = _ssim_partials(i1[None], img2[None], 11, 1.5)
        return jnp.sum(m[0] * weight[None])

    v_ref, g_ref = jax.value_and_grad(ref)(img1)
    v, g = jax.value_and_grad(
        lambda i1: fused_ssim_weighted_sum(i1, img2, weight)
    )(img1)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=2e-5, rtol=1e-4
    )


def test_fused_ssim_stripe_decomposition_matches_full_image():
    """The gshard stripe-local SSIM (parallel/gshard.py): summing per-stripe
    weighted sums over 5-row-haloed strips must reproduce the full-image
    fused_ssim mean exactly, values AND gradients, including a ragged last
    stripe (rows past H zero-padded) and zero-filled mesh-edge halos."""
    import jax

    from gaussian_splatting_tpu.ops.losses import (
        fused_ssim,
        fused_ssim_weighted_sum,
    )

    rng = np.random.default_rng(7)
    H, W, n = 30, 16, 4  # Sh = 8 rows/stripe, last stripe has 2 padded rows
    Sh = -(-H // n)
    Hpad = n * Sh
    img1 = jnp.asarray(rng.random((3, H, W)), jnp.float32)
    img2 = jnp.asarray(rng.random((3, H, W)), jnp.float32)

    def stripes(i1):
        i1p = jnp.pad(i1, ((0, 0), (5, Hpad - H + 5), (0, 0)))
        i2p = jnp.pad(img2, ((0, 0), (5, Hpad - H + 5), (0, 0)))
        total = 0.0
        for d in range(n):
            y0 = d * Sh
            ext1 = jax.lax.dynamic_slice(i1p, (0, y0, 0), (3, Sh + 10, W))
            ext2 = jax.lax.dynamic_slice(i2p, (0, y0, 0), (3, Sh + 10, W))
            rows_valid = ((y0 + jnp.arange(Sh)) < H).astype(jnp.float32)
            weight = (
                jnp.pad(rows_valid, (5, 5))[:, None]
                * jnp.ones((1, W), jnp.float32)
                / (3.0 * H * W)
            )
            total = total + fused_ssim_weighted_sum(ext1, ext2, weight)
        return total

    v_full, g_full = jax.value_and_grad(lambda i: fused_ssim(i, img2))(img1)
    v_str, g_str = jax.value_and_grad(stripes)(img1)
    np.testing.assert_allclose(float(v_str), float(v_full), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_str), np.asarray(g_full), atol=2e-6, rtol=1e-4
    )
