"""Segmented-cumsum Pallas kernel vs a sequential numpy reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.ops.segscan import segmented_cumsum


def _ref(vals, flags):
    out = np.zeros_like(vals)
    run = np.zeros(vals.shape[0], vals.dtype)
    for i in range(vals.shape[1]):
        run = vals[:, i].copy() if flags[i] > 0 else run + vals[:, i]
        out[:, i] = run
    return out


@pytest.mark.parametrize("n", [257, 2048, 5000])
def test_segmented_cumsum_matches_reference(rng, n):
    vals = rng.normal(size=(16, n)).astype(np.float32)
    flags = (rng.uniform(size=n) < 0.1).astype(np.float32)
    flags[0] = 1.0
    out = np.asarray(
        segmented_cumsum(jnp.asarray(vals), jnp.asarray(flags), interpret=True)
    )
    np.testing.assert_allclose(out, _ref(vals, flags), atol=1e-4)


def test_segmented_cumsum_zero_segments_exact(rng):
    """Segments of exact zeros must scan to exact zeros (no prefix dust)."""
    n = 4096
    vals = rng.normal(size=(16, n)).astype(np.float32)
    vals[:, 1000:1100] = 0.0
    flags = np.zeros(n, np.float32)
    flags[[0, 1000, 1100]] = 1.0
    out = np.asarray(
        segmented_cumsum(jnp.asarray(vals), jnp.asarray(flags), interpret=True)
    )
    assert np.abs(out[:, 1000:1100]).max() == 0.0


def test_segment_crossing_block_boundary(rng):
    """A segment spanning the kernel's block boundary carries correctly."""
    n = 3000
    block = 2048
    vals = rng.normal(size=(4, n)).astype(np.float32)
    flags = np.zeros(n, np.float32)
    flags[[0, 500]] = 1.0  # second segment spans the 2048 boundary
    out = np.asarray(
        segmented_cumsum(
            jnp.asarray(vals), jnp.asarray(flags), block=block, interpret=True
        )
    )
    np.testing.assert_allclose(out, _ref(vals, flags), atol=1e-4)
