"""Pallas untile/retile relayout (ops/untile.py): bit-exact vs the XLA
transpose formulation, in both directions (custom_vjp retile)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.ops.untile import pick_t_per, untile_pallas


def _ref_untile(p, gx, gy, tw, th):
    cols = p.shape[-1]
    img = p.reshape(gy, gx, th, tw, cols)
    return img.transpose(4, 0, 2, 1, 3).reshape(cols, gy * th, gx * tw)


@pytest.mark.parametrize("gy,gx,cols", [(3, 10, 5), (1, 7, 8), (4, 8, 3), (2, 50, 5)])
def test_untile_matches_xla_transpose(gy, gx, cols):
    tw = th = 16
    t_per = pick_t_per(gx)
    assert gx % t_per == 0
    p = jax.random.normal(
        jax.random.PRNGKey(gy * 31 + gx), (gy * gx, th * tw, cols), jnp.float32
    )
    a = _ref_untile(p, gx, gy, tw, th)
    b = untile_pallas(p, gx, gy, tw, th, t_per, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_untile_vjp_is_retile():
    gy, gx, tw, th, cols = 2, 6, 16, 16, 5
    t_per = pick_t_per(gx)
    p = jax.random.normal(jax.random.PRNGKey(0), (gy * gx, th * tw, cols))
    ct = jax.random.normal(jax.random.PRNGKey(1), (cols, gy * th, gx * tw))
    ga = jax.vjp(lambda x: _ref_untile(x, gx, gy, tw, th), p)[1](ct)[0]
    gb = jax.vjp(
        lambda x: untile_pallas(x, gx, gy, tw, th, t_per, True), p
    )[1](ct)[0]
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_pick_t_per():
    assert pick_t_per(120) == 8
    assert pick_t_per(16) == 8
    # Mosaic legality: t_per*tile_w % 128 != 0 for every divisor -> whole row
    assert pick_t_per(50) == 50
    assert pick_t_per(7) == 7
    assert pick_t_per(13) == 13
    # wider tiles reach 128 with fewer tiles per group
    assert pick_t_per(12, tile_w=32) == 4
