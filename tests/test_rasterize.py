"""Oracle-vs-Pallas parity: forward images and parameter gradients.

This is BASELINE.json config 1: synthetic random Gaussians, forward +
pixel-gradient allclose between the dense autodiff oracle and the Pallas
kernels (run in interpreter mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.config import RasterizeConfig
from gaussian_splatting_tpu.ops.rasterize import render
from gaussian_splatting_tpu.utils.testing import random_scene


def _render_fn(scene, impl, sh_degree=0, **kw):
    cfg = RasterizeConfig(**kw)

    def fn(means3d, scales, quats, opac, sh):
        out = render(
            means3d,
            scales,
            quats,
            opac,
            sh,
            scene.cam,
            scene.bg,
            sh_degree=sh_degree,
            cfg=cfg,
            impl=impl,
        )
        return out

    return fn


@pytest.mark.parametrize("sh_degree", [0, 2])
def test_forward_parity(sh_degree):
    scene = random_scene(300, sh_degree=sh_degree, width=64, height=48, seed=1)
    args = (scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
    dense = _render_fn(scene, "dense", sh_degree)(*args)
    fast = _render_fn(scene, "pallas", sh_degree)(*args)
    assert not bool(fast.overflow)
    np.testing.assert_allclose(
        np.asarray(fast.image), np.asarray(dense.image), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fast.invdepth), np.asarray(dense.invdepth), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fast.final_T), np.asarray(dense.final_T), atol=2e-4
    )
    # image actually has content
    assert float(jnp.abs(dense.image).sum()) > 1.0


def test_background_compositing():
    scene = random_scene(50, width=32, height=32, seed=3, bg=(0.1, 0.7, 0.3))
    args = (scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
    dense = _render_fn(scene, "dense")(*args)
    fast = _render_fn(scene, "pallas")(*args)
    np.testing.assert_allclose(np.asarray(fast.image), np.asarray(dense.image), atol=2e-4)
    # background shows through where nothing was drawn
    empty = np.asarray(dense.final_T) > 0.999
    assert empty.any()
    bg = np.broadcast_to(np.asarray(scene.bg)[:, None], (3, int(empty.sum())))
    np.testing.assert_allclose(np.asarray(dense.image)[:, empty], bg, atol=1e-5)


@pytest.mark.parametrize("sh_degree", [0, 1])
def test_gradient_parity(sh_degree):
    scene = random_scene(200, sh_degree=sh_degree, width=48, height=32, seed=2)
    args = (scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
    # random fixed loss weights so every pixel contributes differently
    key = jax.random.PRNGKey(0)
    wimg = jax.random.normal(key, (3, 32, 48))
    winvd = jax.random.normal(key, (32, 48)) * 0.1

    def loss(impl):
        fn = _render_fn(scene, impl, sh_degree)

        def f(*a):
            out = fn(*a)
            return jnp.sum(out.image * wimg) + jnp.sum(out.invdepth * winvd)

        return f

    g_dense = jax.grad(loss("dense"), argnums=(0, 1, 2, 3, 4))(*args)
    g_fast = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means3d", "scales", "quats", "opacities", "sh"]
    for name, gd, gf in zip(names, g_dense, g_fast):
        gd, gf = np.asarray(gd), np.asarray(gf)
        scale = np.abs(gd).max() + 1e-8
        np.testing.assert_allclose(
            gf / scale, gd / scale, atol=3e-4, err_msg=f"grad mismatch: {name}"
        )


def test_means2d_tap_gradient():
    scene = random_scene(100, width=32, height=32, seed=4)
    tap = jnp.zeros((100, 2))

    def loss(tap, impl):
        out = render(
            scene.means3d,
            scene.scales,
            scene.quats,
            scene.opacities,
            scene.sh,
            scene.cam,
            scene.bg,
            sh_degree=0,
            impl=impl,
            means2d_tap=tap,
        )
        return jnp.sum(out.image**2)

    g_dense = jax.grad(lambda t: loss(t, "dense"))(tap)
    g_fast = jax.grad(lambda t: loss(t, "pallas"))(tap)
    assert float(jnp.abs(g_dense).sum()) > 0
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_dense), atol=5e-4)


def test_non_tile_aligned_resolution():
    # W, H not multiples of 16 exercise the padding/crop path
    scene = random_scene(150, width=50, height=35, seed=5)
    args = (scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
    dense = _render_fn(scene, "dense")(*args)
    fast = _render_fn(scene, "pallas")(*args)
    assert fast.image.shape == (3, 35, 50)
    np.testing.assert_allclose(np.asarray(fast.image), np.asarray(dense.image), atol=2e-4)


def test_overflow_flag():
    scene = random_scene(500, width=64, height=64, seed=6)
    cfg = RasterizeConfig()
    out = render(
        scene.means3d,
        scene.scales,
        scene.quats,
        scene.opacities,
        scene.sh,
        scene.cam,
        scene.bg,
        sh_degree=0,
        cfg=cfg,
        impl="pallas",
        capacity=256,
    )
    assert bool(out.overflow)


def test_compact_backward_drain_no_stale_gradients():
    """Regression (round-3, ADVICE high): the compact-backward drain must
    zero a staging half after waiting its pending flush.  Scenario: one tile
    whose first instances saturate every pixel (forward early-stop), so the
    trailing chunks are skipped by the active_chunks early-out and only run
    flush bookkeeping — the final partial window must then flush ZEROS, not
    the previous window's gradient data still sitting in the staging half.
    """
    from gaussian_splatting_tpu.ops import blend_pallas as bp

    chunk = 128
    n_inst = 300  # 3 chunks; only chunk 0 has contributors
    cap_aligned = 384
    meta = np.zeros((bp.NUM_FIELDS, cap_aligned + chunk), np.float32)
    rng = np.random.default_rng(7)
    # all instances centered on the single 16x16 tile, tiny conic -> G ~ 1
    meta[bp.F_X, :n_inst] = 8.0 + rng.uniform(-2, 2, n_inst)
    meta[bp.F_Y, :n_inst] = 8.0 + rng.uniform(-2, 2, n_inst)
    meta[bp.F_CA, :n_inst] = 1e-4
    meta[bp.F_CC, :n_inst] = 1e-4
    meta[bp.F_OP, :n_inst] = 0.3
    meta[bp.F_OP, :8] = 1.0  # first 8 saturate: T < 1e-4 after ~3
    meta[bp.F_R, :n_inst] = rng.uniform(0.1, 1.0, n_inst)
    meta[bp.F_G, :n_inst] = rng.uniform(0.1, 1.0, n_inst)
    meta[bp.F_B, :n_inst] = rng.uniform(0.1, 1.0, n_inst)
    meta[bp.F_INVD, :n_inst] = 0.5
    meta = jnp.asarray(meta)

    starts = jnp.array([0], jnp.int32)
    ends = jnp.array([n_inst], jnp.int32)
    fwd = bp.blend_forward_pallas(
        meta, starts, ends, grid_x=1, grid_y=1, interpret=True
    )
    # sanity: every pixel early-stopped within chunk 0
    nb = np.asarray(fwd[0, :, bp.O_NB])
    assert nb.max() <= chunk  # every pixel's first-bad position in chunk 0

    ct = jnp.ones((1, 256, bp.CT_COLS), jnp.float32)
    dmeta = bp.blend_backward_compact_pallas(
        meta, starts, ends, fwd, ct,
        capacity=cap_aligned, grid_x=1, grid_y=1, interpret=True,
    )
    d = np.asarray(dmeta[:10])
    # chunk 0 has real gradients
    assert np.abs(d[:, :chunk]).max() > 0.0
    # every valid slot past the last contributor gets EXACTLY zero — the
    # final-window drain flush (slots 256..300) is where stale data leaked
    np.testing.assert_array_equal(d[:, chunk:n_inst], 0.0)


def test_precomp_debug_flags_match_fused_path():
    """--convert_SHs_python / --compute_cov3D_python route colors/cov3D
    through the precomp hooks (reference gaussian_renderer/__init__.py:86-111)
    and must reproduce the fused path exactly."""
    import dataclasses

    from gaussian_splatting_tpu.config import RasterizeConfig

    scene = random_scene(300, sh_degree=2, width=64, height=48, seed=21)
    base_cfg = RasterizeConfig()
    args = (
        scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh,
        scene.cam, scene.bg,
    )
    base = render(*args, sh_degree=2, cfg=base_cfg)
    for flags in (
        {"convert_SHs_python": True},
        {"compute_cov3D_python": True},
        {"convert_SHs_python": True, "compute_cov3D_python": True},
    ):
        out = render(
            *args, sh_degree=2, cfg=dataclasses.replace(base_cfg, **flags)
        )
        np.testing.assert_allclose(
            np.asarray(out.image), np.asarray(base.image), atol=1e-6,
            err_msg=str(flags),
        )


def test_compact_boundary_window_seam():
    """Round-4 compact reads: two tiles whose gapless ranges SHARE a
    128-window.  Tile 0 owns compact slots [0, 200), tile 1 owns [200, 360)
    — window 1 (slots 128..256) holds tile 0's tail AND tile 1's head.  The
    head-masked reads must keep each tile's blend independent, and the
    backward's shared staging window must accumulate both tiles' gradients
    exactly (the seam is an add of disjoint lanes)."""
    from gaussian_splatting_tpu.ops import blend_pallas as bp

    rng = np.random.default_rng(11)
    n0, n1 = 200, 160
    n = n0 + n1
    cap = 512
    meta = np.zeros((bp.NUM_FIELDS, cap + 256), np.float32)
    for lo, hi, cx, cy in ((0, n0, 8.0, 8.0), (n0, n, 24.0, 8.0)):
        k = hi - lo
        meta[bp.F_X, lo:hi] = cx + rng.uniform(-4, 4, k)
        meta[bp.F_Y, lo:hi] = cy + rng.uniform(-4, 4, k)
        meta[bp.F_CA, lo:hi] = rng.uniform(0.02, 0.1, k)
        meta[bp.F_CC, lo:hi] = rng.uniform(0.02, 0.1, k)
        meta[bp.F_OP, lo:hi] = rng.uniform(0.1, 0.6, k)
        meta[bp.F_R, lo:hi] = rng.uniform(0, 1, k)
        meta[bp.F_G, lo:hi] = rng.uniform(0, 1, k)
        meta[bp.F_B, lo:hi] = rng.uniform(0, 1, k)
        meta[bp.F_INVD, lo:hi] = rng.uniform(0.2, 2.0, k)
    meta = jnp.asarray(meta)
    kw = dict(grid_x=2, grid_y=1, tile_w=16, tile_h=16, interpret=True)

    # shared-window layout vs tile 1 rendered alone (same 2-tile grid so its
    # pixel coords are identical; its instances then start at slot 0 = no head)
    starts = jnp.array([0, n0], jnp.int32)
    ends = jnp.array([n0, n], jnp.int32)
    fwd = bp.blend_forward_pallas(meta, starts, ends, **kw)

    meta1 = jnp.asarray(
        np.concatenate(
            [np.asarray(meta)[:, n0:n], np.zeros((bp.NUM_FIELDS, 256 + 96), np.float32)],
            axis=1,
        )
    )
    starts1 = jnp.array([0, 0], jnp.int32)
    ends1 = jnp.array([0, n1], jnp.int32)
    fwd_t1 = bp.blend_forward_pallas(meta1, starts1, ends1, **kw)
    np.testing.assert_allclose(
        np.asarray(fwd[1, :, :5]), np.asarray(fwd_t1[1, :, :5]), atol=2e-4,
        err_msg="tile 1 blended through the shared window differs",
    )

    # backward: grads through the shared staging window == the isolated run's
    ct_np = rng.uniform(-1, 1, (2, 256, bp.CT_COLS)).astype(np.float32)
    ct = jnp.asarray(ct_np)
    d = bp.blend_backward_compact_pallas(
        meta, starts, ends, fwd, ct, capacity=cap, **kw
    )
    ct1 = np.zeros_like(ct_np)
    ct1[1] = ct_np[1]
    d1 = bp.blend_backward_compact_pallas(
        meta1, starts1, ends1, fwd_t1, jnp.asarray(ct1), capacity=cap, **kw
    )
    # atol: the two layouts split the replay's per-chunk T-carry lane sums
    # at different lane offsets (head 72 vs 0), which rounds differently at
    # the ~1e-5 level (round 5: plain-sum carries).  A real seam bug (stale
    # staging data, double adds) shows up at O(1), far above this.
    np.testing.assert_allclose(
        np.asarray(d[:10, n0:n]), np.asarray(d1[:10, :n1]), atol=5e-5,
        err_msg="tile 1 grads through the shared staging window differ",
    )
