"""Antialiasing and depth-regularization coverage.

Antialiasing (reference forward.cu:294-303): +0.3px covariance dilation is
always applied; with --antialiasing the opacity is additionally rescaled by
sqrt(det/det_dilated).  Depth regularization (train.py:166-175): masked L1 on
the rendered expected inverse depth with an exponentially decaying weight.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.config import OptimizationConfig, RasterizeConfig
from gaussian_splatting_tpu.ops.rasterize import render
from gaussian_splatting_tpu.utils.testing import random_scene


@pytest.fixture(scope="module")
def scene():
    return random_scene(400, sh_degree=1, width=64, height=48, seed=21)


def _render(scene, impl, aa):
    cfg = RasterizeConfig(antialiasing=aa, instance_slack=16.0)
    return render(
        scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh,
        scene.cam, scene.bg, sh_degree=1, cfg=cfg, impl=impl,
    )


def test_antialiasing_changes_output(scene):
    base = _render(scene, "dense", False)
    aa = _render(scene, "dense", True)
    # AA rescales opacity by sqrt(det/det_dilated) < 1: images must differ
    assert float(jnp.abs(aa.image - base.image).max()) > 1e-4


def test_antialiasing_pallas_matches_oracle(scene):
    d = _render(scene, "dense", True)
    p = _render(scene, "pallas", True)
    np.testing.assert_allclose(np.asarray(p.image), np.asarray(d.image), atol=2e-4)


def test_antialiasing_gradient_parity(scene):
    def loss(impl, op):
        s = scene._replace(opacities=op)
        out = _render(s, impl, True)
        return jnp.sum(out.image**2)

    gd = jax.grad(lambda o: loss("dense", o))(scene.opacities)
    gp = jax.grad(lambda o: loss("pallas", o))(scene.opacities)
    scale = float(jnp.abs(gd).max()) + 1e-12
    np.testing.assert_allclose(
        np.asarray(gp) / scale, np.asarray(gd) / scale, atol=3e-4
    )


@pytest.mark.heavy
def test_depth_loss_gradient_flows():
    """With use_depth, the invdepth L1 term produces gradients on means3d
    depth (z) and the loss includes the weighted depth term."""
    from gaussian_splatting_tpu.models.gaussians import create_from_pcd
    from gaussian_splatting_tpu.train.step import StepBatch, init_train_state, train_step

    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.5, 0.5, (48, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (48, 3)).astype(np.float32)
    model = create_from_pcd(pts, cols, max_sh_degree=1, spatial_lr_scale=1.0, capacity=64)
    state = init_train_state(model, num_images=1)

    sc = random_scene(4, width=32, height=32, seed=30)
    h = w = 32
    gt = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
    batch = StepBatch(
        gt_image=gt,
        alpha_mask=jnp.ones((1, h, w)),
        invdepth_gt=jnp.full((h, w), 0.7, jnp.float32),
        depth_mask=jnp.ones((h, w)),
        exposure_idx=jnp.asarray(0, jnp.int32),
        bg_color=jnp.zeros(3),
    )
    opt = OptimizationConfig()
    from functools import partial

    fn_depth = jax.jit(partial(train_step, opt=opt, raster=RasterizeConfig(), use_depth=True))
    fn_plain = jax.jit(partial(train_step, opt=opt, raster=RasterizeConfig(), use_depth=False))
    s_depth, m_depth = fn_depth(state, sc.cam, batch)
    s_plain, m_plain = fn_plain(state, sc.cam, batch)

    assert float(m_depth["depth_loss"]) > 0.0
    assert float(m_plain["depth_loss"]) == 0.0
    assert float(m_depth["loss"]) > float(m_plain["loss"])
    # the depth term must change the parameter update (z direction pressure)
    dz = np.abs(
        np.asarray(s_depth.model.params.means3d) - np.asarray(s_plain.model.params.means3d)
    ).max()
    assert dz > 0.0


def test_depth_weight_schedule():
    """depth_l1_weight decays from init to final over iterations (train.py:77)."""
    from gaussian_splatting_tpu.utils.schedules import expon_lr

    opt = OptimizationConfig()
    w0 = float(expon_lr(1, lr_init=opt.depth_l1_weight_init,
                        lr_final=opt.depth_l1_weight_final, max_steps=opt.iterations))
    w1 = float(expon_lr(opt.iterations, lr_init=opt.depth_l1_weight_init,
                        lr_final=opt.depth_l1_weight_final, max_steps=opt.iterations))
    assert w0 == pytest.approx(opt.depth_l1_weight_init, rel=0.05)
    assert w1 == pytest.approx(opt.depth_l1_weight_final, rel=0.05)
