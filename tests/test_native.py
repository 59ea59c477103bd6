"""Native C++ runtime vs pure-Python reference implementations."""

import os

import numpy as np
import pytest

from gaussian_splatting_tpu import native
from gaussian_splatting_tpu.data import colmap as cm

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture
def sparse_model(tmp_path):
    rng = np.random.default_rng(0)
    n = 257
    xyz = rng.uniform(-5, 5, (n, 3))
    rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    cm.write_points3d_binary(str(tmp_path / "points3D.bin"), xyz, rgb)

    cams = {
        1: cm.ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320.0, 240.0])),
        2: cm.ColmapCamera(2, "SIMPLE_PINHOLE", 64, 48, np.array([50.0, 32.0, 24.0])),
    }
    cm.write_cameras_binary(str(tmp_path / "cameras.bin"), cams)

    import struct

    with open(tmp_path / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for img_id, name, npts in ((3, "a.jpg", 4), (9, "b_long_name.png", 0)):
            f.write(struct.pack("<i", img_id))
            f.write(struct.pack("<4d", *rng.normal(size=4)))
            f.write(struct.pack("<3d", *rng.normal(size=3)))
            f.write(struct.pack("<i", img_id % 2 + 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", npts))
            for k in range(npts):
                f.write(struct.pack("<2dq", 1.5 * k, 2.5 * k, k - 1))
    return tmp_path


def test_native_points3d_matches_python(sparse_model):
    path = str(sparse_model / "points3D.bin")
    xyz_py, rgb_py, err_py, ids_py = cm.read_points3d_binary(path, return_ids=True)
    xyz_n, rgb_n, err_n, ids_n = native.read_points3d_binary(path, return_ids=True)
    np.testing.assert_allclose(xyz_n, xyz_py)
    np.testing.assert_array_equal(rgb_n, rgb_py)
    np.testing.assert_allclose(err_n, err_py)
    np.testing.assert_array_equal(ids_n, ids_py)


def test_native_cameras_match_python(sparse_model):
    path = str(sparse_model / "cameras.bin")
    py = cm.read_cameras_binary(path)
    nat = native.read_cameras_binary(path)
    assert set(py) == set(nat)
    for k in py:
        assert py[k].model == nat[k].model
        assert py[k].width == nat[k].width and py[k].height == nat[k].height
        np.testing.assert_allclose(py[k].params, nat[k].params)


def test_native_images_match_python(sparse_model):
    path = str(sparse_model / "images.bin")
    py = cm.read_images_binary(path, load_points2d=True)
    nat = native.read_images_binary(path, load_points2d=True)
    assert set(py) == set(nat)
    for k in py:
        np.testing.assert_allclose(py[k].qvec, nat[k].qvec)
        np.testing.assert_allclose(py[k].tvec, nat[k].tvec)
        assert py[k].name == nat[k].name
        assert py[k].camera_id == nat[k].camera_id
        np.testing.assert_allclose(py[k].xys, nat[k].xys)
        np.testing.assert_array_equal(py[k].point3d_ids, nat[k].point3d_ids)


def test_native_image_decode_png_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (21, 17, 3)).astype(np.uint8)
    path = str(tmp_path / "t.png")
    Image.fromarray(img).save(path)
    out = native.decode_image(path)
    np.testing.assert_array_equal(out, img)

    # RGBA
    rgba = rng.integers(0, 255, (10, 12, 4)).astype(np.uint8)
    path = str(tmp_path / "t2.png")
    Image.fromarray(rgba, "RGBA").save(path)
    np.testing.assert_array_equal(native.decode_image(path), rgba)


def test_native_image_decode_16bit_depth(tmp_path):
    import cv2

    rng = np.random.default_rng(2)
    depth = rng.integers(0, 2**16 - 1, (9, 11)).astype(np.uint16)
    path = str(tmp_path / "d.png")
    cv2.imwrite(path, depth)
    out = native.decode_image(path)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, depth)


def test_native_image_decode_jpeg_close_to_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    # smooth image so JPEG error is small
    base = np.linspace(0, 255, 64, dtype=np.float32)
    img = (base[None, :, None] * np.ones((48, 1, 3))).astype(np.uint8)
    path = str(tmp_path / "t.jpg")
    Image.fromarray(img).save(path, quality=95)
    ours = native.decode_image(path).astype(np.int32)
    pil = np.asarray(Image.open(path)).astype(np.int32)
    # decoders may differ by a couple of levels in IDCT rounding
    assert np.abs(ours - pil).max() <= 2


def test_native_resize_matches_reference_bilinear():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    out = native.resize_bilinear(img, 16, 24)
    assert out.shape == (16, 24, 3)
    # integer 2x downscale with pixel-center sampling == 2x2 box average
    box = img.reshape(16, 2, 24, 2, 3).astype(np.float64).mean(axis=(1, 3))
    assert np.abs(out.astype(np.float64) - box).max() <= 1.0


def test_native_to_float_chw():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (7, 5, 3)).astype(np.uint8)
    out = native.to_float_chw(img)
    np.testing.assert_allclose(
        out, img.transpose(2, 0, 1).astype(np.float32) / 255.0, atol=1e-7
    )


def test_native_knn_close_to_exact():
    from gaussian_splatting_tpu.ops.knn import knn_mean_sq_dist_exact

    rng = np.random.default_rng(6)
    pts = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
    approx = native.knn_mean_sq_dist(pts, window=32)
    exact = np.asarray(knn_mean_sq_dist_exact(pts))
    # Morton-window scan upper-bounds the true 3-NN mean; most points match
    ratio = approx / np.maximum(exact, 1e-12)
    assert (ratio >= 0.999).all()
    assert np.median(ratio) < 1.3
