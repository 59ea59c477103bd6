"""Tests for auxiliary subsystems: viewer bridge, depth-scale fitter."""

import json
import os
import socket
import threading

import numpy as np
import pytest

from gaussian_splatting_tpu.data import colmap as cm
from gaussian_splatting_tpu.data.depth_scale import make_depth_scales
from gaussian_splatting_tpu.viewer.network_gui import (
    ViewerServer,
    image_to_bytes,
    poll_viewer,
)


def _send_msg(sock, payload: dict):
    data = json.dumps(payload).encode("utf-8")
    sock.sendall(len(data).to_bytes(4, "little"))
    sock.sendall(data)


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        part = sock.recv(n - len(buf))
        assert part, "server closed"
        buf += part
    return buf


def test_viewer_roundtrip_loopback():
    """Client speaks the reference SIBR protocol; server renders + replies."""
    server = ViewerServer("127.0.0.1", 0)
    port = server.listener.getsockname()[1]

    w, h = 8, 6
    view = np.eye(4, dtype=np.float32)
    proj = np.eye(4, dtype=np.float32)
    msg = {
        "resolution_x": w,
        "resolution_y": h,
        "train": True,
        "fov_y": 0.8,
        "fov_x": 1.0,
        "z_near": 0.01,
        "z_far": 100.0,
        "shs_python": False,
        "rot_scale_python": False,
        "keep_alive": False,
        "scaling_modifier": 1.0,
        "view_matrix": view.flatten().tolist(),
        "view_projection_matrix": proj.flatten().tolist(),
    }

    received = {}

    def client():
        sock = socket.create_connection(("127.0.0.1", port), timeout=5)
        _send_msg(sock, msg)
        received["image"] = _recv_exact(sock, w * h * 3)
        vlen = int.from_bytes(_recv_exact(sock, 4), "little")
        received["verify"] = _recv_exact(sock, vlen).decode("ascii")
        sock.close()

    t = threading.Thread(target=client)
    t.start()

    rendered = {}

    def render_fn(cam, scaling_modifier):
        rendered["cam"] = cam
        rendered["sm"] = scaling_modifier
        return np.full((3, cam.height, cam.width), 0.5, np.float32)

    # poll until the client connects and one frame is served
    import time

    for _ in range(100):
        poll_viewer(server, render_fn, "/data/scene", 1, 100)
        if "cam" in rendered:
            break
        time.sleep(0.05)
    t.join(timeout=5)
    server.close()

    assert rendered["cam"].width == w and rendered["cam"].height == h
    assert rendered["sm"] == 1.0
    img = np.frombuffer(received["image"], np.uint8).reshape(h, w, 3)
    assert (img == 127).all()  # 0.5 * 255 = 127.5 -> cast 127
    assert received["verify"] == "/data/scene"

    # matrix convention: identity message with col 1,2 flips -> our view
    cam = rendered["cam"]
    expected_view = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    np.testing.assert_allclose(cam.viewmatrix, expected_view)


def test_depth_scale_fit(tmp_path):
    """Synthetic scene: known affine between colmap and mono inverse depth."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    w, h = 32, 24
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    depths = tmp_path / "depths"
    depths.mkdir()

    # camera at origin looking +z, f=30
    cams = {1: cm.ColmapCamera(1, "SIMPLE_PINHOLE", w, h, np.array([30.0, w / 2, h / 2]))}

    # points in front of the camera with depth 2..10
    n = 64
    z = rng.uniform(2.0, 10.0, n)
    x = rng.uniform(-0.5, 0.5, n) * z
    y = rng.uniform(-0.3, 0.3, n) * z
    xyz = np.stack([x, y, z], axis=-1)
    px = 30.0 * x / z + w / 2
    py = 30.0 * y / z + h / 2

    true_scale, true_offset = 3.0, 0.05
    inv_mono_vals = (1.0 / z - true_offset) / true_scale

    # dense mono inverse-depth map: nearest-fill from the sparse samples
    mono = np.zeros((h, w), np.float32)
    for i in range(n):
        xi = int(np.clip(round(px[i]), 0, w - 1))
        yi = int(np.clip(round(py[i]), 0, h - 1))
        mono[yi, xi] = inv_mono_vals[i]
    # write only exact-pixel observations so the bilinear sample is exact
    keep = (np.abs(px - np.round(px)) < 1e-6) | True
    png = (mono * (2**16)).astype(np.uint16)
    cv2.imwrite(str(depths / "im0.png"), png)

    images = {
        1: cm.ColmapImage(
            1,
            np.array([1.0, 0, 0, 0]),
            np.zeros(3),
            1,
            "im0.jpg",
            np.stack([np.round(px), np.round(py)], -1).astype(np.float64),
            np.arange(1, n + 1, dtype=np.int64),
        )
    }
    cm.write_cameras_binary(str(sparse / "cameras.bin"), cams)
    # write images with 2D points: need manual write since writer skips them
    import struct

    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        im = images[1]
        f.write(struct.pack("<i", im.id))
        f.write(struct.pack("<4d", *im.qvec))
        f.write(struct.pack("<3d", *im.tvec))
        f.write(struct.pack("<i", im.camera_id))
        f.write(im.name.encode() + b"\x00")
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<2dq", im.xys[i, 0], im.xys[i, 1], im.point3d_ids[i]))
    cm.write_points3d_binary(str(sparse / "points3D.bin"), xyz, np.full((n, 3), 128.0))

    params = make_depth_scales(str(tmp_path), str(depths), jobs=1)
    assert "im0" in params
    got = params["im0"]
    # the quantized PNG + nearest-pixel placement adds noise; the robust fit
    # should still land near the true affine
    assert got["scale"] == pytest.approx(true_scale, rel=0.25)
    assert got["offset"] == pytest.approx(true_offset, abs=0.05)


def test_colmap_points2d_roundtrip(tmp_path):
    path = tmp_path / "images.bin"
    import struct

    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
        f.write(struct.pack("<3d", 0.1, 0.2, 0.3))
        f.write(struct.pack("<i", 1))
        f.write(b"img.png\x00")
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<2dq", 1.5, 2.5, 42))
        f.write(struct.pack("<2dq", 3.5, 4.5, -1))
    images = cm.read_images_binary(str(path), load_points2d=True)
    im = images[7]
    np.testing.assert_allclose(im.xys, [[1.5, 2.5], [3.5, 4.5]])
    np.testing.assert_array_equal(im.point3d_ids, [42, -1])


def test_raster_state_persist_roundtrip(tmp_path):
    """save_raster_state/load_raster_state: eval seeds the trained slack
    (only ever raising it), and a missing file leaves the config alone."""
    from gaussian_splatting_tpu.config import RasterizeConfig
    from gaussian_splatting_tpu.train.loop import (
        load_raster_state,
        save_raster_state,
    )

    cfg = RasterizeConfig()
    # missing file: unchanged
    assert load_raster_state(str(tmp_path), cfg) == cfg

    trained = RasterizeConfig(instance_slack=9.25)
    save_raster_state(str(tmp_path), trained, capacity=69_120)
    seeded = load_raster_state(str(tmp_path), cfg)
    assert seeded.instance_slack == 9.25
    with open(os.path.join(str(tmp_path), "raster_state.json")) as f:
        rs = json.load(f)
    assert rs["capacity"] == 69_120

    # persisted value LOWER than the caller's config: keep the higher one
    low = RasterizeConfig(instance_slack=1.0)
    save_raster_state(str(tmp_path), low, capacity=128)
    assert load_raster_state(str(tmp_path), cfg).instance_slack == cfg.instance_slack
