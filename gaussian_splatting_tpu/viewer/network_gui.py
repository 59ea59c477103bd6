"""Remote-viewer TCP bridge, wire-compatible with the SIBR gaussian viewer.

Speaks the reference protocol (gaussian_renderer/network_gui.py:24-86):

- non-blocking TCP listener; one client at a time,
- client -> trainer: 4-byte little-endian length prefix + UTF-8 JSON with
  ``resolution_x/y``, ``train``, ``fov_x/y``, ``z_near/z_far``,
  ``shs_python``, ``rot_scale_python``, ``keep_alive``, ``scaling_modifier``,
  ``view_matrix`` and ``view_projection_matrix`` (16 floats, row-major,
  torch row-vector convention with sign flips applied client-side),
- trainer -> client: raw HxWx3 uint8 RGB bytes (when a frame was rendered)
  followed by a 4-byte length-prefixed ASCII "verify" string (the dataset
  source path).

The matrix convention differs from this framework: the reference stores
transposed (row-vector) matrices for torch (scene/cameras.py:86-89), and
``receive`` negates view columns 1,2 and projection column 1
(network_gui.py:71-74).  ``_decode_camera`` applies the same flips and then
transposes into this framework's column-vector convention.
"""

from __future__ import annotations

import json
import socket
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from gaussian_splatting_tpu.ops.camera_math import CameraParams


@dataclass
class ViewerRequest:
    """One decoded GUI message (reference ``receive`` return tuple)."""

    cam: Optional[CameraParams]
    do_training: bool = True
    shs_python: bool = False
    rot_scale_python: bool = False
    keep_alive: bool = False
    scaling_modifier: float = 1.0


def _decode_camera(message: dict) -> Optional[CameraParams]:
    width = int(message["resolution_x"])
    height = int(message["resolution_y"])
    if width == 0 or height == 0:
        return None
    fovy = float(message["fov_y"])
    fovx = float(message["fov_x"])

    wvt = np.array(message["view_matrix"], np.float32).reshape(4, 4)
    wvt[:, 1] = -wvt[:, 1]
    wvt[:, 2] = -wvt[:, 2]
    fullproj = np.array(message["view_projection_matrix"], np.float32).reshape(4, 4)
    fullproj[:, 1] = -fullproj[:, 1]

    # torch row-vector convention -> column-vector convention
    viewmatrix = wvt.T
    projmatrix = fullproj.T
    campos = np.linalg.inv(viewmatrix)[:3, 3]
    return CameraParams(
        viewmatrix=viewmatrix,
        projmatrix=projmatrix,
        campos=campos.astype(np.float32),
        tan_fovx=float(np.tan(fovx * 0.5)),
        tan_fovy=float(np.tan(fovy * 0.5)),
        width=width,
        height=height,
    )


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        part = conn.recv(n - len(buf))
        if not part:
            raise ConnectionError("viewer client closed the connection")
        buf += part
    return buf


class ViewerServer:
    """Non-blocking listener + length-prefixed-JSON message loop."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host = host
        self.port = port
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    @property
    def connected(self) -> bool:
        return self.conn is not None

    def try_connect(self) -> bool:
        """Accept a pending client if any (network_gui.py:34-41)."""
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nViewer connected by {addr}")
            self.conn.settimeout(None)
            return True
        except (BlockingIOError, socket.timeout, OSError):
            return False

    def receive(self) -> ViewerRequest:
        """Block for one message from the connected client."""
        assert self.conn is not None
        length = int.from_bytes(_recv_exact(self.conn, 4), "little")
        message = json.loads(_recv_exact(self.conn, length).decode("utf-8"))
        cam = _decode_camera(message)
        if cam is None:
            return ViewerRequest(cam=None)
        return ViewerRequest(
            cam=cam,
            do_training=bool(message["train"]),
            shs_python=bool(message["shs_python"]),
            rot_scale_python=bool(message["rot_scale_python"]),
            keep_alive=bool(message["keep_alive"]),
            scaling_modifier=float(message["scaling_modifier"]),
        )

    def send(self, image_bytes: Optional[bytes], verify: str) -> None:
        """Send a rendered frame (raw RGB bytes) + verify string."""
        assert self.conn is not None
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def disconnect(self) -> None:
        if self.conn is not None:
            try:
                self.conn.close()
            except OSError:
                pass
            self.conn = None

    def close(self) -> None:
        self.disconnect()
        self.listener.close()


def image_to_bytes(image: np.ndarray) -> bytes:
    """(3, H, W) float [0,1] -> raw HxWx3 uint8 bytes (train.py:106-108)."""
    img = np.clip(np.asarray(image), 0.0, 1.0)
    return np.ascontiguousarray(
        (img * 255.0).astype(np.uint8).transpose(1, 2, 0)
    ).tobytes()


def poll_viewer(server: ViewerServer, render_fn, source_path: str, iteration: int,
                max_iterations: int) -> None:
    """One training-loop viewer poll (reference train.py:92-115).

    ``render_fn(cam, scaling_modifier) -> (3, H, W) float image``.  Serves
    frames until the client asks training to continue (or disconnects).
    """
    if server.conn is None:
        server.try_connect()
    while server.conn is not None:
        try:
            req = server.receive()
            image_bytes = None
            if req.cam is not None:
                image_bytes = image_to_bytes(render_fn(req.cam, req.scaling_modifier))
            server.send(image_bytes, source_path)
            if req.do_training and (iteration < max_iterations or not req.keep_alive):
                break
        except Exception:
            import traceback

            traceback.print_exc()
            server.disconnect()
