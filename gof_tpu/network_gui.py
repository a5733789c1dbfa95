"""Interactive network viewer hook.

Replaces gaussian_renderer/network_gui.py (the SIBR socket bridge, which the
reference fork itself keeps disabled, train.py:372-373). Protocol here is a
simple length-prefixed JSON request -> raw RGB reply:

  request:  uint32 n, then n bytes of JSON
            {"width": W, "height": H, "fovx": f, "fovy": f,
             "world_view": [[...4x4...]], "scaling_modifier": 1.0}
  reply:    uint32 len, then W*H*3 uint8 RGB bytes

Run the listener with `serve(...)` from a training/eval process, or use
`try_connect/receive/send` in a loop exactly like the reference's hook.
"""

from __future__ import annotations

import json
import socket
import struct
from typing import Callable, Optional

import numpy as np

_listener: Optional[socket.socket] = None
_conn: Optional[socket.socket] = None


def init(host: str = "127.0.0.1", port: int = 6009) -> None:
    global _listener
    _listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    _listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    _listener.bind((host, port))
    _listener.listen()
    _listener.settimeout(0)


def try_connect() -> bool:
    global _conn
    if _listener is None:
        return False
    try:
        _conn, _ = _listener.accept()
        _conn.settimeout(None)
        return True
    except (BlockingIOError, socket.timeout):
        return False


def _read_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client disconnected")
        buf += chunk
    return buf


def receive() -> Optional[dict]:
    """Blocking read of one camera request; None on disconnect."""
    global _conn
    if _conn is None:
        return None
    try:
        (n,) = struct.unpack("<I", _read_exact(_conn, 4))
        return json.loads(_read_exact(_conn, n).decode())
    except (ConnectionError, struct.error):
        _conn = None
        return None


def send(image_chw: np.ndarray) -> None:
    global _conn
    if _conn is None:
        return
    rgb = (np.clip(np.asarray(image_chw), 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
    payload = rgb.tobytes()
    try:
        _conn.sendall(struct.pack("<I", len(payload)) + payload)
    except (BrokenPipeError, ConnectionError):
        _conn = None


def camera_from_request(req: dict):
    """Build a Camera pytree from a viewer request (MiniCam analog)."""
    import jax.numpy as jnp

    from . import cameras as cameras_lib
    from .transforms import projection_matrix

    w2v = np.asarray(req["world_view"], np.float32)
    proj = projection_matrix(0.01, 100.0, req["fovx"], req["fovy"])
    full = (proj @ w2v).astype(np.float32)
    return cameras_lib.Camera(
        width=int(req["width"]), height=int(req["height"]),
        world_view=jnp.asarray(w2v), full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(np.linalg.inv(w2v)[:3, 3].astype(np.float32)),
        tan_fovx=jnp.asarray(np.tan(req["fovx"] / 2), jnp.float32),
        tan_fovy=jnp.asarray(np.tan(req["fovy"] / 2), jnp.float32),
    )


def serve(render_fn: Callable, host: str = "127.0.0.1", port: int = 6009) -> None:
    """Blocking serve loop: render_fn(camera) -> [3+, H, W] image."""
    init(host, port)
    print(f"network_gui listening on {host}:{port}")
    import time

    while True:
        if _conn is None:
            if not try_connect():
                time.sleep(0.05)
                continue
        req = receive()
        if req is None:
            continue
        cam = camera_from_request(req)
        send(render_fn(cam)[:3])
