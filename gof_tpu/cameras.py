"""Camera pytree.

Replaces scene/cameras.py:17-78 of the reference. A `Camera` is a jit-friendly
pytree: image size is static metadata, pose/projection are arrays so cameras
can be stacked and vmapped/sharded over (the reference keeps one nn.Module per
camera; we keep one struct whose leaves batch naturally).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from . import transforms
from .constants import CAMERA_ZFAR, CAMERA_ZNEAR


@struct.dataclass
class Camera:
    # --- static (hashable) metadata ---
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    # --- array leaves (batchable) ---
    world_view: jnp.ndarray  # (4,4) world -> view
    full_proj: jnp.ndarray  # (4,4) proj @ world_view
    cam_center: jnp.ndarray  # (3,) camera position in world space
    tan_fovx: jnp.ndarray  # scalar
    tan_fovy: jnp.ndarray  # scalar
    # per-camera id used by the decoupled appearance embedding (train.py:67-88)
    uid: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.height / (2.0 * self.tan_fovy)


def make_camera(
    R: np.ndarray,
    t: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    uid: int = 0,
    znear: float = CAMERA_ZNEAR,
    zfar: float = CAMERA_ZFAR,
) -> Camera:
    """Build a Camera from COLMAP-convention (R, t) + FoVs.

    Matches the matrix assembly of scene/cameras.py:50-64 (but stores plain
    row-major matrices: p_view = world_view @ [p,1]).
    """
    w2v = transforms.world_to_view(R, t)
    proj = transforms.projection_matrix(znear, zfar, fovx, fovy)
    full = (proj @ w2v).astype(np.float32)
    cam_center = np.linalg.inv(w2v)[:3, 3].astype(np.float32)
    return Camera(
        width=int(width),
        height=int(height),
        world_view=jnp.asarray(w2v),
        full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(cam_center),
        tan_fovx=jnp.asarray(np.tan(fovx / 2), jnp.float32),
        tan_fovy=jnp.asarray(np.tan(fovy / 2), jnp.float32),
        uid=jnp.asarray(uid, jnp.int32),
    )


def look_at_camera(
    eye,
    target,
    up=(0.0, 1.0, 0.0),
    fovx: float = 0.8,
    fovy: Optional[float] = None,
    width: int = 128,
    height: int = 128,
    uid: int = 0,
) -> Camera:
    """Convenience constructor for tests/synthetic scenes."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # camera-to-world rotation: columns = (right, down, forward) so that +z
    # looks at the target (COLMAP convention: x right, y down, z forward).
    R = np.stack([right, down, fwd], axis=1)
    t = -R.T @ eye
    if fovy is None:
        fovy = 2 * np.arctan(np.tan(fovx / 2) * height / width)
    return make_camera(R, t, fovx, fovy, width, height, uid=uid)
