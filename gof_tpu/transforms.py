"""Camera and rigid-body transforms (pure jnp, fully differentiable).

Replaces the reference's utils/graphics_utils.py:30-70 and
utils/general_utils.py:76-109. Conventions:

- quaternions are (w, x, y, z), normalized by the caller or by `quat_to_rot`;
- all matrices are standard math convention: `p_view = w2v @ [p, 1]`. The
  reference stores torch-transposed matrices so column-major CUDA code can
  index them (scene/cameras.py:57-61); we keep plain row-major math and
  transpose nothing.
- world covariance Sigma = R S^2 R^T, i.e. columns of R are Gaussian axes
  (matches utils/general_utils.py:76-109 + forward.cu:129-163).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) (..., 4) (w,x,y,z) -> rotation matrices (..., 3, 3).

    Normalizes the quaternion first (reference normalizes in Python before
    the kernel, utils/general_utils.py:89-95).
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def world_to_view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """4x4 world->view matrix from COLMAP-convention (R, t).

    Matches getWorld2View2 (utils/graphics_utils.py:38-50) with zero
    translate/1.0 scale: Rt[:3,:3] = R^T, Rt[:3,3] = t.
    """
    w2v = np.eye(4, dtype=np.float32)
    w2v[:3, :3] = np.asarray(R, np.float32).T
    w2v[:3, 3] = np.asarray(t, np.float32)
    return w2v


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective projection, z_sign=+1.

    Matches getProjectionMatrix (utils/graphics_utils.py:52-70).
    """
    tan_half_y = math_tan(fovy / 2)
    tan_half_x = math_tan(fovx / 2)
    top = tan_half_y * znear
    bottom = -top
    right = tan_half_x * znear
    left = -right
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def math_tan(x):
    return np.tan(x)


def fov_to_focal(fov: float, pixels: float) -> float:
    """focal length in pixels from field of view (utils/graphics_utils.py:73-77)."""
    return pixels / (2.0 * np.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2.0 * np.arctan(pixels / (2.0 * focal))


def ndc_to_pixel(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC [-1,1] -> continuous pixel coordinate (auxiliary.h ndc2Pix)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def project_points(points: jnp.ndarray, full_proj: jnp.ndarray) -> jnp.ndarray:
    """Project (N,3) world points with a 4x4 proj@view matrix -> NDC (N,3).

    Matches transformPoint4x4 + w-division with the reference's 1e-7 guard
    (forward.cu:328-331).
    """
    ph = points @ full_proj[:3, :3].T + full_proj[:3, 3]
    pw = points @ full_proj[3, :3].T + full_proj[3, 3]
    return ph / (pw[..., None] + 1e-7)


def transform_points(points: jnp.ndarray, mat4: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid/affine transform to (N,3) points (no w-division)."""
    return points @ mat4[:3, :3].T + mat4[:3, 3]
