"""Per-Gaussian view-dependent quadric math (pure jnp, differentiable).

TPU-native replacement for the reference preprocess kernels:
- computeCov3D            (forward.cu:129-163)
- computeCov2D + dilation (forward.cu:74-124)
- computeView2Gaussian    (forward.cu:168-279)
- preprocessCUDA          (forward.cu:282-404)

Because these are pure jnp functions, their backward passes
(backward.cu:380-631, computeView2Gaussian_backward etc.) come from jax.grad
for free.

Numerics: the reference evaluates the ray-Gaussian quadratic
G(t) = AA t^2 + BB t + CC from 10 cached floats [Sigma(6), B(3), C(1)] and
needs float64 for AA/BB (forward.cu:511-522) because CC - BB^2/(4 AA) suffers
catastrophic cancellation. TPUs have no fast f64, so we cache the factored
form instead: M = S^-1 Q (view->unit-Gaussian linear map) and u0 = S^-1 t2
(camera origin in unit-Gaussian space). Along a pixel ray r (view space,
z=1), with d = M r:

    t*        = -(u0 . d) / (d . d)          (depth of the Gaussian peak)
    min_value = |u0 + t* d|^2                 (= CC - BB^2/(4 AA), but
                                               computed as a residual norm,
                                               cancellation-free in f32)
    normal    = M^T d                          (= Sigma_v2g @ ray_point)

which is exactly the same mathematical object, stably evaluated in f32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import sh as sh_lib
from ..constants import FRUSTUM_NEAR


def _rot_comps(rotation: jnp.ndarray):
    """Normalized-quaternion rotation matrix as 9 elementwise components.

    Batched [P, 3, 3] matmul chains lower to padded tiny MXU dots on TPU
    (measured ~80 ms for the preprocess VJP at 1M gaussians); keeping every
    intermediate [P]-shaped keeps forward AND jax.grad backward purely on
    the VPU elementwise path.
    """
    q = rotation / (jnp.linalg.norm(rotation, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)),
    )


def cov3d_from_scaling_rotation(scaling: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """World covariance Sigma = R S^2 R^T, upper triangle (..., 6).

    Matches computeCov3D (forward.cu:129-163) / build_covariance_from_scaling
    _rotation (gaussian_model.py:77-82). `rotation` is a (w,x,y,z) quaternion.
    """
    R = _rot_comps(rotation)
    s2 = (scaling[..., 0] ** 2, scaling[..., 1] ** 2, scaling[..., 2] ** 2)

    def sig(i, k):
        return (R[i][0] * R[k][0] * s2[0] + R[i][1] * R[k][1] * s2[1]
                + R[i][2] * R[k][2] * s2[2])

    return jnp.stack(
        [sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)],
        axis=-1,
    )


class View2Gaussian(NamedTuple):
    """Factored view->unit-Gaussian transform (see module docstring)."""

    M: jnp.ndarray  # (..., 3, 3) = S^-1 Q, Q = view->gaussian rotation
    u0: jnp.ndarray  # (..., 3) camera origin in unit-Gaussian coordinates


def view_to_gaussian(
    mean: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation: jnp.ndarray,
    world_view: jnp.ndarray,
) -> View2Gaussian:
    """Per-Gaussian factored quadric transform.

    Equivalent information content to computeView2Gaussian
    (forward.cu:168-279): the reference caches [Sigma_v2g(6), B(3), C(1)]
    where Sigma_v2g = M^T M, B = M^T u0, C = u0 . u0. The reference adds 1e-7
    to s^2 when inverting (forward.cu:255); we match by using
    s_eff = sqrt(s^2 + 1e-7).

    All math is componentwise [P]-vector arithmetic (see _rot_comps).
    """
    Rg = _rot_comps(rotation)  # gaussian -> world
    W = world_view[..., :3, :3]
    tvec = world_view[..., :3, 3]
    # R_g2v = W @ R_g2w (W entries are per-camera scalars)
    Rv = tuple(
        tuple(
            W[..., i, 0] * Rg[0][j] + W[..., i, 1] * Rg[1][j] + W[..., i, 2] * Rg[2][j]
            for j in range(3)
        )
        for i in range(3)
    )
    mx, my, mz = mean[..., 0], mean[..., 1], mean[..., 2]
    tg = tuple(
        W[..., i, 0] * mx + W[..., i, 1] * my + W[..., i, 2] * mz + tvec[..., i]
        for i in range(3)
    )
    # Q = R_g2v^T (view -> gaussian); t2 = -(Q @ t_g2v)
    s_eff = jnp.sqrt(scaling * scaling + 1e-7)
    se = (s_eff[..., 0], s_eff[..., 1], s_eff[..., 2])
    # M = S^-1 Q: M[i][j] = Rv[j][i] / s_eff[i]
    M = jnp.stack(
        [jnp.stack([Rv[j][i] / se[i] for j in range(3)], axis=-1)
         for i in range(3)],
        axis=-2,
    )
    u0 = jnp.stack(
        [-(Rv[0][i] * tg[0] + Rv[1][i] * tg[1] + Rv[2][i] * tg[2]) / se[i]
         for i in range(3)],
        axis=-1,
    )
    return View2Gaussian(M=M, u0=u0)


def v2g_ten_floats(v2g: View2Gaussian) -> jnp.ndarray:
    """The reference's 10-float packing [Sigma(6), B(3), C(1)] of the quadric
    (forward.cu:268-277). Used for cross-checks only."""
    M, u0 = v2g.M, v2g.u0
    S = jnp.swapaxes(M, -1, -2) @ M
    B = (jnp.swapaxes(M, -1, -2) @ u0[..., None])[..., 0]
    C = jnp.sum(u0 * u0, axis=-1)
    return jnp.concatenate(
        [
            jnp.stack(
                [S[..., 0, 0], S[..., 0, 1], S[..., 0, 2], S[..., 1, 1], S[..., 1, 2], S[..., 2, 2]],
                axis=-1,
            ),
            B,
            C[..., None],
        ],
        axis=-1,
    )


def ray_gaussian_peak(v2g_M: jnp.ndarray, v2g_u0: jnp.ndarray, ray: jnp.ndarray):
    """Peak of a 3D Gaussian along view-space rays.

    Args:
      v2g_M: (..., 3, 3); v2g_u0: (..., 3); ray: (..., 3) with ray[...,2]=1
        ((pix+0.5-W/2)/fx, (pix+0.5-H/2)/fy, 1), forward.cu:448.

    Returns:
      t: depth of the Gaussian maximum along the ray (forward.cu:516).
      min_value: quadratic value at the peak (>= 0), forward.cu:522.
      normal: un-normalized view-space normal Sigma_v2g @ ray
        (forward.cu:504-508).

    Broadcasting: leading dims of M/u0 and ray broadcast against each other.
    """
    d = jnp.einsum("...ij,...j->...i", v2g_M, ray)
    dd = jnp.sum(d * d, axis=-1)
    ud = jnp.sum(v2g_u0 * d, axis=-1)
    t = -ud / (dd + 1e-12)
    v = v2g_u0 + t[..., None] * d
    min_value = jnp.sum(v * v, axis=-1)
    normal = jnp.einsum("...ji,...j->...i", v2g_M, d)
    return t, min_value, normal


def cov2d_ewa(
    mean: jnp.ndarray,
    cov3d: jnp.ndarray,
    world_view: jnp.ndarray,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
    kernel_size,
):
    """EWA-splatted 2D covariance with Mip-Splatting dilation.

    Matches computeCov2D (forward.cu:74-124): clamps the view-space point to
    1.3x the FoV frustum, applies the projective Jacobian, adds `kernel_size`
    to the diagonal, and returns the opacity compensation
    coef = sqrt(det0 / det1) packed alongside.

    Returns (cov2d (...,3) [xx, xy, yy] dilated, coef (...,)).
    """
    W = world_view[..., :3, :3]
    tvec = world_view[..., :3, 3]
    mx, my, mz = mean[..., 0], mean[..., 1], mean[..., 2]
    pv = tuple(
        W[..., i, 0] * mx + W[..., i, 1] * my + W[..., i, 2] * mz + tvec[..., i]
        for i in range(3)
    )
    tz = pv[2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(pv[0] / tz, -limx, limx) * tz
    ty = jnp.clip(pv[1] / tz, -limy, limy) * tz

    # J = [[fx/tz, 0, -fx tx/tz^2], [0, fy/tz, -fy ty/tz^2]]
    inv_tz = 1.0 / tz
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz * inv_tz
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz * inv_tz

    # Rows of A = J @ W (2x3), componentwise
    a0 = tuple(j00 * W[..., 0, k] + j02 * W[..., 2, k] for k in range(3))
    a1 = tuple(j11 * W[..., 1, k] + j12 * W[..., 2, k] for k in range(3))

    # a^T Sigma b from the 6-vector (componentwise, no [P, 3, 3] tensors)
    c = cov3d
    s0, s1c, s2c = c[..., 0], c[..., 1], c[..., 2]
    s3, s4, s5 = c[..., 3], c[..., 4], c[..., 5]

    def quad(a, b):
        return (a[0] * b[0] * s0 + a[1] * b[1] * s3 + a[2] * b[2] * s5
                + (a[0] * b[1] + a[1] * b[0]) * s1c
                + (a[0] * b[2] + a[2] * b[0]) * s2c
                + (a[1] * b[2] + a[2] * b[1]) * s4)

    cxx = quad(a0, a0)
    cxy = quad(a0, a1)
    cyy = quad(a1, a1)

    det0 = jnp.maximum(1e-6, cxx * cyy - cxy * cxy)
    det1 = jnp.maximum(1e-6, (cxx + kernel_size) * (cyy + kernel_size) - cxy * cxy)
    coef = jnp.sqrt(det0 / (det1 + 1e-6) + 1e-6)
    raw_det0 = cxx * cyy - cxy * cxy
    raw_det1 = (cxx + kernel_size) * (cyy + kernel_size) - cxy * cxy
    coef = jnp.where((raw_det0 <= 1e-6) | (raw_det1 <= 1e-6), 0.0, coef)
    cov2d = jnp.stack([cxx + kernel_size, cxy, cyy + kernel_size], axis=-1)
    return cov2d, coef


class PreprocessOut(NamedTuple):
    """Dense per-Gaussian preprocess results (all arrays shaped (P, ...))."""

    valid: jnp.ndarray  # bool: in frustum, non-degenerate, radius > 0
    depth: jnp.ndarray  # view-space z
    mean2d: jnp.ndarray  # (P, 2) continuous pixel coordinates
    conic: jnp.ndarray  # (P, 3) inverse dilated 2D covariance [a, b, c]
    coef: jnp.ndarray  # mip-splatting opacity compensation
    radius: jnp.ndarray  # 3-sigma screen radius in pixels (float, ceil'ed)
    radius_xy: jnp.ndarray  # (P, 2) per-axis bbox half-extents (<= radius)
    rgb: jnp.ndarray  # (P, 3) SH-evaluated colors
    v2g_M: jnp.ndarray  # (P, 3, 3)
    v2g_u0: jnp.ndarray  # (P, 3)


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    shs: jnp.ndarray,
    sh_degree: int,
    camera,
    kernel_size,
    active_mask: jnp.ndarray | None = None,
    opacities: jnp.ndarray | None = None,
) -> PreprocessOut:
    """Vectorized per-Gaussian preprocessing (preprocessCUDA, forward.cu:282-404).

    Args:
      means3d: (P, 3); scales: (P, 3) (already 3D-filtered by the model);
      rotations: (P, 4) wxyz; shs: (P, K, 3); sh_degree: static int;
      camera: cameras.Camera; kernel_size: 2D dilation (ModelParams
        kernel_size, arguments/__init__.py:59);
      active_mask: (P,) validity of padded parameter slots.
    """
    W, H = camera.width, camera.height
    wv = camera.world_view
    mx, my, mz = means3d[..., 0], means3d[..., 1], means3d[..., 2]
    depth = wv[2, 0] * mx + wv[2, 1] * my + wv[2, 2] * mz + wv[2, 3]
    in_front = depth > FRUSTUM_NEAR  # auxiliary.h:177-202

    from ..transforms import ndc_to_pixel

    # transformPoint4x4 + w-division (forward.cu:328-331), componentwise
    fp = camera.full_proj
    pw = fp[3, 0] * mx + fp[3, 1] * my + fp[3, 2] * mz + fp[3, 3] + 1e-7
    ndc_x = (fp[0, 0] * mx + fp[0, 1] * my + fp[0, 2] * mz + fp[0, 3]) / pw
    ndc_y = (fp[1, 0] * mx + fp[1, 1] * my + fp[1, 2] * mz + fp[1, 3]) / pw
    mean2d = jnp.stack(
        [ndc_to_pixel(ndc_x, W), ndc_to_pixel(ndc_y, H)], axis=-1
    )

    cov3d = cov3d_from_scaling_rotation(scales, rotations)
    cov2d, coef = cov2d_ewa(
        means3d, cov3d, wv, camera.focal_x, camera.focal_y, camera.tan_fovx, camera.tan_fovy, kernel_size
    )
    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
    nondegenerate = det != 0.0
    det_inv = 1.0 / jnp.where(nondegenerate, det, 1.0)
    conic = jnp.stack(
        [cov2d[..., 2] * det_inv, -cov2d[..., 1] * det_inv, cov2d[..., 0] * det_inv], axis=-1
    )
    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    # The reference bins at a fixed 3-sigma radius (forward.cu:363-367). When
    # opacities are supplied we tighten to the exact radius where
    # alpha = op * exp(-r^2/2) falls below the 1/255 blend cutoff — identical
    # output (sub-cutoff contributions are zeroed anyway), fewer keys.
    if opacities is not None:
        nsig = jnp.sqrt(2.0 * jnp.log(jnp.maximum(opacities * coef * 255.0, 1.001)))
        nsig = jnp.minimum(nsig, 3.0)
    else:
        nsig = jnp.full_like(lambda1, 3.0)
    radius = jnp.ceil(nsig * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))
    # Per-axis bbox half-extents: for the (dilated) 2D gaussian the marginal
    # bound power <= -0.5 dx^2 / cov_xx holds (Schur complement), so outside
    # the ellipse-aligned bbox alpha is below the 1/255 cutoff. Strictly
    # tighter than the circumscribed circle for anisotropic gaussians.
    radius_xy = jnp.ceil(
        nsig[..., None]
        * jnp.sqrt(jnp.maximum(cov2d[..., jnp.array([0, 2])], 1e-12))
    )

    rgb = sh_lib.sh_to_rgb(sh_degree, shs, means3d, camera.cam_center)
    v2g = view_to_gaussian(means3d, scales, rotations, wv)

    valid = in_front & nondegenerate & (radius > 0)
    if active_mask is not None:
        valid = valid & active_mask
    return PreprocessOut(
        valid=valid,
        depth=depth,
        mean2d=mean2d,
        conic=conic,
        coef=coef,
        radius=radius,
        radius_xy=radius_xy,
        rgb=rgb,
        v2g_M=v2g.M,
        v2g_u0=v2g.u0,
    )
