"""Shared ray-Gaussian blend math.

The same pure-jnp helpers are used by three implementations:
  1. the dense oracle renderer (ops/oracle.py) — O(P * pixels), the spec;
  2. the chunked lax.scan tiled renderer (CPU-testable);
  3. the Pallas TPU kernels (ops/rasterize_pallas.py) — the production path.

Semantics follow renderCUDA (forward.cu:409-612) with one documented
deviation: the CUDA kernel's early termination freezes a pixel the first time
T*(1-alpha) < 1e-4 (forward.cu:536-541); we instead zero every contribution
once transmittance has fallen below that threshold (a chunk-shape-independent
formulation). The two differ only in weights below 1e-4.

TPU view: alpha for a whole [G, PIX] block is computed in parallel on the VPU
(no per-Gaussian serial chain — blending order only enters through cumulative
products/sums along G, which are associative scans).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import (
    ALPHA_MAX,
    ALPHA_MIN,
    FAR_PLANE,
    MEDIAN_THRESHOLD,
    NEAR_PLANE,
    TRANSMITTANCE_EPS,
)


def pixel_rays(width: int, height: int, focal_x, focal_y):
    """View-space ray xy slopes for every pixel (forward.cu:448).

    ray = ((px + 0.5 - W/2) / fx, (py + 0.5 - H/2) / fy, 1).
    Returns rx, ry each shaped (H, W).
    """
    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    py = jnp.arange(height, dtype=jnp.float32) + 0.5
    rx = (px[None, :] - width / 2.0) / focal_x
    ry = (py[:, None] - height / 2.0) / focal_y
    return jnp.broadcast_to(rx, (height, width)), jnp.broadcast_to(ry, (height, width))


def ndc_depth(t):
    """2DGS NDC depth mapping (forward.cu:543-545).

    Clamped below at NEAR_PLANE: the reference only evaluates this for
    contributing Gaussians (t > NEAR_PLANE); padded/masked entries here have
    w == 0, and clamping keeps 0 * m finite.
    """
    t = jnp.maximum(t, NEAR_PLANE)
    return (FAR_PLANE * t - FAR_PLANE * NEAR_PLANE) / ((FAR_PLANE - NEAR_PLANE) * t)


class RayTerms(NamedTuple):
    """Per-(Gaussian, pixel) blend quantities, each [G, PIX]."""

    alpha: jnp.ndarray  # masked, clamped alpha
    t: jnp.ndarray  # depth of the Gaussian peak along the ray
    n0: jnp.ndarray  # normalized, negated view-space normal components
    n1: jnp.ndarray
    n2: jnp.ndarray


def ray_terms(
    m00, m01, m02, m10, m11, m12, m20, m21, m22,
    u0x, u0y, u0z, op,
    rx, ry,
) -> RayTerms:
    """Alpha / depth / normal for a block of Gaussians x pixels.

    All Gaussian params are broadcastable to [G, 1]; rx/ry to [1, PIX].
    Implements forward.cu:502-541 via the factored (M, u0) quadric
    (see ops/quadrics.py docstring): d = M r, t = -(u0.d)/(d.d),
    min_value = |u0 + t d|^2, normal = M^T d.
    """
    # d = M @ (rx, ry, 1)
    d0 = m00 * rx + m01 * ry + m02
    d1 = m10 * rx + m11 * ry + m12
    d2 = m20 * rx + m21 * ry + m22
    dd = d0 * d0 + d1 * d1 + d2 * d2
    ud = u0x * d0 + u0y * d1 + u0z * d2
    t = -ud / (dd + 1e-12)
    v0 = u0x + t * d0
    v1 = u0y + t * d1
    v2 = u0z + t * d2
    min_value = v0 * v0 + v1 * v1 + v2 * v2
    # min_value >= 0 by construction, so the reference's power<=0 clamp
    # (forward.cu:524-527) is automatic.
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(-0.5 * min_value))
    alpha = jnp.where((t > NEAR_PLANE) & (alpha >= ALPHA_MIN), alpha, 0.0)

    # normal = M^T d, negated + normalized (forward.cu:504-508, 548-549)
    n0 = m00 * d0 + m10 * d1 + m20 * d2
    n1 = m01 * d0 + m11 * d1 + m21 * d2
    n2 = m02 * d0 + m12 * d1 + m22 * d2
    inv_len = 1.0 / jnp.sqrt(n0 * n0 + n1 * n1 + n2 * n2 + 1e-7)
    return RayTerms(alpha=alpha, t=t, n0=-n0 * inv_len, n1=-n1 * inv_len, n2=-n2 * inv_len)


class BlendCarry(NamedTuple):
    """Per-pixel running state across Gaussian chunks, each [PIX].

    Note: unlike the reference's streaming distortion accumulation
    (forward.cu:551-557), the pairwise depth distortion has the closed form

        D = sum_{j<i} w_i w_j (m_i - m_j)^2 = (sum w)(sum w m^2) - (sum w m)^2

    so only the three totals are carried; no order-dependent running error
    term is needed. Algebraically identical, and it removes every cumulative
    sum from the hot loop.
    """

    transmittance: jnp.ndarray  # prod(1 - alpha) so far
    acc_alpha: jnp.ndarray  # sum of weights
    rgb: jnp.ndarray  # [3, PIX]
    normal: jnp.ndarray  # [3, PIX]
    depth: jnp.ndarray  # median depth (last t while T > 0.5)
    dist1: jnp.ndarray  # sum w * m
    dist2: jnp.ndarray  # sum w * m^2


def init_carry(npix: int, dtype=jnp.float32) -> BlendCarry:
    z = jnp.zeros((npix,), dtype)
    return BlendCarry(
        transmittance=jnp.ones((npix,), dtype),
        acc_alpha=z,
        rgb=jnp.zeros((3, npix), dtype),
        normal=jnp.zeros((3, npix), dtype),
        depth=z,
        dist1=z,
        dist2=z,
    )


def blend_chunk(carry: BlendCarry, terms: RayTerms, colors: jnp.ndarray) -> BlendCarry:
    """Blend one depth-ordered chunk of Gaussians into the carry.

    Args:
      terms: RayTerms with [G, PIX] fields (alpha already masked).
      colors: [G, 3] per-Gaussian RGB.

    Pure jnp; cumulative ops along G are jnp.cumprod/cumsum (the Pallas kernel
    re-implements only those with log-depth doubling).
    """
    a = terms.alpha
    one_minus = 1.0 - a
    prod_incl = jnp.cumprod(one_minus, axis=0)
    T = carry.transmittance[None, :] * jnp.concatenate(
        [jnp.ones_like(prod_incl[:1]), prod_incl[:-1]], axis=0
    )  # exclusive prefix transmittance per Gaussian
    w = a * T * (T > TRANSMITTANCE_EPS)

    m = ndc_depth(terms.t)
    wm = w * m
    wmm = wm * m

    rgb = carry.rgb + colors.T @ w  # [3, G] @ [G, PIX] — MXU
    nrm = carry.normal + jnp.stack(
        [
            jnp.sum(terms.n0 * w, axis=0),
            jnp.sum(terms.n1 * w, axis=0),
            jnp.sum(terms.n2 * w, axis=0),
        ]
    )

    # median depth: t of the LAST contributing Gaussian with T > 0.5
    # (forward.cu:568-571)
    med_mask = (a > 0) & (T > MEDIAN_THRESHOLD)
    g_idx = jnp.arange(a.shape[0], dtype=jnp.int32)[:, None]
    last_idx = jnp.max(jnp.where(med_mask, g_idx, -1), axis=0)  # [PIX]
    any_med = last_idx >= 0
    onehot = (g_idx == last_idx[None, :]) & med_mask
    chunk_depth = jnp.sum(jnp.where(onehot, terms.t, 0.0), axis=0)
    depth = jnp.where(any_med, chunk_depth, carry.depth)

    return BlendCarry(
        transmittance=carry.transmittance * prod_incl[-1],
        acc_alpha=carry.acc_alpha + jnp.sum(w, axis=0),
        rgb=rgb,
        normal=nrm,
        depth=depth,
        dist1=carry.dist1 + jnp.sum(wm, axis=0),
        dist2=carry.dist2 + jnp.sum(wmm, axis=0),
    )


def finalize(carry: BlendCarry, bg: jnp.ndarray) -> jnp.ndarray:
    """Assemble the 9-channel output [9, PIX] (forward.cu:584-611).

    distortion_raw = (sum w)(sum w m^2) - (sum w m)^2 (closed form of the
    reference's streaming pairwise accumulation), then normalized by
    (1 - T)^2 + 1e-7 as in forward.cu:589.
    """
    T = carry.transmittance
    rgb = carry.rgb + T[None, :] * bg[:, None]
    distortion_raw = carry.acc_alpha * carry.dist2 - carry.dist1 * carry.dist1
    distortion = distortion_raw / ((1.0 - T) ** 2 + 1e-7)
    return jnp.concatenate(
        [
            rgb,
            carry.normal,
            carry.depth[None, :],
            carry.acc_alpha[None, :],
            distortion[None, :],
        ],
        axis=0,
    )
