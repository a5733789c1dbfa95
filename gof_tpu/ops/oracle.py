"""Dense oracle renderer — the mathematical spec of the rasterizer.

Evaluates every (Gaussian, pixel) pair with no tile culling: O(P * pixels),
usable only for small test scenes. This plays the role the reference's Python
fallback switches play (gaussian_renderer/__init__.py:67-96,
gaussian_model.py:199-260): a golden implementation the fast kernels are
tested against, and — because it is pure jnp — a source of autodiff gradients
to cross-check the hand-written Pallas backward.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import blend, quadrics


class OracleOut(NamedTuple):
    image: jnp.ndarray  # [9, H, W]
    transmittance: jnp.ndarray  # [H, W] final T
    depth_ndc_sum: jnp.ndarray  # [H, W] final dist1 (sum w * m)


def render_oracle(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    sh_degree: int,
    camera,
    kernel_size: float,
    bg: jnp.ndarray,
    active_mask: jnp.ndarray | None = None,
) -> OracleOut:
    """Render with every valid Gaussian contributing to every pixel.

    `scales`/`opacities` are the 3D-filtered values (the model applies the
    mip-splatting filter before rasterization, gaussian_model.py:156-194).
    """
    H, W = camera.height, camera.width
    pre = quadrics.preprocess(
        means3d, scales, rotations, shs, sh_degree, camera, kernel_size, active_mask
    )
    # Depth-sort all Gaussians (invalid ones to the back with zero alpha).
    order = jnp.argsort(jnp.where(pre.valid, pre.depth, jnp.inf))
    valid = pre.valid[order]
    # The 2D-dilation compensation coef is detached in the reference (its
    # cov2D backward is disabled, backward.cu:991-1007).
    op = opacities[order] * jnp.where(valid, _sg(pre.coef[order]), 0.0)
    M = pre.v2g_M[order]
    u0 = pre.v2g_u0[order]
    colors = pre.rgb[order]

    rx, ry = blend.pixel_rays(W, H, camera.focal_x, camera.focal_y)
    rx = rx.reshape(1, -1)
    ry = ry.reshape(1, -1)

    terms = blend.ray_terms(
        M[:, 0, 0, None], M[:, 0, 1, None], M[:, 0, 2, None],
        M[:, 1, 0, None], M[:, 1, 1, None], M[:, 1, 2, None],
        M[:, 2, 0, None], M[:, 2, 1, None], M[:, 2, 2, None],
        u0[:, 0, None], u0[:, 1, None], u0[:, 2, None],
        op[:, None],
        rx, ry,
    )
    carry = blend.init_carry(H * W)
    carry = blend.blend_chunk(carry, terms, colors)
    image = blend.finalize(carry, bg)
    return OracleOut(
        image=image.reshape(9, H, W),
        transmittance=carry.transmittance.reshape(H, W),
        depth_ndc_sum=carry.dist1.reshape(H, W),
    )


def _sg(x):
    import jax

    return jax.lax.stop_gradient(x)
