"""Image losses: L1 and SSIM (11x11 Gaussian window).

Replaces utils/loss_utils.py:17-64. SSIM uses the same 11-tap Gaussian
(sigma 1.5) separable window with zero 'SAME' padding and the standard
C1/C2 stabilizers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


_WIN = _gaussian_window()


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Separable 11-tap Gaussian blur with zero SAME padding; x: [C, H, W]."""
    w = jnp.asarray(_WIN)
    C = x.shape[0]
    kh = jnp.broadcast_to(w[None, None, :, None], (C, 1, 11, 1))
    kw = jnp.broadcast_to(w[None, None, None, :], (C, 1, 1, 11))
    x4 = x[None]
    y = lax.conv_general_dilated(
        x4, kh, (1, 1), [(5, 5), (0, 0)], dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C, precision="highest",
    )
    y = lax.conv_general_dilated(
        y, kw, (1, 1), [(0, 0), (5, 5)], dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C, precision="highest",
    )
    return y[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM over [C, H, W] images in [0, 1]."""
    C1 = 0.01**2
    C2 = 0.03**2
    mu1 = _blur(img1)
    mu2 = _blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1) - mu1_sq
    sigma2_sq = _blur(img2 * img2) - mu2_sq
    sigma12 = _blur(img1 * img2) - mu12
    m = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(m)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB (utils/image_utils.py:14-18)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def edge_aware_distortion_map(gt_image: jnp.ndarray, distortion_map: jnp.ndarray) -> jnp.ndarray:
    """Down-weight the distortion map at image edges (the reference ships this
    as get_edge_aware_distortion_map, train.py:55-64, though its loop keeps it
    disabled)."""
    g = gt_image
    c = g[:, 1:-1, 1:-1]
    grads = jnp.stack(
        [
            jnp.mean(jnp.abs(c - g[:, 1:-1, :-2]), axis=0),
            jnp.mean(jnp.abs(c - g[:, 1:-1, 2:]), axis=0),
            jnp.mean(jnp.abs(c - g[:, :-2, 1:-1]), axis=0),
            jnp.mean(jnp.abs(c - g[:, 2:, 1:-1]), axis=0),
        ],
        axis=-1,
    )
    w = jnp.exp(-jnp.max(grads, axis=-1))
    w = jnp.pad(w, ((1, 1), (1, 1)))
    return distortion_map * w
