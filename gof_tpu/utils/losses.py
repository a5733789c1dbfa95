"""Image losses: L1 and SSIM (11x11 Gaussian window).

Replaces utils/loss_utils.py:17-64. SSIM uses the same 11-tap Gaussian
(sigma 1.5) separable window with zero 'SAME' padding and the standard
C1/C2 stabilizers.
"""

from __future__ import annotations

import jax
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


def _band(n: int) -> jnp.ndarray:
    """[n, n] banded Gaussian-blur operator (zero SAME padding = the band
    simply truncates at the edges, matching a zero-padded conv).

    Built ON DEVICE from iota rather than as a numpy closure constant: a
    dense [1237,1237] f32 constant embeds ~6 MB into the executable (and the
    blur appears at several call sites), which a tunneled backend pays for
    on every dispatch."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    diff = c - r  # band offset in [-5, 5]
    b = jnp.zeros((n, n), jnp.float32)
    for k, wk in enumerate(_WIN):
        b = jnp.where(diff == (k - 5), jnp.float32(wk), b)
    return b


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Separable 11-tap Gaussian blur with zero SAME padding; x: [C, H, W].

    Expressed as two banded matmuls (Bh @ x @ Bw^T) rather than depthwise
    convs: a 3-channel grouped conv leaves the MXU's 128-deep contraction
    idle, while [H,H]x[H,W] matmuls run at full systolic throughput.
    """
    H, W = x.shape[-2:]
    bh, bw = _band(H), _band(W)
    # HIGH = 3-pass bf16 (~1e-6 relative): indistinguishable for an 11-tap
    # blur of [0,1] images, ~2x faster than HIGHEST f32 on the MXU
    y = jnp.einsum("hj,cjw->chw", bh, x, precision=lax.Precision.HIGH)
    return jnp.einsum("chw,kw->chk", y, bw, precision=lax.Precision.HIGH)


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
