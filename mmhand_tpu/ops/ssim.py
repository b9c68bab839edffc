"""SSIM, matching the reference's vendored pytorch_ssim
(reference baselines/quantitative_on_benchmarks/pytorch_ssim/__init__.py:7-73):
11x11 Gaussian window (sigma 1.5), per-channel depthwise convolution with
SAME (window//2) padding, C1=0.01^2, C2=0.03^2, mean over all pixels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

WINDOW_SIZE = 11
WINDOW_SIGMA = 1.5
C1 = 0.01 ** 2
C2 = 0.03 ** 2


def _gaussian_window(size: int = WINDOW_SIZE, sigma: float = WINDOW_SIGMA):
    x = jnp.arange(size, dtype=jnp.float32)
    g = jnp.exp(-((x - size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    w2d = jnp.outer(g, g)
    return w2d / w2d.sum()


def _depthwise_blur(img, window):
    """Depthwise SAME conv of NHWC image with a (k, k) window."""
    c = img.shape[-1]
    k = window.shape[0]
    kern = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1
    return jax.lax.conv_general_dilated(
        img, kern,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


@functools.partial(jax.jit, static_argnames=("size_average",))
def ssim(img1, img2, size_average: bool = True):
    """SSIM of two NHWC float images (same value range, e.g. [0, 1]).

    Returns a scalar if size_average else per-image means.
    """
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    window = _gaussian_window()

    mu1 = _depthwise_blur(img1, window)
    mu2 = _depthwise_blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
