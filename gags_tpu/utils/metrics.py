"""Image quality metrics (PSNR / SSIM) in JAX.

Counterparts of the reference's `utils/image_utils.py:14-19` (psnr) and
`utils/loss_utils.py:158-198` (ssim: 11x11 Gaussian window, sigma 1.5,
C1=0.01^2, C2=0.03^2, per-channel depthwise convolution, mean over all).
LPIPS lives in `gags_tpu/utils/lpips.py` (weight-gated).

Channel-last (H, W, C) in [0, 1].
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-20)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return g


def _filter2d_same(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise filter with zero 'same' padding (torch conv2d
    padding=k//2 semantics). img: (H, W, C), win: (k,)."""
    k = win.shape[0]
    pad = k // 2
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)))
    x = jax.vmap(
        lambda c: jnp.convolve(c, win[::-1], mode="valid"), in_axes=1, out_axes=1
    )(x.reshape(x.shape[0], -1)).reshape(img.shape[0], img.shape[1], img.shape[2])
    y = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    y = jax.vmap(
        lambda c: jnp.convolve(c, win[::-1], mode="valid"), in_axes=0, out_axes=0
    )(y.transpose(2, 0, 1).reshape(-1, y.shape[1])).reshape(
        img.shape[2], img.shape[0], img.shape[1]
    )
    return y.transpose(1, 2, 0)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    win = _gaussian_window(window_size)
    mu1 = _filter2d_same(img1, win)
    mu2 = _filter2d_same(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d_same(img1 * img1, win) - mu1_sq
    s2 = _filter2d_same(img2 * img2, win) - mu2_sq
    s12 = _filter2d_same(img1 * img2, win) - mu12
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m)
