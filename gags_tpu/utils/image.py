"""Image resize primitives with exact PyTorch interpolation semantics.

The reference's supervision pipeline leans on `F.interpolate` in two modes:
nearest (seg maps, masks — `dataset_readers.py:72,91`, `camera_utils.py:60`)
and bilinear with align_corners=True (CLIP feature maps —
`dataset_readers.py:77-79`). JAX's `jax.image.resize` implements the
half-pixel convention, which differs — so we implement both torch
conventions as vectorised gathers (XLA fuses them; they're cheap).

All functions are channel-LAST: (H, W, C) or (H, W).
"""

from __future__ import annotations

import jax.numpy as jnp


def resize_nearest(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest'): src = floor(dst * in/out)."""
    h_out, w_out = out_hw
    h_in, w_in = img.shape[0], img.shape[1]
    if (h_in, w_in) == (h_out, w_out):
        return img
    ri = jnp.floor(jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    ci = jnp.floor(jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    ri = jnp.clip(ri, 0, h_in - 1)
    ci = jnp.clip(ci, 0, w_in - 1)
    return img[ri][:, ci]


def resize_bilinear_align_corners(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True).

    Sample positions: src = dst * (in-1)/(out-1); corners map to corners.
    """
    h_out, w_out = out_hw
    h_in, w_in = img.shape[0], img.shape[1]
    if (h_in, w_in) == (h_out, w_out):
        return img

    def coords(n_out, n_in):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    ys = coords(h_out, h_in)
    xs = coords(w_out, w_in)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h_in - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w_in - 1)
    y1 = jnp.clip(y0 + 1, 0, h_in - 1)
    x1 = jnp.clip(x0 + 1, 0, w_in - 1)
    wy = (ys - y0.astype(jnp.float32))[:, None]
    wx = (xs - x0.astype(jnp.float32))[None, :]
    if img.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]

    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def mean_smooth(img: jnp.ndarray, kernel_size: int = 5) -> jnp.ndarray:
    """Channel-wise k x k box filter with zero padding, divisor k^2.

    Matches `loss_utils.py:140-142` (F.conv2d of a ones/k^2 kernel with
    padding=k//2 — borders are averaged against implicit zeros).
    (H, W, C) or (H, W) input.
    """
    pad = kernel_size // 2
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)))
    # separable box filter via cumulative sums (O(HW) regardless of k)
    ix = jnp.pad(jnp.cumsum(x, axis=0), ((1, 0), (0, 0), (0, 0)))
    x = ix[kernel_size:] - ix[:-kernel_size]
    iy = jnp.pad(jnp.cumsum(x, axis=1), ((0, 0), (1, 0), (0, 0)))
    x = iy[:, kernel_size:] - iy[:, :-kernel_size]
    out = x / (kernel_size * kernel_size)
    return out[..., 0] if squeeze else out
