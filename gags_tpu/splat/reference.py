"""Slow-but-exact pure-JAX rasterizer: the numerics oracle.

Composites every Gaussian over every pixel with a `lax.scan` in global depth
order, reproducing the per-pixel early-termination semantics of the CUDA
tile rasterizer the reference uses via gsplat (alpha floor 1/255, alpha clamp
0.999, stop when transmittance would fall below 1e-4). O(N*P) — use only for
tests and tiny scenes; the production path is the Pallas kernel in
`pallas_kernel.py`, which must match this to ~1e-5.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

ALPHA_FLOOR = 1.0 / 255.0
ALPHA_CLAMP = 0.999
T_EPS = 1e-4


def rasterize_reference(
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    width: int,
    height: int,
    background: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Alpha-composite projected Gaussians, front to back.

    Args:
      means2d: (N, 2), conics: (N, 3), depths: (N,), radii: (N,) int32
        (0 = culled) — from `project_gaussians`.
      opacities: (N,) post-sigmoid.
      colors: (N, C) per-Gaussian colour/feature channels.
      background: optional (C,) blended against residual transmittance.

    Returns:
      img: (H, W, C), alpha: (H, W).
    """
    n = means2d.shape[0]
    order = jnp.argsort(depths)

    px = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]  # (1, W)
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]  # (H, 1)

    c_ch = colors.shape[-1]

    def step(carry, g):
        T, done, acc = carry
        mean, conic, opac, radius, col = g
        dx = px - mean[0]  # (H?, W) broadcast
        dy = py - mean[1]
        sigma = 0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) + conic[1] * dx * dy
        vis = jnp.exp(-sigma)
        alpha = jnp.minimum(ALPHA_CLAMP, opac * vis)
        live = (radius > 0) & (sigma >= 0.0) & (alpha >= ALPHA_FLOOR)
        alpha = jnp.where(live, alpha, 0.0)
        next_t = T * (1.0 - alpha)
        kill = (alpha > 0.0) & (next_t < T_EPS)  # this splat would end the ray
        use = (alpha > 0.0) & jnp.logical_not(done) & jnp.logical_not(kill)
        w = jnp.where(use, alpha * T, 0.0)
        acc = acc + w[..., None] * col[None, None, :]
        T = jnp.where(use, next_t, T)
        done = done | kill
        return (T, done, acc), None

    init = (
        jnp.ones((height, width), jnp.float32),
        jnp.zeros((height, width), jnp.bool_),
        jnp.zeros((height, width, c_ch), jnp.float32),
    )
    gaussians = (
        means2d[order],
        conics[order],
        opacities[order],
        radii[order],
        colors[order],
    )
    (T, _done, acc), _ = jax.lax.scan(step, init, gaussians)
    alpha = 1.0 - T
    if background is not None:
        acc = acc + T[..., None] * background[None, None, :]
    return acc, alpha
