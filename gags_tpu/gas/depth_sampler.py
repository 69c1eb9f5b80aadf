"""Depth-sample stage (GAS stage B): project Gaussians, min-depth splats.

Counterpart of `depth_SAM.py` — but where the reference loops cameras on
CPU with full-size torch matmuls (depth_SAM.py:232-252, its own comment
marks it a hot loop), here one jitted function projects all N Gaussians
into a camera on device (a (N,3)x(3,3) matmul + gathers), and cameras are
scanned with donated carry for the running per-point minimum.

Semantics parity:
  * round-to-nearest pixel (banker's rounding like torch.round),
  * occlusion test |z - depth[v,u]| <= 0.25 * depth[v,u] (depth_SAM.py:66-68),
  * per-point min over cameras, then per-image scatter of that min depth at
    the projected pixel (depth_SAM.py:113-128).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

BIG = 1e9


@functools.partial(jax.jit, static_argnames=("width", "height", "vis_thres", "cut_bound"))
def project_points(
    points: jnp.ndarray,  # (N, 3)
    viewmat: jnp.ndarray,  # (4, 4)
    K: jnp.ndarray,  # (3, 3)
    depth_map: jnp.ndarray,  # (H, W)
    width: int,
    height: int,
    vis_thres: float = 0.25,
    cut_bound: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (u (N,), v (N,), visible (N,) bool, z (N,)) with occlusion
    testing — z is the camera-space depth (callers fold it into min-depth
    scans without re-projecting)."""
    p = (
        jnp.einsum(
            "nj,ij->ni", points, viewmat[:3, :3],
            precision=jax.lax.Precision.HIGHEST,
        )
        + viewmat[:3, 3]
    )
    z = p[:, 2]
    zs = jnp.where(z == 0, 1e-9, z)
    u = jnp.round(p[:, 0] * K[0, 0] / zs + K[0, 2]).astype(jnp.int32)
    v = jnp.round(p[:, 1] * K[1, 1] / zs + K[1, 2]).astype(jnp.int32)
    inside = (
        (u >= cut_bound)
        & (v >= cut_bound)
        & (u < width - cut_bound)
        & (v < height - cut_bound)
    )
    uc = jnp.clip(u, 0, width - 1)
    vc = jnp.clip(v, 0, height - 1)
    d = depth_map[vc, uc]
    visible = inside & (jnp.abs(d - z) <= vis_thres * d)
    return u, v, visible, z


def min_depth_over_cameras(
    points: jnp.ndarray,  # (N, 3)
    viewmats: jnp.ndarray,  # (C, 4, 4)
    Ks: jnp.ndarray,  # (C, 3, 3)
    depth_maps: jnp.ndarray,  # (C, H, W)
    vis_thres: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point minimum camera-space depth over all views where visible.

    Returns (min_depth (N,), vis (N, C) bool, uv (N, C, 2) int32).
    """
    c, h, w = depth_maps.shape

    def one_cam(carry, cam):
        vm, K, dm = cam
        u, v, vis, z = project_points(points, vm, K, dm, w, h, vis_thres=vis_thres)
        carry = jnp.minimum(carry, jnp.where(vis, z, BIG))
        return carry, (vis, jnp.stack([v, u], -1))

    init = jnp.full((points.shape[0],), BIG)
    mind, (vis, uv) = jax.lax.scan(init=init, xs=(viewmats, Ks, depth_maps), f=one_cam)
    return mind, jnp.moveaxis(vis, 0, 1), jnp.moveaxis(uv, 0, 1)


def splat_depth_samples(
    min_depth: jnp.ndarray,  # (N,)
    vis: jnp.ndarray,  # (N,) bool for ONE camera
    uv: jnp.ndarray,  # (N, 2) int32 (v, u) for ONE camera
    height: int,
    width: int,
) -> jnp.ndarray:
    """(H, W) map with each visible point's min depth written at its pixel
    (later points overwrite earlier, like the reference's index_put)."""
    vc = jnp.clip(uv[:, 0], 0, height - 1)
    uc = jnp.clip(uv[:, 1], 0, width - 1)
    vals = jnp.where(vis, min_depth, 0.0)
    # write only visible points: route invisible ones to a scratch row
    vc = jnp.where(vis, vc, height)
    padded = jnp.zeros((height + 1, width)).at[vc, uc].set(vals)
    return padded[:height]
