"""World→screen projection of 3D Gaussians (EWA splatting).

This reproduces the projection semantics the reference relies on through
`gsplat.rasterization` (`gaussian_renderer/__init__.py:56-70`): perspective
EWA with FoV-clamped Jacobian, a +0.3 px^2 low-pass on the 2D covariance and
a 3-sigma circular extent — but as one fused, fully-vectorised JAX function
(a few (N,3)x(3,3) matmuls + elementwise VPU work; no per-Gaussian loop).

All outputs are fixed-shape (N,...) with a validity mask instead of
compaction, which is what the TPU/XLA static-shape world wants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gags_tpu.core.transforms import build_covariance_3d

# gsplat defaults (rasterization() signature): eps2d, near/far planes, radius clip
EPS2D = 0.3
NEAR_PLANE = 0.01
FAR_PLANE = 1e10
RADIUS_CLIP = 0.0


class ProjectedGaussians(NamedTuple):
    means2d: jnp.ndarray  # (N, 2) pixel coords
    conics: jnp.ndarray   # (N, 3) upper triangle (a, b, c) of inverse 2D cov
    depths: jnp.ndarray   # (N,) camera-space z
    radii: jnp.ndarray    # (N,) int32 3-sigma pixel radius, 0 = culled
    compensations: jnp.ndarray  # (N,) AA opacity scale (1.0 when not used)


def project_gaussians(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    eps2d: float = EPS2D,
    near_plane: float = NEAR_PLANE,
    far_plane: float = FAR_PLANE,
    antialiased: bool = False,
) -> ProjectedGaussians:
    """Project N Gaussians into one camera.

    Args:
      means: (N, 3) world positions.
      quats: (N, 4) wxyz rotations (unnormalised ok).
      scales: (N, 3) per-axis standard deviations (already exp-activated).
      viewmat: (4, 4) world→camera.
      K: (3, 3) intrinsics.
      width/height: image size in px (static).

    Returns ProjectedGaussians; culled Gaussians have radii == 0.
    """
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    # --- world → camera ------------------------------------------------------
    # K=3 matmuls MUST run in true f32: the TPU default lowers matmuls to
    # bf16, which jitters means2d by ~0.3 px and flips tile assignments
    p_cam = (
        jnp.einsum("nj,ij->ni", means, R, precision=jax.lax.Precision.HIGHEST) + t
    )  # (N, 3)
    z = p_cam[:, 2]
    in_depth = (z > near_plane) & (z < far_plane)
    zs = jnp.where(in_depth, z, 1.0)  # avoid div-by-zero on culled points

    # --- 3D covariance in camera frame ---------------------------------------
    cov3d = build_covariance_3d(scales, quats)  # (N, 3, 3)
    cov_cam = jnp.einsum(
        "ij,njk,lk->nil", R, cov3d, R, precision=jax.lax.Precision.HIGHEST
    )  # R Σ R^T

    # --- perspective Jacobian with gsplat's FoV clamping ----------------------
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = zs * jnp.clip(p_cam[:, 0] / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(p_cam[:, 1] / zs, -lim_y, lim_y)

    rz = 1.0 / zs
    rz2 = rz * rz
    # J = [[fx/z, 0, -fx tx / z^2], [0, fy/z, -fy ty / z^2]]
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2

    c00, c01, c02 = cov_cam[:, 0, 0], cov_cam[:, 0, 1], cov_cam[:, 0, 2]
    c11, c12 = cov_cam[:, 1, 1], cov_cam[:, 1, 2]
    c22 = cov_cam[:, 2, 2]

    # cov2d = J cov_cam J^T, expanded by hand (2x2 symmetric)
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    det_orig = a * c - b * b
    a_b = a + eps2d
    c_b = c + eps2d
    det = a_b * c_b - b * b

    comp = jnp.sqrt(jnp.maximum(det_orig / jnp.maximum(det, 1e-30), 0.0))
    compensations = comp if antialiased else jnp.ones_like(comp)

    valid_det = det > 0
    det_safe = jnp.where(valid_det, det, 1.0)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([c_b * inv_det, -b * inv_det, a_b * inv_det], axis=-1)

    # --- screen position and 3-sigma extent -----------------------------------
    mx = fx * p_cam[:, 0] * rz + cx
    my = fy * p_cam[:, 1] * rz + cy
    means2d = jnp.stack([mx, my], axis=-1)

    bmid = 0.5 * (a_b + c_b)
    v1 = bmid + jnp.sqrt(jnp.maximum(0.01, bmid * bmid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))

    inside = (
        (mx + radius > 0)
        & (mx - radius < width)
        & (my + radius > 0)
        & (my - radius < height)
    )
    valid = in_depth & valid_det & (radius > RADIUS_CLIP) & inside
    radii = jnp.where(valid, radius, 0.0).astype(jnp.int32)

    return ProjectedGaussians(
        means2d=means2d,
        conics=conics,
        depths=z,
        radii=radii,
        compensations=compensations,
    )
