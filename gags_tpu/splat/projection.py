"""World→screen projection of 3D Gaussians (EWA splatting).

This reproduces the projection semantics the reference relies on through
`gsplat.rasterization` (`gaussian_renderer/__init__.py:56-70`): perspective
EWA with FoV-clamped Jacobian, a +0.3 px^2 low-pass on the 2D covariance and
a 3-sigma circular extent — but as one fused, fully-vectorised JAX function.
Every 3x3 matmul is hand-expanded to elementwise VPU mul-adds: exact f32
with no MXU involvement (and no bf16 default-precision hazard).

All outputs are fixed-shape (N,...) with a validity mask instead of
compaction, which is what the TPU/XLA static-shape world wants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# gsplat defaults (rasterization() signature): eps2d, near/far planes, radius clip
EPS2D = 0.3
NEAR_PLANE = 0.01
FAR_PLANE = 1e10
RADIUS_CLIP = 0.0


class ProjectedGaussians(NamedTuple):
    means2d: jnp.ndarray  # (N, 2) pixel coords
    conics: jnp.ndarray   # (N, 3) upper triangle (a, b, c) of inverse 2D cov
    depths: jnp.ndarray   # (N,) camera-space z
    radii: jnp.ndarray    # (N,) int32 3-sigma MAX-axis radius, 0 = culled
    compensations: jnp.ndarray  # (N,) AA opacity scale (1.0 when not used)
    # tight axis-aligned 3-sigma half-extents (3*sqrt(cov_xx), 3*sqrt(
    # cov_yy)): the ellipse's exact bbox, <= the isotropic radius. Binning
    # rects built from these shed up to the anisotropy ratio in instances;
    # any point outside still has sigma > 4.5, the same bound as the
    # square's edge, so blend numerics keep the identical worst case.
    radii_x: jnp.ndarray = None  # (N,) int32, 0 = culled
    radii_y: jnp.ndarray = None  # (N,) int32


def effective_opacity(opacities: jnp.ndarray, compensations: jnp.ndarray) -> jnp.ndarray:
    """The opacity the blend kernels floor against: raw opacity times the
    EWA antialiasing compensation. Single definition — the geometry table,
    the tile cull's L threshold, the extent shrink below and gshard's
    gathered rows must all agree on this convention."""
    return opacities * compensations


class ProjectedComponents(NamedTuple):
    """Projection outputs as individual (N,) vectors (no (N, k) stacks).

    The inference pipeline consumes projection column-wise everywhere
    (tile rects, geometry table, cull rows), and (N, k<128) arrays are
    suspected to pad k → 128 lanes in HBM ((8, 128) tiling — see
    scripts/layout_probe.py), so the component form avoids materialising
    any padded intermediate. `project_gaussians` stacks these into the
    classic ProjectedGaussians; values are bit-identical either way."""

    mx: jnp.ndarray      # (N,) pixel x
    my: jnp.ndarray      # (N,) pixel y
    ca: jnp.ndarray      # (N,) conic a (inverse-cov upper triangle)
    cb: jnp.ndarray      # (N,) conic b
    cc: jnp.ndarray      # (N,) conic c
    depth: jnp.ndarray   # (N,) camera-space z
    radius: jnp.ndarray  # (N,) int32 3-sigma max-axis radius, 0 = culled
    rx: jnp.ndarray      # (N,) int32 tight x half-extent, 0 = culled
    ry: jnp.ndarray      # (N,) int32 tight y half-extent
    comp: jnp.ndarray    # (N,) AA opacity compensation (1.0 when unused)


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
    opacities: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project N Gaussians into one camera.

    Args:
      means: (N, 3) world positions.
      quats: (N, 4) wxyz rotations (unnormalised ok).
      scales: (N, 3) per-axis standard deviations (already exp-activated).
      viewmat: (4, 4) world→camera.
      K: (3, 3) intrinsics.
      width/height: image size in px (static).
      opacities: optional (N,) — shrink radii_x/radii_y to the alpha-floor
        contour (image-exact; see the extent comment below).

    Returns ProjectedGaussians; culled Gaussians have radii == 0.
    """
    comp = _project_components(
        means[:, 0], means[:, 1], means[:, 2],
        quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3],
        scales[:, 0], scales[:, 1], scales[:, 2],
        viewmat, K, width, height,
        eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
        antialiased=antialiased, opacities=opacities,
    )
    return ProjectedGaussians(
        means2d=jnp.stack([comp.mx, comp.my], axis=-1),
        conics=jnp.stack([comp.ca, comp.cb, comp.cc], axis=-1),
        depths=comp.depth,
        radii=comp.radius,
        compensations=comp.comp,
        radii_x=comp.rx,
        radii_y=comp.ry,
    )


def project_gaussians_soa(
    means_t: jnp.ndarray,
    quats_t: jnp.ndarray,
    scales_t: jnp.ndarray,
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    eps2d: float = EPS2D,
    near_plane: float = NEAR_PLANE,
    far_plane: float = FAR_PLANE,
    antialiased: bool = False,
    opacities: jnp.ndarray | None = None,
) -> ProjectedComponents:
    """SoA projection: geometry passed lane-major — means_t (3, N),
    quats_t (4, N) wxyz, scales_t (3, N) — and outputs returned as (N,)
    components. Bit-identical math to `project_gaussians` (same core);
    the layout keeps every HBM stream at its logical size (row slices of
    a (k, N) array are contiguous; column slices of (N, k) read a
    128-lane-padded tile per element — scripts/layout_probe.py)."""
    return _project_components(
        means_t[0], means_t[1], means_t[2],
        quats_t[0], quats_t[1], quats_t[2], quats_t[3],
        scales_t[0], scales_t[1], scales_t[2],
        viewmat, K, width, height,
        eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
        antialiased=antialiased, opacities=opacities,
    )


def _project_components(
    w0, w1, w2, q0, q1, q2, q3, sc0, sc1, sc2,
    viewmat, K, width, height,
    *, eps2d, near_plane, far_plane, antialiased, opacities,
) -> ProjectedComponents:
    """EWA projection core on (N,) component vectors (shared by the AoS
    and SoA entry points — see their docstrings for semantics)."""
    # All the K=3 "matmuls" below are expanded by hand into elementwise
    # mul-adds: (a) 3x3-sized matmuls utilise ~0.05% of the MXU and were the
    # bulk of projection cost, (b) the VPU computes them in TRUE f32, so the
    # TPU bf16-default-precision hazard (means2d jitter flipping tile
    # assignments — see NOTES.md) is gone by construction, with no
    # precision= pins to forget.
    r00, r01, r02 = viewmat[0, 0], viewmat[0, 1], viewmat[0, 2]
    r10, r11, r12 = viewmat[1, 0], viewmat[1, 1], viewmat[1, 2]
    r20, r21, r22 = viewmat[2, 0], viewmat[2, 1], viewmat[2, 2]
    t0, t1, t2 = viewmat[0, 3], viewmat[1, 3], viewmat[2, 3]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    # --- world → camera ------------------------------------------------------
    px_cam = r00 * w0 + r01 * w1 + r02 * w2 + t0
    py_cam = r10 * w0 + r11 * w1 + r12 * w2 + t1
    z = r20 * w0 + r21 * w1 + r22 * w2 + t2
    in_depth = (z > near_plane) & (z < far_plane)
    zs = jnp.where(in_depth, z, 1.0)  # avoid div-by-zero on culled points

    # --- camera-frame covariance Σ_cam = (R L)(R L)^T, L = R_quat diag(s) ----
    # (same op sequence as the historical (N, 4) form: elementwise square,
    # left-to-right sum, sqrt, divide — keeps results bit-identical)
    qden = jnp.sqrt(q0 * q0 + q1 * q1 + q2 * q2 + q3 * q3 + 1e-24)
    qw, qx, qy, qz = q0 / qden, q1 / qden, q2 / qden, q3 / qden
    s0, s1, s2 = sc0, sc1, sc2
    # L columns scaled by s (reference build_scaling_rotation semantics)
    l00 = (1 - 2 * (qy * qy + qz * qz)) * s0
    l01 = 2 * (qx * qy - qw * qz) * s1
    l02 = 2 * (qx * qz + qw * qy) * s2
    l10 = 2 * (qx * qy + qw * qz) * s0
    l11 = (1 - 2 * (qx * qx + qz * qz)) * s1
    l12 = 2 * (qy * qz - qw * qx) * s2
    l20 = 2 * (qx * qz - qw * qy) * s0
    l21 = 2 * (qy * qz + qw * qx) * s1
    l22 = (1 - 2 * (qx * qx + qy * qy)) * s2
    # M = R @ L (rows of the rotated factor)
    m00 = r00 * l00 + r01 * l10 + r02 * l20
    m01 = r00 * l01 + r01 * l11 + r02 * l21
    m02 = r00 * l02 + r01 * l12 + r02 * l22
    m10 = r10 * l00 + r11 * l10 + r12 * l20
    m11 = r10 * l01 + r11 * l11 + r12 * l21
    m12 = r10 * l02 + r11 * l12 + r12 * l22
    m20 = r20 * l00 + r21 * l10 + r22 * l20
    m21 = r20 * l01 + r21 * l11 + r22 * l21
    m22 = r20 * l02 + r21 * l12 + r22 * l22
    # Σ_cam entries actually consumed by the 2D projection
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22

    # --- perspective Jacobian with gsplat's FoV clamping ----------------------
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = zs * jnp.clip(px_cam / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(py_cam / zs, -lim_y, lim_y)

    rz = 1.0 / zs
    rz2 = rz * rz
    # J = [[fx/z, 0, -fx tx / z^2], [0, fy/z, -fy ty / z^2]]
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2

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
    conic_a = c_b * inv_det
    conic_b = -b * inv_det
    conic_c = a_b * inv_det

    # --- screen position and 3-sigma extent -----------------------------------
    mx = fx * px_cam * rz + cx
    my = fy * py_cam * rz + cy

    bmid = 0.5 * (a_b + c_b)
    v1 = bmid + jnp.sqrt(jnp.maximum(0.01, bmid * bmid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))
    # tight per-axis extents (bbox of the k-sigma ellipse). k = 3 matches
    # the reference's fixed 3-sigma rect (gsplat my_radius, consumed via
    # gaussian_renderer/__init__.py:56-70); with opacities given, k shrinks
    # to the alpha-floor contour sqrt(2*ln(255*o_eff)) — every pixel
    # outside it has alpha < 1/255 and is dropped by the blend kernels'
    # floor anyway, so the image is unchanged while low-opacity splats
    # bin fewer (or zero) instances. Capped at 3 so extents never exceed
    # the reference's. radii (isotropic) stays geometric: visibility /
    # densification pruning consumers expect the 3-sigma screen radius.
    if opacities is None:
        k = 3.0
    else:
        o_eff = effective_opacity(opacities, compensations)  # kernels floor o_eff*exp(-sigma)
        k = jnp.sqrt(
            2.0 * jnp.maximum(jnp.log(255.0 * jnp.maximum(o_eff, 1e-12)), 0.0)
        )
        k = jax.lax.stop_gradient(jnp.minimum(k, 3.0))
    sx = jnp.sqrt(jnp.maximum(a_b, 0.0))
    sy = jnp.sqrt(jnp.maximum(c_b, 0.0))
    rx = jnp.ceil(k * sx)
    ry = jnp.ceil(k * sy)

    # border culling stays on the geometric 3-sigma bbox: shrunken extents
    # must not flip `valid` (and with it `radii`, the visibility signal)
    rx3 = jnp.ceil(3.0 * sx)
    ry3 = jnp.ceil(3.0 * sy)
    inside = (
        (mx + rx3 > 0)
        & (mx - rx3 < width)
        & (my + ry3 > 0)
        & (my - ry3 < height)
    )
    valid = in_depth & valid_det & (radius > RADIUS_CLIP) & inside
    radii = jnp.where(valid, radius, 0.0).astype(jnp.int32)

    return ProjectedComponents(
        mx=mx,
        my=my,
        ca=conic_a,
        cb=conic_b,
        cc=conic_c,
        depth=z,
        radius=radii,
        rx=jnp.where(valid, rx, 0.0).astype(jnp.int32),
        ry=jnp.where(valid, ry, 0.0).astype(jnp.int32),
        comp=compensations,
    )
