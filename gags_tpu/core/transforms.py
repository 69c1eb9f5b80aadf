"""Quaternion / covariance math for 3D Gaussians.

Pure-JAX, fully batched; the behavioural contract matches the reference's
`utils/general_utils.py:78-107` (build_rotation / build_scaling_rotation) and
`scene/gaussian_model.py:27-37` (covariance from scaling+rotation), but is
written vectorised over the leading axis so it fuses under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Convert (possibly unnormalised) quaternions to rotation matrices.

    Args:
      q: (..., 4) quaternions in (w, x, y, z) order — the 3DGS convention
         (reference `scene/gaussian_model.py:169-170` sets rots[:, 0] = 1).

    Returns:
      (..., 3, 3) rotation matrices.
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): the Cholesky-like factor of the 3D covariance.

    Matches reference `utils/general_utils.py:101-107`.
    """
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def build_covariance_3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Full 3x3 covariance Sigma = R S S^T R^T (reference gaussian_model.py:28-32).

    True-f32 matmul: TPU's default bf16 lowering visibly distorts conics."""
    import jax

    L = build_scaling_rotation(scales, quats)
    return jnp.einsum(
        "nij,nkj->nik", L, L, precision=jax.lax.Precision.HIGHEST
    )


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack the upper triangle of a symmetric 3x3 into 6 values.

    Order (xx, xy, xz, yy, yz, zz) matches reference
    `utils/general_utils.py:64-76`.
    """
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))
