"""Camera model.

TPU-first design notes: a `Camera` is a small pytree whose array leaves
(viewmat, intrinsics) flow straight into jitted render/train steps, while the
image size is static metadata (render shapes must be compile-time constants
on TPU). We store the *standard* world→camera matrix directly — the
reference keeps a transposed copy and un-transposes it at render time
(`scene/cameras.py:58-61`, `gaussian_renderer/__init__.py:55`); we skip that
legacy round-trip.

Conventions (COLMAP / OpenCV): x right, y down, z forward; `viewmat` maps
world points to camera space; intrinsics follow
`gaussian_renderer/__init__.py:27-38` (principal point at W/2, H/2 when
built from FoV).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def fov_to_focal(fov: float, pixels: float) -> float:
    """Reference utils/graphics_utils.py:73-74."""
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float) -> float:
    """Reference utils/graphics_utils.py:76-77."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Build the 4x4 world→camera matrix from a COLMAP extrinsic.

    Args:
      R: (3,3) the *camera-to-world* rotation as stored by the reference
         loader (`scene/dataset_readers.py` keeps R = qvec2rotmat(q).T).
      t: (3,) the COLMAP translation (world→camera).

    Matches reference `utils/graphics_utils.py:31-36` (getWorld2View).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective matrix (reference graphics_utils.py:51-71).

    Kept for viewer interop / MiniCam parity; the rasterizer itself works
    from pinhole intrinsics, not this matrix.
    """
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def intrinsics_from_fov(fovx: float, fovy: float, width: int, height: int) -> np.ndarray:
    """3x3 K from FoV, principal point at the image centre.

    Matches `gaussian_renderer/__init__.py:27-38`.
    """
    fx = fov_to_focal(fovx, width)
    fy = fov_to_focal(fovy, height)
    return np.array(
        [[fx, 0.0, width / 2.0], [0.0, fy, height / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A posed pinhole camera.

    Array leaves participate in jit; `width`/`height`/`name` are static.
    """

    viewmat: jnp.ndarray  # (4, 4) world→camera
    K: jnp.ndarray  # (3, 3) pinhole intrinsics
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    znear: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    zfar: float = dataclasses.field(default=100.0, metadata=dict(static=True))
    name: str = dataclasses.field(default="", metadata=dict(static=True))

    # ---- derived quantities -------------------------------------------------
    @property
    def fovx(self) -> float:
        return focal_to_fov(float(self.K[0, 0]), self.width)

    @property
    def fovy(self) -> float:
        return focal_to_fov(float(self.K[1, 1]), self.height)

    @property
    def campos(self) -> jnp.ndarray:
        """Camera centre in world coords: -R^T t."""
        R = self.viewmat[:3, :3]
        t = self.viewmat[:3, 3]
        return -R.T @ t

    def resized(self, width: int, height: int) -> "Camera":
        """Return a camera rendering at a different resolution, rescaling K."""
        sx = width / self.width
        sy = height / self.height
        scale = jnp.array(
            [[sx, 1.0, sx], [1.0, sy, sy], [1.0, 1.0, 1.0]], dtype=self.K.dtype
        )
        return dataclasses.replace(
            self, K=self.K * scale, width=int(width), height=int(height)
        )

    @staticmethod
    def from_colmap(
        R: np.ndarray,
        t: np.ndarray,
        fovx: float,
        fovy: float,
        width: int,
        height: int,
        name: str = "",
        znear: float = 0.01,
        zfar: float = 100.0,
    ) -> "Camera":
        return Camera(
            viewmat=jnp.asarray(world_to_view(R, t)),
            K=jnp.asarray(intrinsics_from_fov(fovx, fovy, width, height)),
            width=int(width),
            height=int(height),
            znear=znear,
            zfar=zfar,
            name=name,
        )


def look_at(eye: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Build a world→camera viewmat looking from `eye` toward `target`.

    Used by tests, novel-view synthesis and the synthetic benchmark scene.
    OpenCV convention (+z forward into the scene).
    """
    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, dtype=np.float64))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_wc = np.stack([right, down, fwd], axis=0)  # world→camera rotation
    t = -R_wc @ eye
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = R_wc
    out[:3, 3] = t
    return out
