"""Synthetic Gaussian scenes for tests and benchmarks.

Generates a random-but-plausible cloud of Gaussians in front of a camera —
roughly matching the statistics of a trained 3DGS scene (log-normal scales,
mid-range opacities) so kernels see realistic tile occupancy.
"""

from __future__ import annotations

import numpy as np

from gags_tpu.core.camera import Camera, look_at, focal_to_fov


def make_scene(
    n: int,
    seed: int = 0,
    extent: float = 2.0,
    feature_dim: int = 16,
    scale_mean: float = -4.2,
    scale_std: float = 0.6,
):
    """Returns a dict of numpy arrays (means/quats/scales/opacities/sh/features)."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-extent, extent, size=(n, 3)).astype(np.float32)
    means[:, 2] += 6.0  # push cloud in front of the camera at origin
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(rng.normal(scale_mean, scale_std, size=(n, 3))).astype(np.float32)
    opacities = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0, :] = rng.uniform(-1.5, 1.5, size=(n, 3))
    sh[:, 1:, :] = 0.1 * rng.normal(size=(n, 15, 3))
    features = rng.normal(size=(n, feature_dim)).astype(np.float32) * 0.3
    return dict(
        means=means,
        quats=quats,
        scales=scales,
        opacities=opacities,
        sh=sh.astype(np.float32),
        features=features,
    )


def make_camera(width: int, height: int, fov_deg: float = 60.0, dist: float = 0.0) -> Camera:
    import jax.numpy as jnp
    import math

    fovx = math.radians(fov_deg)
    fx = width / (2 * math.tan(fovx / 2))
    fovy = focal_to_fov(fx, height)
    viewmat = look_at(
        eye=np.array([0.0, 0.0, -dist]),
        target=np.array([0.0, 0.0, 6.0]),
        up=np.array([0.0, -1.0, 0.0]),
    )
    K = np.array(
        [[fx, 0, width / 2.0], [0, fx, height / 2.0], [0, 0, 1]], np.float32
    )
    return Camera(
        viewmat=jnp.asarray(viewmat),
        K=jnp.asarray(K),
        width=width,
        height=height,
        name="synthetic",
    )


from gags_tpu.utils._surface_scene import make_surface_scene  # noqa: E402,F401
