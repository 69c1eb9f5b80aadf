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


def make_surface_scene(
    n: int,
    width: int,
    height: int,
    seed: int = 0,
    fov_deg: float = 60.0,
    sigma_px: float = 2.0,
    opaque_frac: float = 0.7,
    feature_dim: int = 16,
):
    """Trained-statistics SURFACE scene: Gaussians on a smooth heightfield
    that fills the frustum of ``make_camera(width, height, fov_deg)``.

    ``make_scene`` draws a uniform fog — per-pixel coverage is spotty, so
    transmittance almost never saturates and early termination cannot
    fire. Real trained 3DGS scenes (the reference's Mip-NeRF360/LERF
    working points) are surfaces: every pixel's ray hits opaque splats
    within a short depth prefix, which is exactly the workload the CUDA
    reference's per-pixel early exit (and our block_exit) rides.

    Construction: screen-uniform samples are unprojected onto a smooth
    heightfield around z = 6 (plus depth jitter so per-tile depth
    ordering is non-trivial); footprints are sized so each pixel sees a
    handful of strong overlaps (sigma_px pixels at the surface depth);
    opacities are the trained-like bimodal mixture (``opaque_frac`` mass
    at beta(14,1) ~ 0.93, the rest low) matching 3DGS pruning stats.
    """
    rng = np.random.default_rng(seed)
    import math

    fx = width / (2 * math.tan(math.radians(fov_deg) / 2))
    # screen-uniform placement with a small margin past the borders
    u = rng.uniform(-0.04, 1.04, size=n).astype(np.float32)
    v = rng.uniform(-0.04, 1.04, size=n).astype(np.float32)
    # smooth heightfield around the make_camera target depth z = 6
    x0 = (u - 0.5) * 2.0
    y0 = (v - 0.5) * 2.0
    z = (
        6.0
        + 0.9 * np.sin(2.1 * x0 + 0.7) * np.cos(1.7 * y0 - 0.4)
        + 0.5 * np.sin(4.3 * y0) * np.cos(3.1 * x0)
        + rng.normal(0.0, 0.08, size=n)
    ).astype(np.float32)
    # unproject pixel centres at the surface depth (camera at origin,
    # looking down +z with up = -y, i.e. make_camera's view)
    px = u * width
    py = v * height
    x = (px - width / 2.0) * z / fx
    y = (py - height / 2.0) * z / fx
    means = np.stack([x, y, z], axis=1).astype(np.float32)

    # footprint: sigma_px pixels at each splat's own depth, modest
    # log-normal spread, z-axis thinned (surface-like pancakes)
    s_world = (sigma_px * z / fx) * np.exp(rng.normal(0.0, 0.25, size=n))
    scales = np.stack(
        [s_world, s_world * np.exp(rng.normal(0.0, 0.2, size=n)),
         0.3 * s_world],
        axis=1,
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)

    opaque = rng.random(n) < opaque_frac
    lo = rng.uniform(0.01, 0.30, size=n)
    hi = rng.beta(14.0, 1.0, size=n)
    opacities = np.where(opaque, hi, lo).astype(np.float32)

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
