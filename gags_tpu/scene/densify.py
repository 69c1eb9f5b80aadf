"""Adaptive density control: clone / split / prune as pure functions.

Functional counterparts of the reference's in-place optimizer surgery
(`scene/gaussian_model.py:336-468`): each op returns a new GaussianScene
(host-side numpy recomposition — densification happens a few hundred times
per training, never inside the jitted step; the reference likewise syncs
and rebuilds optimizer state every interval).

Used by RGB pretraining; GAD itself keeps geometry frozen and never calls
these (reference train.py:207 gates densification off in feature mode).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from gags_tpu.core.transforms import quat_to_rotmat, inverse_sigmoid
from gags_tpu.scene.gaussian_data import GaussianScene


def _concat_scene(a: GaussianScene, b: GaussianScene) -> GaussianScene:
    cat = lambda x, y: jnp.concatenate([x, y], axis=0)
    return GaussianScene(
        means=cat(a.means, b.means),
        sh=cat(a.sh, b.sh),
        opacities_raw=cat(a.opacities_raw, b.opacities_raw),
        scales_raw=cat(a.scales_raw, b.scales_raw),
        quats=cat(a.quats, b.quats),
        semantic_features=(
            cat(a.semantic_features, b.semantic_features)
            if a.semantic_features is not None
            else None
        ),
        max_sh_degree=a.max_sh_degree,
    )


def _subset(scene: GaussianScene, mask: np.ndarray) -> GaussianScene:
    idx = np.nonzero(np.asarray(mask))[0]
    return GaussianScene(
        means=scene.means[idx],
        sh=scene.sh[idx],
        opacities_raw=scene.opacities_raw[idx],
        scales_raw=scene.scales_raw[idx],
        quats=scene.quats[idx],
        semantic_features=(
            scene.semantic_features[idx] if scene.semantic_features is not None else None
        ),
        max_sh_degree=scene.max_sh_degree,
    )


def densify_and_clone(
    scene: GaussianScene,
    grads: np.ndarray,  # (N,) mean view-space positional gradient norm
    grad_threshold: float,
    scene_extent: float,
    percent_dense: float = 0.01,
) -> GaussianScene:
    """Duplicate small under-reconstructed Gaussians in place
    (gaussian_model.py:440-454)."""
    scales = np.asarray(scene.scales)
    sel = (np.asarray(grads) >= grad_threshold) & (
        scales.max(1) <= percent_dense * scene_extent
    )
    if not sel.any():
        return scene
    return _concat_scene(scene, _subset(scene, sel))


def densify_and_split(
    scene: GaussianScene,
    grads: np.ndarray,
    grad_threshold: float,
    scene_extent: float,
    percent_dense: float = 0.01,
    n_split: int = 2,
    rng: Optional[np.random.Generator] = None,
) -> GaussianScene:
    """Split large over-reconstructed Gaussians into n smaller samples
    (gaussian_model.py:415-438): children sampled from the parent Gaussian,
    scales divided by 0.8*n, parent removed."""
    rng = rng or np.random.default_rng(0)
    scales = np.asarray(scene.scales)
    sel = (np.asarray(grads) >= grad_threshold) & (
        scales.max(1) > percent_dense * scene_extent
    )
    if not sel.any():
        return scene
    parent = _subset(scene, sel)
    k = parent.num_gaussians
    reps = []
    R = np.asarray(quat_to_rotmat(parent.quats))  # (k, 3, 3)
    pscales = np.asarray(parent.scales)
    for _ in range(n_split):
        samples = rng.normal(size=(k, 3)) * pscales
        new_means = np.asarray(parent.means) + np.einsum("nij,nj->ni", R, samples)
        child = dataclasses.replace(
            parent,
            means=jnp.asarray(new_means, jnp.float32),
            scales_raw=jnp.asarray(
                np.log(pscales / (0.8 * n_split)), jnp.float32
            ),
        )
        reps.append(child)
    out = _subset(scene, ~sel)
    for child in reps:
        out = _concat_scene(out, child)
    return out


def prune(
    scene: GaussianScene,
    min_opacity: float = 0.005,
    scene_extent: Optional[float] = None,
    max_radii2d: Optional[np.ndarray] = None,
    max_screen_size: Optional[float] = None,
) -> Tuple[GaussianScene, np.ndarray]:
    """Drop transparent / oversized Gaussians (gaussian_model.py:456-468).

    Returns (scene, kept_mask)."""
    bad = np.asarray(scene.opacities) < min_opacity
    if max_screen_size is not None and max_radii2d is not None:
        bad |= np.asarray(max_radii2d) > max_screen_size
        if scene_extent is not None:
            bad |= np.asarray(scene.scales).max(1) > 0.1 * scene_extent
    return _subset(scene, ~bad), ~bad


def reset_opacity(scene: GaussianScene, ceiling: float = 0.01) -> GaussianScene:
    """Clamp opacities down to `ceiling` (gaussian_model.py:261-264)."""
    new = jnp.minimum(scene.opacities, ceiling)
    return dataclasses.replace(
        scene, opacities_raw=inverse_sigmoid(jnp.clip(new, 1e-6, 1 - 1e-6))
    )
