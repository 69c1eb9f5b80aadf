"""Point-cloud utilities: clustering, projection maps, encodings.

Counterparts of the reference's `utils/pcd_utils.py` numeric parts (the
Open3D visualisation windows become PLY exports — any viewer opens them):

  * `euclidean_clusters` — DBSCAN-style euclidean clustering
    (pcd_utils.py:149-155) built on the exact KNN module;
  * `points_to_map` — splat per-point values into an image (pcd_2_map,
    pcd_utils.py:221-250);
  * `position_encoding` — sinusoidal xyz encoding (pcd_utils.py:252-262).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp


def euclidean_clusters(
    xyz: np.ndarray, eps: float = 0.05, min_points: int = 10
) -> np.ndarray:
    """(N,) int32 cluster labels (-1 = noise), DBSCAN over euclidean eps.

    Host-side (runs on selections of a few thousand points after text
    grounding). Union-find over the eps-neighbourhood graph built from
    blocked distances.
    """
    n = len(xyz)
    if n == 0:
        return np.zeros((0,), np.int32)
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    block = 2048
    eps2 = eps * eps
    for i0 in range(0, n, block):
        xi = xyz[i0 : i0 + block]
        for j0 in range(i0, n, block):
            xj = xyz[j0 : j0 + block]
            d2 = ((xi[:, None, :] - xj[None, :, :]) ** 2).sum(-1)
            ii, jj = np.nonzero(d2 <= eps2)
            for a, b in zip(ii + i0, jj + j0):
                if a != b:
                    union(a, b)

    roots = np.array([find(i) for i in range(n)])
    labels = -np.ones(n, np.int32)
    next_label = 0
    for r in np.unique(roots):
        members = np.nonzero(roots == r)[0]
        if len(members) >= min_points:
            labels[members] = next_label
            next_label += 1
    return labels


def points_to_map(
    uv: np.ndarray,  # (N, 2) int (v, u)
    values: np.ndarray,  # (N,) or (N, C)
    hw: Tuple[int, int],
) -> np.ndarray:
    """Write per-point values at their pixels (later points overwrite)."""
    h, w = hw
    out_shape = (h, w) if values.ndim == 1 else (h, w, values.shape[1])
    out = np.zeros(out_shape, values.dtype)
    v = np.clip(uv[:, 0], 0, h - 1)
    u = np.clip(uv[:, 1], 0, w - 1)
    out[v, u] = values
    return out


def position_encoding(xyz: jnp.ndarray, num_freqs: int = 4) -> jnp.ndarray:
    """(N, 3) → (N, 3 * 2 * num_freqs) sin/cos features."""
    freqs = 2.0 ** jnp.arange(num_freqs)
    ang = xyz[..., None] * freqs  # (N, 3, F)
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return enc.reshape(*xyz.shape[:-1], -1)
