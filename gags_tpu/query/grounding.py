"""3D point-cloud grounding: per-Gaussian relevancy + neighbour smoothing.

Counterpart of `compute_relvancy.py:273-394` (pcd mode): decode every
Gaussian's 16-dim feature to CLIP space in chunks, cosine relevancy against
text prompts, threshold, then a neighbour-vote mask smoothing that replaces
the reference's scipy cKDTree loop (`utils/pcd_utils.py:204-219`: radius
0.05, >=20 votes) with the same logic built on our exact KNN module.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gags_tpu.knn.knn import knn_sq_dists
from gags_tpu.query.relevancy import relevancy


def decode_features_chunked(
    decoder_apply,
    dec_params,
    features: jnp.ndarray,  # (N, F)
    chunk: int = 1_048_576,
) -> jnp.ndarray:
    """Decode per-Gaussian features in fixed chunks (reference decodes in
    1M-point chunks, compute_relvancy.py:345-354)."""
    n = features.shape[0]
    outs = []
    fn = jax.jit(lambda f: decoder_apply(dec_params, f[None])[0])
    for i in range(0, n, chunk):
        outs.append(fn(features[i : i + chunk]))
    return jnp.concatenate(outs, axis=0)


def point_relevancy(
    decoded: jnp.ndarray,  # (N, D)
    pos_embeds: jnp.ndarray,
    neg_embeds: jnp.ndarray,
    normalize: bool = True,
) -> jnp.ndarray:
    """(N, P) relevancy scores, optionally min-max normalised per prompt."""
    rel = relevancy(decoded, pos_embeds, neg_embeds)
    if normalize:
        lo = jnp.min(rel, axis=0, keepdims=True)
        hi = jnp.max(rel, axis=0, keepdims=True)
        rel = (rel - lo) / jnp.maximum(hi - lo, 1e-9)
    return rel


def smooth_point_mask(
    xyz: jnp.ndarray,  # (N, 3)
    mask: jnp.ndarray,  # (N,) bool
    k: int = 32,
    radius: float = 0.05,
    min_votes: int = 20,
) -> jnp.ndarray:
    """Keep a point iff >= min_votes of its neighbours within `radius` are
    also selected (vote semantics of smooth_pcd_mask; neighbourhood realised
    as k-NN capped at `radius` instead of an unbounded ball query)."""
    # distances from selected points to all points is O(S*N) — reuse the
    # blocked KNN over the full set, then vote among the k nearest
    d2, idx = _knn_with_indices(xyz, k)
    votes = jnp.sum(mask[idx] & (d2 <= radius * radius), axis=1)
    return mask & (votes >= min_votes)


def _knn_with_indices(xyz: jnp.ndarray, k: int):
    """(N, k) squared dists + indices via blocked top-k (same scheme as
    gags_tpu.knn but keeping indices)."""
    n = xyz.shape[0]
    cb = min(4096, max(128, n))
    n_cpad = -(-n // cb) * cb
    pts = jnp.pad(xyz.astype(jnp.float32), ((0, n_cpad - n), (0, 0)))
    sq = jnp.sum(pts * pts, axis=-1)

    def row_fn(r):
        rb = 1024
        xr = jax.lax.dynamic_slice_in_dim(pts_r, r * rb, rb)
        sr = jax.lax.dynamic_slice_in_dim(sq_r, r * rb, rb)
        rid = r * rb + jnp.arange(rb, dtype=jnp.int32)

        def col_fn(carry, c):
            best_d, best_i = carry
            xc = jax.lax.dynamic_slice_in_dim(pts, c * cb, cb)
            sc = jax.lax.dynamic_slice_in_dim(sq, c * cb, cb)
            cid = c * cb + jnp.arange(cb, dtype=jnp.int32)
            d2 = sr[:, None] + sc[None, :] - 2.0 * (xr @ xc.T)
            bad = (cid[None, :] == rid[:, None]) | (cid[None, :] >= n)
            d2 = jnp.where(bad, 3e38, jnp.maximum(d2, 0.0))
            cat_d = jnp.concatenate([best_d, -d2], axis=1)
            cat_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(cid[None, :], d2.shape)], axis=1
            )
            new_d, pos = jax.lax.top_k(cat_d, k)
            new_i = jnp.take_along_axis(cat_i, pos, axis=1)
            return (new_d, new_i), None

        init = (jnp.full((rb, k), -3e38), jnp.zeros((rb, k), jnp.int32))
        (bd, bi), _ = jax.lax.scan(col_fn, init, jnp.arange(n_cpad // cb))
        return -bd, bi

    rb = 1024
    n_rpad = -(-n // rb) * rb
    pts_r = jnp.pad(pts, ((0, max(0, n_rpad - pts.shape[0])), (0, 0)))
    sq_r = jnp.sum(pts_r * pts_r, axis=-1)
    d, i = jax.lax.map(row_fn, jnp.arange(n_rpad // rb))
    return d.reshape(n_rpad, k)[:n], i.reshape(n_rpad, k)[:n]


def select_gaussians(
    rel: jnp.ndarray,  # (N, P) normalised relevancy
    prompt_idx: int,
    thresh: float,
    xyz: Optional[jnp.ndarray] = None,
    smooth: bool = True,
) -> jnp.ndarray:
    """(N,) bool mask of Gaussians relevant to one prompt."""
    mask = rel[:, prompt_idx] > thresh
    if smooth and xyz is not None:
        mask = smooth_point_mask(xyz, mask)
    return mask


def decode_map_rows(
    decoder_apply,
    dec_params,
    feat_map: jnp.ndarray,  # (H, W, F)
    rows_per_chunk: int = 96,
) -> np.ndarray:
    """Decode an (H, W, F) feature map to CLIP space in ROW chunks.

    A whole-image 512-dim decode at 1080p is a (1080, 1920, 512) f32
    output (~4.2 GB) plus ~(H, W, 256) hidden activations per layer —
    past the v5e HBM envelope (SURVEY §7.3.6). Row chunking bounds the
    device footprint; the result is assembled on host.
    """
    h = feat_map.shape[0]
    fn = jax.jit(lambda f: decoder_apply(dec_params, f))
    outs = [
        np.asarray(fn(feat_map[i : i + rows_per_chunk]))
        for i in range(0, h, rows_per_chunk)
    ]
    return np.concatenate(outs, axis=0)
