"""Exact k-nearest-neighbour distances, MXU-style.

TPU-native replacement for the reference's `simple_knn._C.distCUDA2` CUDA
kernel (`scene/gaussian_model.py:20,167`): the mean squared distance of each
point to its 3 nearest neighbours, used once per scene to initialise
Gaussian scales.

Instead of a spatial hash + per-thread loops, we compute exact blocked
distance matrices — ||x-y||^2 = ||x||^2 + ||y||^2 - 2 x.y — so the O(N^2)
work runs as dense matmuls on the MXU, with a running top-k merge per row
block. One-time cost per scene (~seconds for 1M points on a v5e), always
exact, no tuning parameters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.0e38)


@functools.partial(jax.jit, static_argnames=("k", "row_block", "col_block"))
def knn_sq_dists(
    xyz: jnp.ndarray, k: int = 3, row_block: int = 1024, col_block: int = 4096
) -> jnp.ndarray:
    """(N, k) squared distances to the k nearest *other* points."""
    n = xyz.shape[0]
    rb = min(row_block, max(8, n))
    cb = min(col_block, max(128, n))
    n_rpad = -(-n // rb) * rb
    n_cpad = -(-n // cb) * cb

    # pad with far-away sentinels so padded columns never win
    pts = jnp.pad(xyz.astype(jnp.float32), ((0, max(n_rpad, n_cpad) - n), (0, 0)))
    sq = jnp.sum(pts * pts, axis=-1)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cpad // cb, cb), 1) + (
        jnp.arange(n_cpad // cb, dtype=jnp.int32)[:, None] * cb
    )

    def row_fn(r):
        xr = jax.lax.dynamic_slice_in_dim(pts[:n_rpad], r * rb, rb)  # (rb, 3)
        sr = jax.lax.dynamic_slice_in_dim(sq[:n_rpad], r * rb, rb)
        rid = r * rb + jnp.arange(rb, dtype=jnp.int32)

        def col_fn(carry, c):
            xc = jax.lax.dynamic_slice_in_dim(pts[:n_cpad], c * cb, cb)
            sc = jax.lax.dynamic_slice_in_dim(sq[:n_cpad], c * cb, cb)
            cid = col_ids[c]
            d2 = sr[:, None] + sc[None, :] - 2.0 * (xr @ xc.T)  # (rb, cb)
            bad = (cid[None, :] == rid[:, None]) | (cid[None, :] >= n)
            d2 = jnp.where(bad, _BIG, jnp.maximum(d2, 0.0))
            blk_top, _ = jax.lax.top_k(-d2, k)  # (rb, k) negated
            merged, _ = jax.lax.top_k(jnp.concatenate([carry, blk_top], -1), k)
            return merged, None

        init = jnp.full((rb, k), -_BIG)
        best, _ = jax.lax.scan(col_fn, init, jnp.arange(n_cpad // cb))
        return -best

    out = jax.lax.map(row_fn, jnp.arange(n_rpad // rb))  # (R, rb, k)
    return out.reshape(n_rpad, k)[:n]


def mean_knn_sq_dist(xyz: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Mean of the k nearest squared distances (distCUDA2 semantics)."""
    return jnp.mean(knn_sq_dists(xyz, k=k), axis=-1)
