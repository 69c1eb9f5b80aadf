"""Tile binning: turn projected Gaussians into a per-tile sorted work list.

This replaces the CUDA duplicate+radix-sort stage of the rasterizer the
reference uses (gsplat's isect_tiles/isect_offset_encode) with an XLA-native
static-shape formulation tuned for TPU:

  1. per-Gaussian tile-rect + instance count (vectorised);
  2. ragged→dense expansion WITHOUT searchsorted: scatter segment markers at
     the exclusive-cumsum offsets, then `cumsum` recovers the owning
     Gaussian and `cummax` the segment base — O(M) elementwise instead of
     M·log(N) random-access binary searches (gathers are the slow op on
     TPU);
  3. per-tile alignment dummies are injected BEFORE the sort (key =
     tile*(N+1)+N sorts after every real rank in that tile), so one
     `lax.sort` of (key, gid) pairs directly yields the final chunk-aligned,
     tile-major, front-to-back instance list — no post-sort reshuffle;
  4. tile ranges are a plain cumsum of the padded per-tile counts.

Instance ranges are multiples of `chunk` by construction, so the Pallas
blend kernel's DMAs are lane-aligned, never straddle tiles, and its
backward writes are race-free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INT32_MAX = jnp.int32(2**31 - 1)


class BinnedInstances(NamedTuple):
    inst_gid: jnp.ndarray      # (M,) int32 Gaussian index per instance (sorted);
                               # == n_gaussians for padding (sentinel)
    tile_starts: jnp.ndarray   # (num_tiles,) int32 offset into instance list
    tile_counts: jnp.ndarray   # (num_tiles,) int32 REAL instances per tile
    num_valid: jnp.ndarray     # () int32 number of valid real instances
    overflow: jnp.ndarray      # () int32 instances dropped due to budget


def aligned_budget(budget: int, num_tiles: int, chunk: int) -> int:
    """Static output size: budget (rounded to chunk) + per-tile pad room."""
    b = ((budget + chunk - 1) // chunk) * chunk
    return b + num_tiles * chunk


def tile_rects(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    tile_w: int,
    tile_h: int,
    tiles_x: int,
    tiles_y: int,
):
    """Inclusive-exclusive tile rectangle [x0, x1) x [y0, y1) per Gaussian."""
    r = radii.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / tile_w), 0, tiles_x).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((means2d[:, 0] + r) / tile_w), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / tile_h), 0, tiles_y).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((means2d[:, 1] + r) / tile_h), 0, tiles_y).astype(jnp.int32)
    alive = radii > 0
    w = jnp.where(alive, x1 - x0, 0)
    h = jnp.where(alive, y1 - y0, 0)
    return x0, y0, w, h, w * h


def bin_gaussians(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
    budget: int,
    chunk: int = 128,
) -> BinnedInstances:
    """Build the sorted (tile-major, front-to-back, chunk-aligned) list.

    Args:
      means2d/radii/depths: (N,...) from `project_gaussians`.
      width/height: image size (static).
      tile_w/tile_h: tile size in px (static).
      budget: static max real instance count; beyond it instances are
        dropped (reported via `overflow`).
      chunk: the blend kernel's Gaussian chunk size G.
    """
    n = means2d.shape[0]
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    num_tiles = tiles_x * tiles_y
    m_real = ((budget + chunk - 1) // chunk) * chunk
    m_out = m_real + num_tiles * chunk

    x0, y0, w, _h, counts = tile_rects(means2d, radii, tile_w, tile_h, tiles_x, tiles_y)

    offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)  # exclusive
    total = offsets[-1] + counts[-1]
    num_valid = jnp.minimum(total, m_real)
    overflow = jnp.maximum(total - m_real, 0)

    # --- ragged→dense via scatter + cumsum/cummax (no binary searches) ------
    idx = jnp.arange(m_real, dtype=jnp.int32)
    marker = jnp.zeros((m_real + 1,), jnp.int32).at[jnp.minimum(offsets, m_real)].add(1)
    gid = jnp.cumsum(marker[:m_real]) - 1  # owning Gaussian per instance
    gid = jnp.clip(gid, 0, n - 1)
    base = jax.lax.cummax(jnp.where(marker[:m_real] > 0, idx, 0))
    slot = idx - base

    # front-to-back rank per Gaussian (dense, avoids float-key ties)
    order = jnp.argsort(depths)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    # one row-major gather of everything instance expansion needs
    table = jnp.stack([x0, y0, jnp.maximum(w, 1), rank], axis=1)  # (N, 4)
    g = table[gid]  # (M, 4) — contiguous 16B rows per index
    dy = slot // g[:, 2]
    dx = slot - dy * g[:, 2]
    tile = (g[:, 1] + dy) * tiles_x + (g[:, 0] + dx)
    valid = idx < num_valid

    counts_t = jax.ops.segment_sum(
        valid.astype(jnp.int32),
        jnp.where(valid, tile, 0),  # invalid rows carry weight 0 anyway
        num_segments=num_tiles,
    )

    padded_counts = ((counts_t + chunk - 1) // chunk) * chunk
    padded_counts = jnp.where(counts_t > 0, padded_counts, 0)
    tile_starts = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)

    # --- keys: real instances + per-tile alignment dummies ------------------
    key_real = jnp.where(valid, tile * (n + 1) + g[:, 3], INT32_MAX)
    gid_real = jnp.where(valid, gid, n).astype(jnp.int32)

    dummy_idx = jnp.arange(num_tiles * chunk, dtype=jnp.int32)
    d_tile = dummy_idx // chunk
    d_within = dummy_idx - d_tile * chunk
    pad_needed = padded_counts - counts_t  # in [0, chunk)
    d_ok = d_within < pad_needed[d_tile]
    key_dummy = jnp.where(d_ok, d_tile * (n + 1) + n, INT32_MAX)
    gid_dummy = jnp.full((num_tiles * chunk,), n, jnp.int32)

    if num_tiles * (n + 1) >= 2**31:
        raise ValueError(
            f"key space overflow: {num_tiles} tiles x {n} gaussians; "
            "increase tile size or shard the image"
        )

    keys = jnp.concatenate([key_real, key_dummy])
    gids = jnp.concatenate([gid_real, gid_dummy])
    _, sorted_gid = jax.lax.sort((keys, gids), num_keys=1)

    return BinnedInstances(
        inst_gid=sorted_gid,
        tile_starts=tile_starts,
        tile_counts=counts_t.astype(jnp.int32),
        num_valid=num_valid,
        overflow=overflow,
    )
