"""Tile binning: turn projected Gaussians into a per-tile sorted work list.

This replaces the CUDA duplicate+radix-sort stage of the rasterizer the
reference uses (gsplat's isect_tiles/isect_offset_encode) with an XLA-native,
static-shape formulation:

  1. per-Gaussian tile-rect + instance count (vectorised),
  2. ragged→dense expansion into a fixed instance budget via
     `searchsorted(offsets, arange(budget))` — the idiomatic JAX pattern for
     variable fan-out without host loops,
  3. a single int32 key sort (tile-major, depth-rank-minor) when the key
     fits 31 bits, otherwise two stable sorts,
  4. per-tile start/count via `searchsorted` over the sorted tile ids.

Everything is jit-compatible with static shapes; budget overflow is reported
as a count the caller can check asynchronously.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BinnedInstances(NamedTuple):
    inst_gid: jnp.ndarray      # (M,) int32 Gaussian index per instance (sorted);
                               # == n_gaussians for padding (sentinel)
    tile_starts: jnp.ndarray   # (num_tiles,) int32 offset into instance list
    tile_counts: jnp.ndarray   # (num_tiles,) int32 instances per tile
    num_valid: jnp.ndarray     # () int32 number of valid instances
    overflow: jnp.ndarray      # () int32 instances dropped due to budget


def aligned_budget(budget: int, num_tiles: int, chunk: int) -> int:
    """Static output size of `bin_gaussians` after per-tile chunk alignment."""
    worst = budget + num_tiles * (chunk - 1)
    return ((worst + chunk - 1) // chunk) * chunk


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
    x0 = jnp.floor((means2d[:, 0] - r) / tile_w)
    x1 = jnp.ceil((means2d[:, 0] + r) / tile_w)
    y0 = jnp.floor((means2d[:, 1] - r) / tile_h)
    y1 = jnp.ceil((means2d[:, 1] + r) / tile_h)
    x0 = jnp.clip(x0, 0, tiles_x).astype(jnp.int32)
    x1 = jnp.clip(x1, 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(y0, 0, tiles_y).astype(jnp.int32)
    y1 = jnp.clip(y1, 0, tiles_y).astype(jnp.int32)
    alive = radii > 0
    w = jnp.where(alive, x1 - x0, 0)
    h = jnp.where(alive, y1 - y0, 0)
    counts = w * h
    return x0, y0, w, h, counts


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
    """Build the sorted (tile-major, front-to-back) instance list.

    Each tile's instance range is padded to a multiple of `chunk` with
    sentinel instances (gid == N) so the Pallas blend kernel's chunk DMAs are
    lane-aligned, never straddle tiles, and its backward writes are
    race-free. Output length is `aligned_budget(budget, num_tiles, chunk)`.

    Args:
      means2d/radii/depths: (N,...) from `project_gaussians`.
      width/height: image size (static).
      tile_w/tile_h: tile size in px (static).
      budget: static max (unpadded) instance count; instances past it are
        dropped (reported via `overflow`).
      chunk: the blend kernel's Gaussian chunk size G.
    """
    n = means2d.shape[0]
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    num_tiles = tiles_x * tiles_y

    x0, y0, w, _h, counts = tile_rects(means2d, radii, tile_w, tile_h, tiles_x, tiles_y)

    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    total = offsets[-1] + counts[-1]
    num_valid = jnp.minimum(total, budget)
    overflow = jnp.maximum(total - budget, 0)

    # ragged → dense: instance i belongs to the last Gaussian with offset <= i
    inst_idx = jnp.arange(budget, dtype=jnp.int32)
    gid = jnp.searchsorted(offsets, inst_idx, side="right").astype(jnp.int32) - 1
    gid = jnp.clip(gid, 0, n - 1)
    slot = inst_idx - offsets[gid]
    valid = inst_idx < num_valid

    # tile id for this slot: row-major scan over the Gaussian's rect
    wg = jnp.maximum(w[gid], 1)
    dy = slot // wg
    dx = slot - dy * wg
    tile = (y0[gid] + dy) * tiles_x + (x0[gid] + dx)
    tile = jnp.where(valid, tile, num_tiles)  # sentinel → sorts last

    # front-to-back rank per Gaussian (dense 0..n-1, avoids float-key ties)
    order = jnp.argsort(depths)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    inst_rank = jnp.where(valid, rank[gid], n)

    if (num_tiles + 1) * (n + 1) < 2**31:
        key = tile * (n + 1) + inst_rank
        perm = jnp.argsort(key)
    else:
        # two-pass stable sort: depth first, then tile (stable keeps depth order)
        perm0 = jnp.argsort(inst_rank, stable=True)
        perm = perm0[jnp.argsort(tile[perm0], stable=True)]

    inst_gid = gid[perm]
    inst_tile = tile[perm]

    tile_starts = jnp.searchsorted(
        inst_tile, jnp.arange(num_tiles, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    next_starts = jnp.searchsorted(
        inst_tile, jnp.arange(1, num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_counts = next_starts - tile_starts

    # --- chunk-align every tile's range --------------------------------------
    m_out = aligned_budget(budget, num_tiles, chunk)
    padded_counts = ((tile_counts + chunk - 1) // chunk) * chunk
    padded_starts = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)

    out_idx = jnp.arange(m_out, dtype=jnp.int32)
    t_of = jnp.searchsorted(padded_starts, out_idx, side="right").astype(jnp.int32) - 1
    t_of = jnp.clip(t_of, 0, num_tiles - 1)
    within = out_idx - padded_starts[t_of]
    src = tile_starts[t_of] + within
    ok = within < tile_counts[t_of]
    aligned_gid = jnp.where(ok, inst_gid[jnp.clip(src, 0, budget - 1)], n)

    return BinnedInstances(
        inst_gid=aligned_gid,
        tile_starts=padded_starts,
        tile_counts=tile_counts,
        num_valid=num_valid,
        overflow=overflow,
    )
