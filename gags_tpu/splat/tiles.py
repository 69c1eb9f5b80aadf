"""Tile binning: turn projected Gaussians into a per-tile sorted work list.

This replaces the CUDA duplicate+radix-sort stage of the rasterizer the
reference uses (gsplat's isect_tiles/isect_offset_encode) with an XLA-native
static-shape formulation tuned for TPU. Measured on v5e, the naive
formulation's cost is NOT the sort (lax.sort of 1.2M int32 keys is ~2 ms) —
it is the constellation of M-sized scatters/gathers/segment-sums around it.
The design removes them:

  1. per-Gaussian tile-rect (vectorised), then everything is permuted into
     **depth order** (one N-sized argsort + one (N,4) gather) so that the
     instance expansion below emits instances in global front-to-back rank
     order — the sort key no longer needs a payload and the depth rank IS
     the Gaussian id;
  2. per-tile instance counts via a **2-D summed-area scatter**: ±1 at the
     four corners of each tile rect into a (Ty+1, Tx+1) grid + a 2-D cumsum
     — O(N) scatter + O(T) scan instead of an O(M) segment-sum (9 ms → μs);
  3. ragged→dense expansion via scatter segment markers at the exclusive-
     cumsum offsets, then `cumsum`/`cummax` recover the owning rank and
     segment base — O(M) elementwise, no binary searches; the per-instance
     rect data comes from ONE (M,) gather of a bit-packed (x0, y0, w) int32;
  4. per-tile alignment dummies are injected BEFORE the sort (key =
     (tile << shift) | N sorts after every real rank in that tile), so one
     **key-only** `lax.sort` directly yields the final chunk-aligned,
     tile-major, front-to-back instance list; the owning rank is recovered
     as `key & (2^shift - 1)` (shift = bits(N)) — no payload column, no
     post-sort gather, no M-sized division.

`inst_gid` therefore holds **depth ranks**: rank r refers to the Gaussian
`order[r]`. Callers permute their per-Gaussian tables by `order` once
(N-sized) instead of gathering a payload per instance (M-sized).

Instance ranges are multiples of `chunk` by construction, so the Pallas
blend kernel's DMAs are lane-aligned, never straddle tiles, and its
backward writes are race-free.
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp

INT32_MAX = jnp.int32(2**31 - 1)

# A/B experiment flag (GAGS_FKEYS=1): fused expansion+key kernel on the
# unaligned fast path (see pallas_kernel.expand_keys). Exact same keys;
# drain-time on hardware decides the default.
_FUSED_KEYS = _os.environ.get("GAGS_FKEYS", "0") == "1"


def fast_gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather of a 32-bit-dtype (N, K) table via u16 bit-halves — exact.

    Measured on v5e: XLA row gathers cost per-row on 32-bit element types
    (~5.4 ms for 1M 24-wide rows, independent of K) but run ~2.5x faster
    on 16-bit types (~2.2 ms for the same rows at 2K u16 columns). Each
    32-bit word is stored as two u16 halves in a (N, 2K) table built with
    integer ops (NOT bitcast+reshape, whose non-canonical layout defeats
    the fast path), gathered, and reassembled exactly.
    """
    k = table.shape[1]
    g = u16_halves(table)[idx]  # (M, 2K)
    rebits = (g[:, :k].astype(jnp.uint32) << 16) | g[:, k:].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(rebits, table.dtype)


def u16_halves(table: jnp.ndarray) -> jnp.ndarray:
    """(N, K) 32-bit table → (N, 2K) u16 [hi halves | lo halves] — exact."""
    bits = jax.lax.bitcast_convert_type(table, jnp.uint32)  # (N, K)
    hi = (bits >> 16).astype(jnp.uint16)
    lo = (bits & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    return jnp.concatenate([hi, lo], axis=1)


def spread_sorted(field: jnp.ndarray, offsets: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Piecewise-constant fill: out[i] = field[j] where offsets[j] <= i <
    offsets[j+1] (offsets non-decreasing). Telescoping diff-scatter + cumsum
    — no M-sized gathers, no binary searches."""
    d = jnp.diff(field, prepend=jnp.zeros((1,), field.dtype))
    acc = jnp.zeros((out_len + 1,), field.dtype).at[
        jnp.minimum(offsets, out_len)
    ].add(d, indices_are_sorted=True)
    return jnp.cumsum(acc[:out_len])


class ReductionLayout(NamedTuple):
    """Rank-sorted, 128-block-aligned instance layout for the scatter-free
    per-gaussian gradient reduction (see pallas_kernel.sorted_segment_sum).

    XLA's scatter-add is catastrophically slow on TPU (~138 ms for a 1.2M x 16
    segment-sum); instead the backward gathers per-instance grad rows into
    this layout (one fast u16 row-gather) and a Pallas kernel reduces each
    128-rank block with one-hot MXU matmuls.
    """

    slot_to_pos: jnp.ndarray  # (Mp,) int32 padded slot -> instance position
                              #   (M_in = zero row sentinel for padding)
    slot_rank: jnp.ndarray    # (Mp,) int32 rank id RELATIVE to the slot's
                              #   128-rank block; -1 for padding slots
    chunk_block: jnp.ndarray  # (Mp//128,) int32 non-decreasing rank-block id
                              #   per 128-slot chunk


class BinnedInstances(NamedTuple):
    inst_gid: jnp.ndarray      # (M,) int32 depth RANK per instance (sorted);
                               # == n_gaussians for padding (sentinel).
                               # Original Gaussian index = order[rank].
    tile_starts: jnp.ndarray   # (num_tiles,) int32 offset into instance list
    tile_counts: jnp.ndarray   # (num_tiles,) int32 REAL instances per tile
    num_valid: jnp.ndarray     # () int32 number of valid real instances
    overflow: jnp.ndarray      # () int32 instances dropped due to budget
    order: jnp.ndarray         # (N,) int32 depth order: order[rank] = index
    red: "ReductionLayout | None" = None  # gradient-reduction layout
                               # (aligned/training mode only)


def reduction_layout(
    inst_gid: jnp.ndarray, n: int, chunk: int = 128
) -> ReductionLayout:
    """Build the rank-sorted block-aligned layout for gradient reduction.

    Instances are permuted into rank order; each 128-rank block's run is
    padded to a multiple of `chunk` so the Pallas reduction kernel can
    process whole chunks whose ranks all fall in one block. Cached per
    camera by the binned training fast path (geometry frozen ⇒ layout
    invariant); the unbinned path computes it in-step (~3 ms, still 20x
    cheaper than the XLA scatter it replaces).
    """
    m = inst_gid.shape[0]
    nb = (n + 1 + chunk - 1) // chunk  # rank blocks, incl the sentinel rank n
    mp = ((m + chunk - 1) // chunk) * chunk + nb * chunk  # static worst case
    # the reduction kernel processes SEGSUM_SUB chunks per grid step
    step = 8 * chunk
    mp = ((mp + step - 1) // step) * step
    perm = jnp.argsort(inst_gid).astype(jnp.int32)
    seg = inst_gid[perm]
    bounds = jnp.arange(nb + 1, dtype=jnp.int32) * chunk
    starts = jnp.searchsorted(seg, bounds, side="left").astype(jnp.int32)
    lens = starts[1:] - starts[:-1]
    plens = ((lens + chunk - 1) // chunk) * chunk
    pstarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(plens).astype(jnp.int32)]
    )
    total = pstarts[nb]
    slot = jnp.arange(mp, dtype=jnp.int32)
    s_of = spread_sorted(starts[:nb], pstarts[:nb], mp)
    p_of = spread_sorted(pstarts[:nb], pstarts[:nb], mp)
    e_of = spread_sorted(starts[1:], pstarts[:nb], mp)
    block = spread_sorted(jnp.arange(nb, dtype=jnp.int32), pstarts[:nb], mp)
    pos_sorted = s_of + (slot - p_of)
    valid = (slot < total) & (pos_sorted < e_of)
    tbl = jnp.stack([perm, seg.astype(jnp.int32)], axis=1)  # (m, 2)
    got = fast_gather_rows(tbl, jnp.where(valid, pos_sorted, 0))
    slot_to_pos = jnp.where(valid, got[:, 0], m)
    slot_rank = jnp.where(valid, got[:, 1] - block * chunk, -1)
    return ReductionLayout(
        slot_to_pos=slot_to_pos,
        slot_rank=slot_rank,
        chunk_block=block[::chunk],
    )


def ellipse_tile_keep(
    tile_x, tile_y, tile_w: int, tile_h: int, cull, half_px: float = 0.5
):
    """Exact alpha-floor tile test: keep a (gaussian, tile) instance iff
    some pixel centre of the tile has sigma <= L = ln(255*o_eff), i.e.
    blend alpha >= 1/255. Pixels of tile (tx, ty) span
    [tx*tw + 0.5, tx*tw + tw - 0.5] x [...] in the kernel's convention
    (pallas_kernel._pixel_coords); the continuous min over that rect
    lower-bounds the discrete min, so dropping on `min > L` is
    conservative-exact (never drops a contributing pixel).

    The min of the PD quadratic sigma(u, v) = 0.5(a u^2 + c v^2) + b u v
    over an axis-aligned rect is 0 if the centre is inside, else attained
    on an edge, where the 1-D minimiser has closed form. cull: (M, 6)
    rows [mx, my, conic_a, conic_b, conic_c, L].
    """
    mx, my = cull[:, 0], cull[:, 1]
    a, b, c, L = cull[:, 2], cull[:, 3], cull[:, 4], cull[:, 5]
    u0 = tile_x.astype(jnp.float32) * tile_w + half_px - mx
    u1 = u0 + (tile_w - 2 * half_px)
    v0 = tile_y.astype(jnp.float32) * tile_h + half_px - my
    v1 = v0 + (tile_h - 2 * half_px)
    inside = (u0 <= 0) & (0 <= u1) & (v0 <= 0) & (0 <= v1)

    def edge_u(ub):  # u fixed at a vertical edge, minimise over v
        vs = jnp.clip(-b * ub / c, v0, v1)
        return (0.5 * a * ub + b * vs) * ub + 0.5 * c * vs * vs

    def edge_v(vb):  # v fixed at a horizontal edge, minimise over u
        us = jnp.clip(-b * vb / a, u0, u1)
        return (0.5 * c * vb + b * us) * vb + 0.5 * a * us * us

    smin = jnp.minimum(
        jnp.minimum(edge_u(u0), edge_u(u1)),
        jnp.minimum(edge_v(v0), edge_v(v1)),
    )
    return inside | (smin <= L)


def _finish_unaligned(
    sorted_keys, inst_rank, *, num_tiles, shift, wide_keys,
    key_dtype, chunk, n, num_valid, overflow, order,
):
    """Unaligned epilogue: per-tile ranges straight from the sorted keys
    (tile t's range is [searchsorted(t << shift), searchsorted((t+1) <<
    shift)) — T+1 sorted queries, O(T log M)) plus one sentinel chunk of
    tail padding for the kernel's last masked DMA."""
    tbounds = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    if not wide_keys:
        tbounds = tbounds.astype(key_dtype) << shift
    edges = jnp.searchsorted(sorted_keys, tbounds, side="left").astype(jnp.int32)
    tile_starts = edges[:num_tiles]
    counts_t = edges[1:] - edges[:num_tiles]
    inst_rank = jnp.concatenate(
        [inst_rank, jnp.full((chunk,), n, jnp.int32)]
    )
    return BinnedInstances(
        inst_gid=inst_rank,
        tile_starts=tile_starts,
        tile_counts=counts_t.astype(jnp.int32),
        num_valid=num_valid,
        overflow=overflow,
        order=order.astype(jnp.int32),
        red=None,
    )


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
    radii_y: jnp.ndarray | None = None,
):
    """Inclusive-exclusive tile rectangle [x0, x1) x [y0, y1) per Gaussian.

    With `radii_y`, `radii` is the x half-extent and the rect is the tight
    anisotropic 3-sigma bbox; otherwise the isotropic square.

    `means2d` is either the (N, 2) stacked array or an (mx, my) tuple of
    (N,) vectors (SoA path: avoids the column reads of the lane-padded
    (N, 2) layout — scripts/layout_probe.py)."""
    if isinstance(means2d, tuple):
        mx, my = means2d
    else:
        mx, my = means2d[:, 0], means2d[:, 1]
    rx = radii.astype(jnp.float32)
    ry = rx if radii_y is None else radii_y.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((mx - rx) / tile_w), 0, tiles_x).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((mx + rx) / tile_w), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - ry) / tile_h), 0, tiles_y).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((my + ry) / tile_h), 0, tiles_y).astype(jnp.int32)
    alive = radii > 0 if radii_y is None else (radii > 0) & (radii_y > 0)
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
    aligned: bool = True,
    interpret: bool = False,
    _force_wide_keys: bool = False,
    _force_u32_keys: bool = False,
    radii_y: jnp.ndarray | None = None,
    cull_rows: jnp.ndarray | None = None,
    fused_keys: bool = False,
) -> BinnedInstances:
    """Build the sorted (tile-major, front-to-back) instance list.

    Args:
      means2d/radii/depths: (N,...) from `project_gaussians`.
      width/height: image size (static).
      tile_w/tile_h: tile size in px (static).
      budget: static max real instance count; beyond it the deepest
        Gaussians' instances are dropped entirely (reported via `overflow`).
      chunk: the blend kernel's Gaussian chunk size G.
      aligned: chunk-align each tile's range by injecting zero-opacity
        dummy instances (requires pre-sort per-tile counts via the SAT
        histogram). Needed by the BACKWARD kernels, whose per-chunk
        gradient writes must own their chunks exclusively. The
        forward-only inference path uses aligned=False: no dummies, no
        SAT pass, ~2/3 the binning cost; tile starts/counts fall out of
        the sorted keys by searchsorted and the blend kernel masks the
        unaligned head/tail lanes of each range.
      cull_rows: optional (N, 6) f32 [mx, my, conic_a, conic_b, conic_c,
        L=ln(255*o_eff)] enabling the exact ellipse-tile cull on the
        unaligned paths (see ellipse_tile_keep): instances whose tile has
        no pixel above the alpha floor are masked out of the sorted list.
        Ignored when aligned (the SAT dummy counts must match the rects).
      fused_keys: build the sort keys with the fused expansion+gather+cull
        Pallas kernel (pallas_kernel.expand_keys) instead of expand_gid +
        an (M,)-row gather + the XLA key chain — identical keys, fewer
        M-sized passes. Unaligned narrow-key paths only.

    `means2d` may be an (mx, my) tuple of (N,) vectors (SoA path — see
    tile_rects); everything downstream of the rects is component-wise
    either way, so the binning is bit-identical.
    """
    n = means2d[0].shape[0] if isinstance(means2d, tuple) else means2d.shape[0]
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    num_tiles = tiles_x * tiles_y
    m_real = ((budget + chunk - 1) // chunk) * chunk

    # single int32 keys ((tile << shift) | rank, shift = bits(n)) until the
    # packing overflows; the shift form keeps rank recovery a mask (no
    # M-sized division). Three key tiers: int32 while num_tiles << shift
    # < 2^31; uint32 up to 2^32 (1080p with 1M gaussians = 2040 tiles x
    # 2^20 ~ 2.1e9 lands here — one single-key sort, expand kernel
    # eligible); beyond that, sort (tile, rank) as a two-key
    # lexicographic lax.sort — ~1.5x the sort cost, same layout.
    shift = max(1, int(n).bit_length())  # 2**shift > n, so rank n fits too
    top = num_tiles << shift
    wide_keys = _force_wide_keys or top >= 2**32
    key_dtype = jnp.int32 if (top < 2**31 and not _force_u32_keys) else jnp.uint32
    key_max = jnp.asarray(jnp.iinfo(key_dtype).max, key_dtype)
    if tiles_x > 1023 or tiles_y > 1023:
        raise ValueError("tile grid exceeds the 10-bit rect packing")

    x0, y0, w, h, counts = tile_rects(
        means2d, radii, tile_w, tile_h, tiles_x, tiles_y, radii_y=radii_y
    )

    # --- depth-rank permutation: ONE (N, 4) gather ---------------------------
    # ALIVE-FIRST depth order: culled / zero-coverage gaussians sort after
    # every contributing one (their depth key is +inf). Blend order among
    # contributors is unchanged; the expansion kernel relies on every rank
    # before the budget cut owning >= 1 instance (a K-slot chunk then spans
    # <= K+1 consecutive ranks).
    order = jnp.argsort(jnp.where(counts > 0, depths, jnp.inf))
    # rects bit-packed so the per-instance gather below reads ONE int32
    packed = x0 | (y0 << 10) | (jnp.maximum(w, 1) << 20)
    do_cull = cull_rows is not None and not aligned
    tbl = jnp.stack([packed, counts, x0 + w, y0 + h], axis=1)
    if do_cull:
        # ride the existing N-row permutation gather (per-row bound:
        # widening its columns is ~free) with the cull rows, bitcast int32
        tbl = jnp.concatenate(
            [tbl, jax.lax.bitcast_convert_type(cull_rows, jnp.int32)], axis=1
        )
    # u16 bit-half gather: 32-bit row gathers are per-row bound (~5.4 ms
    # per 1M rows); the u16 split runs ~2.5x faster and is bit-exact
    tblp = fast_gather_rows(tbl, order)  # (N, 4 [+6])
    packed_p, counts_p = tblp[:, 0], tblp[:, 1]

    inc = jnp.cumsum(counts_p).astype(jnp.int32)  # inclusive
    offsets = inc - counts_p  # exclusive
    total = inc[n - 1]

    # budget cut in whole Gaussians: ranks whose full rect fits in m_real.
    # (A straddler is dropped entirely so the SAT counts below stay exact.)
    g_cut = jnp.searchsorted(inc, m_real, side="right").astype(jnp.int32)
    num_valid = jnp.where(g_cut > 0, inc[jnp.clip(g_cut - 1, 0, n - 1)], 0)
    overflow = total - num_valid

    if aligned:
        # --- per-tile counts via 2-D summed-area histogram (O(N log N) + O(T))
        # The ±1 corner contributions of each rect go into a (Ty+1, Tx+1) grid
        # whose 2-D cumsum is the per-tile cover count. XLA's scatter-add is
        # the slowest op on TPU (~9 ms for 4N updates); a sort + searchsorted
        # histogram of the corner cell ids is 4x faster. Only the aligned
        # (training) layout needs counts BEFORE the sort — to size each
        # tile's dummy padding.
        kept = (jnp.arange(n, dtype=jnp.int32) < g_cut) & (counts_p > 0)
        gx0 = tblp[:, 0] & 1023
        gy0 = (tblp[:, 0] >> 10) & 1023
        gx1 = tblp[:, 2]
        gy1 = tblp[:, 3]
        gw = tiles_x + 1
        ncells = (tiles_y + 1) * gw
        oob = jnp.int32(ncells)  # non-kept corners fall past the last boundary
        pos = jnp.concatenate(
            [jnp.where(kept, gy0 * gw + gx0, oob), jnp.where(kept, gy1 * gw + gx1, oob)]
        )
        neg = jnp.concatenate(
            [jnp.where(kept, gy0 * gw + gx1, oob), jnp.where(kept, gy1 * gw + gx0, oob)]
        )
        (pos_s,) = jax.lax.sort((pos,), num_keys=1, is_stable=False)
        (neg_s,) = jax.lax.sort((neg,), num_keys=1, is_stable=False)
        bounds = jnp.arange(ncells + 1, dtype=jnp.int32)
        hp = jnp.searchsorted(pos_s, bounds, side="left")
        hn = jnp.searchsorted(neg_s, bounds, side="left")
        grid = (hp[1:] - hp[:-1]) - (hn[1:] - hn[:-1])
        grid = grid.reshape(tiles_y + 1, gw)
        counts_t = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[:tiles_y, :tiles_x]
        counts_t = counts_t.reshape(num_tiles)

        padded_counts = ((counts_t + chunk - 1) // chunk) * chunk
        padded_counts = jnp.where(counts_t > 0, padded_counts, 0)
        tile_starts = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)

    # --- ragged→dense expansion + sort keys ----------------------------------
    # Fast path (inference, narrow keys, sizes exact in f32): the Pallas
    # expansion kernel builds every slot's key in one windowed pass
    # (telescoping step-function matmuls; see _expand_keys_kernel). The
    # general path uses one diff-scatter+cumsum spread + a u16 row-gather.
    use_expand_kernel = (
        not aligned and not wide_keys and m_real < 2**24 and n < 2**24
    )
    if use_expand_kernel:
        from gags_tpu.splat import pallas_kernel as _pk

        kk = _pk.EXPAND_K
        nc = -(-m_real // kk)
        mk = nc * kk
        n_pad = n + _pk.EXPAND_W + 128
        # owner starts at KEYS_SB granularity: both expand kernels bound
        # each sub-block's compare window to KEYS_WS lanes with these
        g_lo_sb = jnp.searchsorted(
            inc,
            jnp.arange(nc * (kk // _pk.KEYS_SB), dtype=jnp.int32)
            * _pk.KEYS_SB,
            side="right",
        ).astype(jnp.int32)
        if fused_keys and mk < 2**24 - 1:
            # fused kernel: per-rank attributes as one f32 table (every
            # value < 2^24 hence f32-exact); the kernel gathers them with
            # exact one-hot matmuls and emits the final keys directly
            pad_len = _pk.EXPAND_KW + 128

            def _row(vals, pad_val=0.0):
                return jnp.concatenate(
                    [
                        vals.astype(jnp.float32),
                        jnp.full((pad_len,), pad_val, jnp.float32),
                    ]
                )

            rows16 = [
                _row(jnp.minimum(offsets, m_real), float(m_real)),
                _row(packed_p & 1023),
                _row((packed_p >> 10) & 1023),
                _row((packed_p >> 20) & 1023, 1.0),
            ]
            if do_cull:
                cull_f = jax.lax.bitcast_convert_type(
                    tblp[:, 4:10], jnp.float32
                )
                rows16 += [_row(cull_f[:, i]) for i in range(6)]
            while len(rows16) < 16:
                rows16.append(jnp.zeros((n + pad_len,), jnp.float32))
            tbl16 = jnp.stack(rows16)
            keys, vcnt = _pk.expand_keys(
                tbl16, g_lo_sb, num_valid,
                shift=shift, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
                has_cull=do_cull, key_u32=key_dtype == jnp.uint32,
                interpret=interpret,
            )
            if do_cull:
                num_valid = jnp.sum(vcnt).astype(jnp.int32)
            (sorted_keys,) = jax.lax.sort((keys,), num_keys=1, is_stable=False)
            inst_rank = jnp.minimum(
                (sorted_keys & jnp.asarray((1 << shift) - 1, key_dtype)).astype(
                    jnp.int32
                ),
                n,
            )
            return _finish_unaligned(
                sorted_keys, inst_rank,
                num_tiles=num_tiles, shift=shift, wide_keys=False,
                key_dtype=key_dtype, chunk=chunk, n=n,
                num_valid=num_valid, overflow=overflow, order=order,
            )
        off_tbl = jnp.zeros((8, n_pad), jnp.int32)
        off_tbl = off_tbl.at[0, :n].set(offsets).at[0, n:].set(INT32_MAX)
        gid = jnp.clip(
            _pk.expand_gid(off_tbl, g_lo_sb, interpret=interpret), 0, n - 1
        )
        idx = jnp.arange(mk, dtype=jnp.int32)
        per_rank = jnp.stack([packed_p, offsets], axis=1)  # (N, 2)
        if do_cull:
            per_rank = jnp.concatenate([per_rank, tblp[:, 4:10]], axis=1)
        got = fast_gather_rows(per_rank, gid)  # (Mk, 2 [+6])
        pk_f = got[:, 0]
        slot = idx - got[:, 1]
        px0 = pk_f & 1023
        py0 = (pk_f >> 10) & 1023
        pw = (pk_f >> 20) & 1023
        dy = slot // pw
        dx = slot - dy * pw
        tile = (py0 + dy) * tiles_x + (px0 + dx)
        valid = idx < num_valid
        if do_cull:
            cull = jax.lax.bitcast_convert_type(got[:, 2:8], jnp.float32)
            valid = valid & ellipse_tile_keep(
                px0 + dx, py0 + dy, tile_w, tile_h, cull
            )
            num_valid = jnp.sum(valid).astype(jnp.int32)
        keys = jnp.where(
            valid,
            (tile.astype(key_dtype) << shift) | gid.astype(key_dtype),
            key_max,
        )
        (sorted_keys,) = jax.lax.sort((keys,), num_keys=1, is_stable=False)
        inst_rank = jnp.minimum(
            (sorted_keys & jnp.asarray((1 << shift) - 1, key_dtype)).astype(
                jnp.int32
            ),
            n,
        )
    if not use_expand_kernel:
        idx = jnp.arange(m_real, dtype=jnp.int32)
        rank = jnp.arange(n, dtype=jnp.int32)
        oidx = jnp.minimum(offsets, m_real)

        def spread(field):
            d = jnp.diff(field, prepend=jnp.zeros((1,), jnp.int32))
            acc = jnp.zeros((m_real + 1,), jnp.int32).at[oidx].add(
                d, indices_are_sorted=True
            )
            return jnp.cumsum(acc[:m_real])

        gid = jnp.clip(spread(rank), 0, n - 1)  # owning RANK
        per_rank = jnp.stack([packed_p, offsets], axis=1)  # (N, 2)
        if do_cull:
            per_rank = jnp.concatenate([per_rank, tblp[:, 4:10]], axis=1)
        got = fast_gather_rows(per_rank, gid)  # (M, 2 [+6])
        pk = got[:, 0]
        slot = idx - got[:, 1]
        px0 = pk & 1023
        py0 = (pk >> 10) & 1023
        pw = (pk >> 20) & 1023
        dy = slot // pw
        dx = slot - dy * pw
        tile = (py0 + dy) * tiles_x + (px0 + dx)
        valid = idx < num_valid
        if do_cull:
            cull = jax.lax.bitcast_convert_type(got[:, 2:8], jnp.float32)
            valid = valid & ellipse_tile_keep(
                px0 + dx, py0 + dy, tile_w, tile_h, cull
            )
            num_valid = jnp.sum(valid).astype(jnp.int32)

        # --- keys: real instances (+ per-tile alignment dummies if aligned) --
        if aligned:
            dummy_idx = jnp.arange(num_tiles * chunk, dtype=jnp.int32)
            d_tile = dummy_idx // chunk
            d_within = dummy_idx - d_tile * chunk
            pad_needed = padded_counts - counts_t  # in [0, chunk)
            d_ok = d_within < pad_needed[d_tile]

        if not wide_keys:
            key_real = jnp.where(
                valid,
                (tile.astype(key_dtype) << shift) | gid.astype(key_dtype),
                key_max,
            )
            if aligned:
                key_dummy = jnp.where(
                    d_ok,
                    (d_tile.astype(key_dtype) << shift)
                    | jnp.asarray(n, key_dtype),
                    key_max,
                )
                keys = jnp.concatenate([key_real, key_dummy])
            else:
                keys = key_real
            # keys are unique (one instance per gaussian-tile pair) — an
            # unstable sort avoids XLA's implicit iota payload
            (sorted_keys,) = jax.lax.sort((keys,), num_keys=1, is_stable=False)
            # rank recovery is a mask; key_max filler rows land past
            # every tile range (never read, grads pre-zeroed)
            inst_rank = jnp.minimum(
                (sorted_keys & jnp.asarray((1 << shift) - 1, key_dtype)).astype(
                    jnp.int32
                ),
                n,
            )
        else:
            k_tile = jnp.where(valid, tile, INT32_MAX)
            k_rank = jnp.where(valid, gid, n)
            if aligned:
                k_tile = jnp.concatenate(
                    [k_tile, jnp.where(d_ok, d_tile, INT32_MAX)]
                )
                k_rank = jnp.concatenate(
                    [k_rank, jnp.full((num_tiles * chunk,), n, jnp.int32)]
                )
            sorted_keys, inst_rank = jax.lax.sort(
                (k_tile, k_rank), num_keys=2, is_stable=False
            )
            inst_rank = jnp.minimum(inst_rank, n).astype(jnp.int32)

    if not aligned:
        return _finish_unaligned(
            sorted_keys, inst_rank, num_tiles=num_tiles,
            shift=shift, wide_keys=wide_keys, key_dtype=key_dtype,
            chunk=chunk, n=n, num_valid=num_valid, overflow=overflow,
            order=order,
        )

    return BinnedInstances(
        inst_gid=inst_rank,
        tile_starts=tile_starts,
        tile_counts=counts_t.astype(jnp.int32),
        num_valid=num_valid,
        overflow=overflow,
        order=order.astype(jnp.int32),
        # training (aligned) binnings carry the gradient-reduction layout;
        # the forward-only inference layout skips it
        red=reduction_layout(inst_rank, n) if aligned else None,
    )
