"""Pallas TPU kernels for tile-binned Gaussian alpha compositing.

Replaces the CUDA forward/backward blend kernels the reference uses through
gsplat (`gaussian_renderer/__init__.py:56-70`). TPU-first layout decisions:

  * A tile is TH x TW pixels, flattened to P = TH*TW sublanes. Gaussians are
    processed in depth-ordered chunks of G = 128 lanes; instance data is ONE
    (8+C, M) lane-major array, so each chunk is a single double-buffered DMA
    whose attribute rows ((1, G)) slice out with no transpose.
  * The front-to-back transmittance product is computed in log space as one
    (P, G) @ (G, G) triangular matmul on the MXU — a parallel prefix instead
    of the CUDA kernel's sequential per-Gaussian loop.
  * Colour accumulation is a (P, G) @ (G, C) MXU matmul of blend weights
    against the chunk's colour rows.
  * Per-pixel early termination (T < 1e-4, gsplat semantics) falls out of the
    same log-transmittance: a splat is included iff its *inclusive* naive
    transmittance stays above the threshold — exactly the reference's "skip
    the splat that would end the ray" rule; whole chunks stop via the
    while-loop condition once every pixel is saturated.
  * Instance ranges are G-aligned by the binner (dummy instances reference a
    zero-opacity padded Gaussian), so chunk DMAs never straddle tiles and the
    backward kernel's per-chunk gradient writes are race-free.

Numerics match `reference.rasterize_reference` (alpha floor 1/255, clamp
0.999, T epsilon 1e-4) to float tolerance (f32 HIGHEST-precision MXU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

SERIAL_DMA = os.environ.get("GAGS_SERIAL_DMA", "0") == "1"
# perf-ablation knobs (benchmark experiments; defaults are the shipped config)
# split2: the 0/1 triangular matrix is exact in bf16, so only the log-alpha
# operand needs hi/lo splitting — two DEFAULT passes instead of HIGHEST's
# six, with identical oracle parity (3.2e-5, scripts/tpu_validate.py)
TRI_MODE = os.environ.get("GAGS_TRI_MODE", "split2")  # highest|default|split2
NO_EARLY_EXIT = os.environ.get("GAGS_NO_EARLY_EXIT", "0") == "1"
FAKE_EXP = os.environ.get("GAGS_FAKE_EXP", "0") == "1"  # numerics-breaking probe

ALPHA_FLOOR = 1.0 / 255.0
ALPHA_CLAMP = 0.999
LOG_T_EPS = math.log(1e-4)

# attribute row layout in the (8+C, M) instance array
ROW_MX, ROW_MY, ROW_CA, ROW_CB, ROW_CC, ROW_OPAC, _ROW_PAD0, _ROW_PAD1 = range(8)
GEOM_ROWS = 8


def _pixel_coords(tile_idx, tiles_x: int, tile_h: int, tile_w: int, p: int):
    """(P, 1) pixel-centre coordinates of tile `tile_idx` (row-major tiles)."""
    ty = tile_idx // tiles_x
    tx = tile_idx - ty * tiles_x
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    row = pix // tile_w
    col = pix - row * tile_w
    px = (tx * tile_w + col).astype(jnp.float32) + 0.5
    py = (ty * tile_h + row).astype(jnp.float32) + 0.5
    return px, py


def _chunk_alpha(data, px, py):
    """Blend alpha for one chunk: (P, G) from the (8+C, G) data block."""
    mx = data[ROW_MX : ROW_MX + 1, :]  # (1, G)
    my = data[ROW_MY : ROW_MY + 1, :]
    ca = data[ROW_CA : ROW_CA + 1, :]
    cb = data[ROW_CB : ROW_CB + 1, :]
    cc = data[ROW_CC : ROW_CC + 1, :]
    op = data[ROW_OPAC : ROW_OPAC + 1, :]
    dx = px - mx  # (P, G)
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    vis = (1.0 - sigma) if FAKE_EXP else jnp.exp(-sigma)
    alpha = jnp.minimum(ALPHA_CLAMP, op * vis)
    live = (sigma >= 0.0) & (alpha >= ALPHA_FLOOR)
    return jnp.where(live, alpha, 0.0)


def _tri_incl(g: int) -> jnp.ndarray:
    """(G, G) ones where row <= col: cum[p, j] = sum_{k<=j} l[p, k]."""
    r = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (r <= c).astype(jnp.float32)


SCAN_BLOCK = 128  # tri-matmul width; cumsum cost stays LINEAR in chunk size


def _cumsum_lanes(x, g: int):
    """Inclusive prefix sum along lanes via blocked triangular matmuls.

    One (P, B) @ (B, B) per 128-lane block with a scalar-column carry — so a
    G=256/512 chunk costs the same MACs per splat as G=128, but the kernel's
    per-iteration overhead (DMA issue, loop bookkeeping) is amortised over
    more splats. Dtype-dispatched: f32 input follows TRI_MODE (split2 by
    default); bf16 input (the blend_bf16 pipeline) runs one DEFAULT-
    precision pass with a bf16-emitting MXU dot (f32 internal
    accumulation) — tri is an exact 0/1 matrix in both dtypes, so only
    the input stream's precision differs.
    """
    bf16 = x.dtype == jnp.bfloat16
    b = min(SCAN_BLOCK, g)
    tri = _tri_incl(b).astype(x.dtype) if bf16 else _tri_incl(b)
    dn = (((1,), (0,)), ((), ()))

    def tri_dot(xs):
        if bf16:
            # Mosaic's tpu.matmul requires a 32-bit accumulator (bf16
            # preferred_element_type fails verification on hardware) — ask
            # for f32 and narrow the result; the MXU pass is the same.
            return jax.lax.dot_general(
                xs, tri, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        if TRI_MODE == "default":
            return jax.lax.dot_general(
                xs, tri, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
        if TRI_MODE == "split2":
            # tri is 0/1 (exact in bf16); only xs needs splitting — two
            # DEFAULT passes instead of HIGHEST's six
            hi = xs.astype(jnp.bfloat16).astype(jnp.float32)
            lo = xs - hi
            return jax.lax.dot_general(
                hi, tri, dimension_numbers=dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                lo, tri, dimension_numbers=dn, preferred_element_type=jnp.float32
            )
        return jax.lax.dot_general(
            xs, tri, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    blocks = []
    carry = jnp.zeros((x.shape[0], 1), x.dtype)
    for s in range(g // b):
        cum_s = carry + tri_dot(x[:, s * b : (s + 1) * b])
        carry = cum_s[:, b - 1 : b]
        blocks.append(cum_s)
    return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=1)


def _blend_weights(alpha, log_t, g: int):
    """Per-splat blend weights + updated log transmittance for one chunk.

    Returns (w, log_t_incl_masked, new_log_t):
      w[p, j]           = alpha * T_before * include  (compositing weight)
      log_t_incl_masked = inclusive naive log T where included, else 0
      new_log_t         = naive log T after the whole chunk
    """
    l1m = (-alpha) if FAKE_EXP else jnp.log1p(-alpha)  # (P, G); 0 for skipped
    cum_incl = _cumsum_lanes(l1m, g)
    log_t_incl = log_t + cum_incl  # (P, G) naive inclusive
    log_t_excl = log_t_incl - l1m  # exclusive (T before this splat)
    include = log_t_incl >= LOG_T_EPS
    t_excl = (1.0 + log_t_excl) if FAKE_EXP else jnp.exp(log_t_excl)
    w = jnp.where(include, alpha * t_excl, 0.0)
    new_log_t = log_t + cum_incl[:, g - 1 : g]
    return w, jnp.where(include, log_t_incl, 0.0), new_log_t


def _forward_kernel(
    # scalar prefetch
    tile_starts_ref,
    tile_counts_ref,
    # inputs
    data_hbm,  # (8+C, M): geometry rows then colour rows (HBM/ANY)
    bg_ref,  # (1, C) VMEM: background row, blended in-kernel against the
             # residual transmittance (keeps the alpha channel DCE-able
             # for image-only consumers — the out[..., -1:] slice of a
             # 17-lane minor dim cost ~2 ms in XLA relayouts)
    # output (VMEM block)
    out_ref,  # (1, P, C+1): C colour channels then alpha
    # scratch
    buf,  # (2, 8+C, G) double buffer
    acc_ref,  # (P, C)
    sems,  # DMA semaphores (2,)
    *,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    g: int,
    aligned: bool = True,
):
    t = pl.program_id(0)
    start = tile_starts_ref[t]
    count = tile_counts_ref[t]
    p = tile_h * tile_w
    c = acc_ref.shape[1]

    px, py = _pixel_coords(t, tiles_x, tile_h, tile_w, p)
    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    if aligned:
        lead = jnp.int32(0)
        base = start
        nchunks = pl.cdiv(count, g)
    else:
        # unaligned (inference) layout: ranges start anywhere; DMA from the
        # enclosing chunk-aligned window and mask the head/tail lanes
        lead = jax.lax.rem(start, g)
        base = start - lead
        nchunks = jnp.where(count > 0, pl.cdiv(lead + count, g), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)

    def dma(k, slot):
        off = pl.multiple_of(base + k * g, g)
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(off, g)], buf.at[slot], sems.at[slot]
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def cond(carry):
        k, log_t, _ = carry
        if NO_EARLY_EXIT:
            return k < nchunks
        return jnp.logical_and(k < nchunks, jnp.max(log_t) >= LOG_T_EPS)

    def body(carry):
        k, log_t, log_t_rep = carry
        slot = jax.lax.rem(k, 2)

        if not SERIAL_DMA:
            # overlap: issue the next chunk's load before computing this one
            @pl.when(k + 1 < nchunks)
            def _():
                dma(k + 1, 1 - slot).start()
        else:
            @pl.when(k > 0)
            def _():
                dma(k, slot).start()

        dma(k, slot).wait()
        data = buf[slot]  # (8+C, G)

        alpha = _chunk_alpha(data, px, py)  # (P, G)
        if not aligned:
            j = k * g + lane  # global position within the aligned window
            alpha = jnp.where((j >= lead) & (j < lead + count), alpha, 0.0)
        w, log_t_incl_masked, new_log_t = _blend_weights(alpha, log_t, g)

        # colour accumulation: (P, G) x (C, G) -> (P, C) on the MXU
        acc_ref[:, :] += jax.lax.dot_general(
            w,
            data[GEOM_ROWS:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        chunk_min = jnp.min(
            jnp.where(log_t_incl_masked < 0.0, log_t_incl_masked, 0.0),
            axis=1,
            keepdims=True,
        )
        log_t_rep = jnp.minimum(log_t_rep, chunk_min)
        return k + 1, new_log_t, log_t_rep

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((p, 1), jnp.float32),
        jnp.zeros((p, 1), jnp.float32),
    )
    k_done, _, log_t_rep = jax.lax.while_loop(cond, body, init)

    # early exit leaves the prefetched chunk k_done in flight — drain it
    @pl.when(jnp.logical_and(k_done < nchunks, k_done > 0))
    def _():
        dma(k_done, jax.lax.rem(k_done, 2)).wait()

    t_fin = jnp.exp(log_t_rep)  # (P, 1) residual transmittance
    out_ref[0, :, :c] = acc_ref[:, :] + t_fin * bg_ref[0:1, :]
    out_ref[0, :, c : c + 1] = 1.0 - t_fin


INV_LN2 = 1.0 / math.log(2.0)
LOG2_T_EPS = math.log2(1e-4)
LOG2_ALPHA_CLAMP = math.log2(ALPHA_CLAMP)


def _tri_strict(g: int) -> jnp.ndarray:
    """(G, G) ones where row < col: the EXCLUSIVE prefix operand."""
    r = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (r < c).astype(jnp.float32)


def _cumsum_lanes_pair(x, g: int):
    """(inclusive, exclusive) lane prefix sums, both f32, one shared carry.

    Used by the bf16 blend pipeline: x is the bf16 log(1-alpha) row; both
    tri operands are exact 0/1 matrices and the MXU accumulates f32, so
    the exclusive prefix (T before each splat) costs one extra idle-MXU
    pass instead of an f32 re-extension + subtract of the bf16 row on the
    VPU (packed-bf16 elementwise measured ~3x slower per pair than f32 on
    this Mosaic — r4 slab probe)."""
    b = min(SCAN_BLOCK, g)
    tri_i = _tri_incl(b).astype(x.dtype)
    tri_x = _tri_strict(b).astype(x.dtype)
    dn = (((1,), (0,)), ((), ()))

    inc_blocks, exc_blocks = [], []
    carry = jnp.zeros((x.shape[0], 1), jnp.float32)
    for s in range(g // b):
        xs = x[:, s * b : (s + 1) * b]
        inc_s = carry + jax.lax.dot_general(
            xs, tri_i, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        exc_s = carry + jax.lax.dot_general(
            xs, tri_x, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        carry = inc_s[:, b - 1 : b]
        inc_blocks.append(inc_s)
        exc_blocks.append(exc_s)
    if len(inc_blocks) == 1:
        return inc_blocks[0], exc_blocks[0]
    return (
        jnp.concatenate(inc_blocks, axis=1),
        jnp.concatenate(exc_blocks, axis=1),
    )


def _forward_fast_kernel(
    # scalar prefetch
    tile_starts_ref,
    tile_counts_ref,
    # inputs + output + scratch
    *refs,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    g: int,
    p_block: int,
    mxu_sigma: bool,
    blend_bf16: bool,
    exit_stats: bool = False,
    block_exit: bool = False,
):
    """Inference-only forward blend (unaligned ranges), VMEM-traffic-dieted.

    The baseline kernel is NOT ALU-bound: drain-timed ablations at
    720p/250k (scripts/blend_ablate.py) show removing all transcendentals
    saves only ~9% and pair-count reductions (16x16 tiles, 0.56x pairs)
    barely move it — each (P, G) f32 elementwise op streams ~0.5 MB
    through VMEM (~57 ns measured), so cost ≈ #materialised (P, G) ops.
    This kernel cuts them: per-lane (1, G) work replaces (P, G) work
    wherever possible (range masking folded into the opacity row; the
    0.5x, 1/ln2, -1 sign, opacity, PSD clamp and 0.999 alpha-clamp
    constants ALL fold into the per-lane conic rows and one per-lane
    bound, so the whole alpha pipeline is min + exp2 + floor-select),
    and the pixel dimension is processed in `p_block` slabs so live
    temporaries fit closer to the register file. Numerics are exact f32
    (same alpha floor/clamp/early-stop semantics — the 0.999 clamp moves
    into the exponent domain, a <=1-ulp reassociation); colour rows may
    be bf16 (fast_color_rows) — colour matmul error ~1e-3 relative,
    geometry math unaffected.

    refs = (geom_hbm (8, M) f32, col_hbm (C, M), bg, out,
    gbuf (2, 8, SEG), cbuf (2, C, SEG), acc, sems (4,)).

    The blend_bf16 pipeline keeps every ELEMENTWISE op in f32 — the r4
    slab probe measured packed-bf16 elementwise chains ~3x SLOWER per
    pair than f32 on this Mosaic (262 vs 82 ps at slab 256) — and spends
    bf16 only where it wins: the two MXU operand streams (log(1-a) rows
    into the transmittance tri-matmul, blend weights into the colour
    matmul) and the colour rows themselves. Transmittance runs in LN
    units (the tri matrix stays an exact 0/1 operand; no INV_LN2
    constants to round to bf16); a second strictly-triangular MXU pass
    yields the EXCLUSIVE prefix directly, so the backward-shift
    `lt_incl - l1m` (an f32 re-extension of a bf16 row, two ops) is
    replaced by idle-MXU work."""
    lt_ref = None
    if exit_stats and block_exit:
        (geom_hbm, col_hbm, bg_ref, out_ref, stats_ref, gbuf, cbuf,
         acc_ref, lt_ref, sems) = refs
    elif exit_stats:
        (geom_hbm, col_hbm, bg_ref, out_ref, stats_ref, gbuf, cbuf,
         acc_ref, sems) = refs
    elif block_exit:
        (geom_hbm, col_hbm, bg_ref, out_ref, gbuf, cbuf, acc_ref,
         lt_ref, sems) = refs
    else:
        geom_hbm, col_hbm, bg_ref, out_ref, gbuf, cbuf, acc_ref, sems = refs
    t = pl.program_id(0)
    start = tile_starts_ref[t]
    count = tile_counts_ref[t]
    p = tile_h * tile_w
    c = acc_ref.shape[1] - 1  # last acc column accumulates sum(w)
    # bf16 transmittance path runs in LN units (natural-log tri matmul
    # stays an exact 0/1 matrix; no INV_LN2 constants to round to bf16)
    t_eps = jnp.float32(LOG_T_EPS if blend_bf16 else LOG2_T_EPS)
    nb = p // p_block
    # segment width (chunks per DMA * g)
    seg_w = gbuf.shape[2]
    cpseg = seg_w // g

    # per-tile pixel coordinates, per p-block (static python loop)
    px_full, py_full = _pixel_coords(t, tiles_x, tile_h, tile_w, p)

    if mxu_sigma:
        # sigma as ONE (P, 8) @ (8, G) MXU matmul per chunk: expand the
        # quadratic form in TILE-CENTRED pixel coords (u, v) so every term
        # stays O(conic * tile_radius^2) and f32 cancellation error lands
        # ~1e-4 in log2-sigma (~7e-5 relative alpha — an order below the
        # bf16 colour-row error this path already accepts). Replaces ~9
        # materialised (P, G) VPU ops with per-lane coefficient prep.
        ty = t // tiles_x
        tx = t - ty * tiles_x
        ox = (tx * tile_w).astype(jnp.float32) + 0.5 * (tile_w - 1) + 0.5
        oy = (ty * tile_h).astype(jnp.float32) + 0.5 * (tile_h - 1) + 0.5
        u = px_full - ox  # (P, 1), in [-(tw-1)/2, (tw-1)/2]
        v = py_full - oy
        ones = jnp.ones_like(u)
        zeros = jnp.zeros_like(u)
        x_feat = jnp.concatenate(
            [u * u, u * v, v * v, u, v, ones, zeros, zeros], axis=1
        )  # (P, 8)

    lead = jax.lax.rem(start, g)
    base = start - lead
    nchunks = jnp.where(count > 0, pl.cdiv(lead + count, g), 0)
    nseg = pl.cdiv(nchunks, cpseg)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)

    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    if block_exit:
        # per-pixel log-T lives in VMEM instead of the loop carry so each
        # p_block slab can be SKIPPED once all its pixels saturate (the
        # CUDA reference retires per-pixel threads; a p_block-pixel vector
        # slab is the finest granularity that costs nothing here). Exactly
        # output-preserving: a saturated block's pairs already blend with
        # w = 0, so skipping its matmuls changes no byte of the image.
        # The while carries hold only the TILE max (scalar) for the
        # existing tile-level exit condition.
        lt_ref[:, :] = jnp.zeros_like(lt_ref)

    def dma_seg(s, slot):
        # whole-segment streaming: ONE (8+C, seg_w) DMA pair per up-to-
        # `cpseg` chunks — per-chunk (24, 128) DMAs left the loop latency-
        # bound (~3 us/chunk measured with compute ~1 us; see fast_sweep)
        off = pl.multiple_of(base + s * seg_w, g)
        a = pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(off, seg_w)], gbuf.at[slot], sems.at[slot]
        )
        b = pltpu.make_async_copy(
            col_hbm.at[:, pl.ds(off, seg_w)], cbuf.at[slot], sems.at[2 + slot]
        )
        return a, b

    def seg_start(s, slot):
        for d in dma_seg(s, slot):
            d.start()

    def seg_wait(s, slot):
        for d in dma_seg(s, slot):
            d.wait()

    @pl.when(nseg > 0)
    def _():
        seg_start(0, 0)

    def seg_cond(carry):
        # exit_stats threads a chunks-done counter through the carry; the
        # default path's carry is unchanged (identical code to r4).
        s, log_t = carry[0], carry[-1]
        return jnp.logical_and(s < nseg, jnp.max(log_t) >= t_eps)

    def seg_body(carry):
        if exit_stats:
            s, kd0, log_t0 = carry
        else:
            s, log_t0 = carry
        slot = jax.lax.rem(s, 2)

        @pl.when(s + 1 < nseg)
        def _():
            seg_start(s + 1, 1 - slot)

        seg_wait(s, slot)
        nc_here = jnp.minimum(nchunks - s * cpseg, cpseg)

        def chunk_cond(carry):
            k, log_t = carry
            return jnp.logical_and(k < nc_here, jnp.max(log_t) >= t_eps)

        def chunk_body(carry):
            # log_t: NAIVE cumulative log2 T (monotone decreasing — drives
            # the include test, so a pixel stays stopped after its first
            # crossing). The accumulated blend weight of INCLUDED splats
            # rides the colour matmul as an appended ones-row (acc column
            # c); since the included set is a prefix, sum(w) telescopes to
            # 1 - T_after_last_included exactly — no min-tracking needed.
            k, log_t = carry
            rows = gbuf[slot, :, pl.ds(k * g, g)]  # (8, G) f32
            # constants folded into the per-lane conic rows. mxu_sigma
            # additionally folds the -1 sign so the matmul emits
            # log2(alpha_unclamped) = -sigma*log2(e) + log2(op) directly:
            # alpha = exp2(min(s2n, bound)) with NO negation op.
            csign = -1.0 if mxu_sigma else 1.0
            ca = rows[2:3, :] * (csign * 0.5 * INV_LN2)
            cb = rows[3:4, :] * (csign * INV_LN2)
            cc = rows[4:5, :] * (csign * 0.5 * INV_LN2)
            # unaligned head/tail masking folded into the opacity LANE row
            j = (s * cpseg + k) * g + lane
            opm = jnp.where(
                (j >= lead) & (j < lead + count), rows[5:6, :], 0.0
            )
            if mxu_sigma:
                # ONE per-lane bound replaces three (P, G) ops: the PSD
                # sigma >= 0 clamp (negatives are fp noise at the centre;
                # the reference keeps these splats), the opacity bound
                # alpha <= op, and the 0.999 alpha clamp — all are upper
                # bounds on log2(alpha). Masked/sentinel lanes (op = 0)
                # bound to -1e4, which underflows exp2 to exactly 0.
                m2c = jnp.where(
                    opm > 0.0,
                    jnp.minimum(jnp.log2(opm), jnp.float32(LOG2_ALPHA_CLAMP)),
                    jnp.float32(-1e4),
                )
            cdt = jnp.bfloat16 if blend_bf16 else jnp.float32
            col_rows = cbuf[slot, :, pl.ds(k * g, g)].astype(cdt)
            colors = jnp.concatenate(
                [
                    col_rows,
                    jnp.ones((1, g), cdt),  # sum(w) fold row
                ],
                axis=0,
            )  # (C + 1, G)
            if mxu_sigma:
                # polynomial coefficients of log2(alpha) in tile-centred
                # (u, v): all per-lane (1, G) work (signs folded above)
                du = rows[0:1, :] - ox
                dv = rows[1:2, :] - oy
                a2du = 2.0 * (ca * du)
                bdv = cb * dv
                coef = jnp.concatenate(
                    [
                        ca,
                        cb,
                        cc,
                        -(a2du + bdv),
                        -(2.0 * (cc * dv) + cb * du),
                        0.5 * (a2du * du) + dv * (cb * du + cc * dv) + m2c,
                        jnp.zeros_like(ca),
                        jnp.zeros_like(ca),
                    ],
                    axis=0,
                )  # (8, G)
            else:
                mx = rows[0:1, :]
                my = rows[1:2, :]

            def block_compute(sl, lt):
                """One (p_block, G) slab: accumulates into acc_ref[sl]
                and returns the slab's new log-T column (same math as
                before the block_exit refactor — byte-identical HLO ops
                for the default path)."""
                if mxu_sigma:
                    s2n = jax.lax.dot_general(
                        x_feat[sl], coef,  # (Pb, 8) x (8, G)
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # log2(alpha), unclamped
                    alpha = jnp.exp2(jnp.minimum(s2n, m2c))
                    # the 1/255 floor stays a VALUE-domain test (exactly
                    # the oracle's semantics: an exponent-domain threshold
                    # would flip inclusion of floor-adjacent splats by the
                    # rounding of log2(1/255))
                    alpha = jnp.where(alpha >= ALPHA_FLOOR, alpha, 0.0)
                    if blend_bf16:
                        # precision-for-bandwidth mode, ELEMENTWISE-f32:
                        # the r4 slab probe measured packed-bf16
                        # elementwise ~3x slower per pair than f32 on this
                        # Mosaic, so bf16 appears ONLY as MXU operands
                        # (l1m rows, blend weights, colour rows). The
                        # strictly-triangular second MXU pass provides the
                        # exclusive prefix (T before each splat) without
                        # re-extending the bf16 l1m row to f32. Measured
                        # image error vs the f32 path ~1e-2 relative
                        # (tests/test_pallas_rasterizer.py). Transmittance
                        # runs in LN units: the tri operands stay exact
                        # 0/1 matrices with no INV_LN2 rounding.
                        l1m_b = jnp.log1p(-alpha).astype(jnp.bfloat16)
                        inc, exc = _cumsum_lanes_pair(l1m_b, g)  # f32 out
                        lt_i = lt + inc  # ln units, f32 carry
                        earg = jnp.where(
                            lt_i >= LOG_T_EPS, lt + exc, jnp.float32(-1e4)
                        )  # excluded splats underflow exp to exactly 0
                        w = alpha * jnp.exp(earg)
                        acc_ref[sl, :] += jax.lax.dot_general(
                            w.astype(jnp.bfloat16), colors,  # bf16 MXU
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        return lt_i[:, g - 1 : g]
                else:
                    dx = px_full[sl] - mx  # (Pb, G)
                    dy = py_full[sl] - my
                    s2 = (ca * dx) * dx + (cb * dx + cc * dy) * dy
                    alpha = jnp.minimum(ALPHA_CLAMP, opm * jnp.exp2(-s2))
                    live = (s2 >= 0.0) & (alpha >= ALPHA_FLOOR)
                    alpha = jnp.where(live, alpha, 0.0)
                l1m = jnp.log1p(-alpha) * INV_LN2  # log2(1 - alpha)
                cum = _cumsum_lanes(l1m, g)
                lt_incl = lt + cum
                include = lt_incl >= LOG2_T_EPS
                w = jnp.where(
                    include, alpha * jnp.exp2(lt_incl - l1m), 0.0
                )
                acc_ref[sl, :] += jax.lax.dot_general(
                    w, colors,  # (Pb, G) x (C+1, G) -> (Pb, C+1)
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return lt + cum[:, g - 1 : g]

            if block_exit:
                # skip saturated slabs; log_t carry is the tile max scalar
                for b in range(nb):
                    sl = slice(b * p_block, (b + 1) * p_block)

                    @pl.when(jnp.max(lt_ref[sl, :]) >= t_eps)
                    def _(sl=sl):
                        lt_ref[sl, :] = block_compute(sl, lt_ref[sl, :])

                return (k + 1, jnp.max(lt_ref[:, :]))
            new_log_t = [
                block_compute(
                    slice(b * p_block, (b + 1) * p_block),
                    log_t[b * p_block : (b + 1) * p_block],
                )
                for b in range(nb)
            ]
            return (k + 1, jnp.concatenate(new_log_t, axis=0))

        k_done, log_t1 = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.zeros((), jnp.int32), log_t0)
        )
        if exit_stats:
            return s + 1, kd0 + k_done, log_t1
        return s + 1, log_t1

    zero = jnp.zeros((), jnp.int32)
    log_t_init = (
        jnp.zeros((), jnp.float32) if block_exit  # tile max; slabs in VMEM
        else jnp.zeros((p, 1), jnp.float32)
    )
    init = (zero, zero, log_t_init) if exit_stats else (zero, log_t_init)
    done = jax.lax.while_loop(seg_cond, seg_body, init)
    s_done = done[0]
    aw_fin = acc_ref[:, c : c + 1]

    # early exit leaves the prefetched segment in flight — drain it
    @pl.when(jnp.logical_and(s_done < nseg, s_done > 0))
    def _():
        seg_wait(s_done, jax.lax.rem(s_done, 2))

    # T after the last included splat = 1 - sum of included blend weights
    # (exact telescoping; clamp shields the ~1-ulp fp overshoot)
    t_fin = jnp.maximum(1.0 - aw_fin, 0.0)
    out_ref[0, :, :c] = acc_ref[:, :c] + t_fin * bg_ref[0:1, :]
    out_ref[0, :, c : c + 1] = 1.0 - t_fin

    if exit_stats:
        # per-tile early-exit counters, row 0 lanes 0-3: segments done,
        # total segments, chunks done, total chunks; lane 4: final max
        # ungated log-T (the exit quantity — lets probes see how far the
        # slowest pixel is from t_eps). Whole-(8, 128) write (Mosaic
        # minor-dim rule: no sub-128-lane windows).
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lanec = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        k_total = done[1]
        lt_fin = (
            jnp.max(lt_ref[:, :]) if block_exit else jnp.max(done[-1])
        )
        v = jnp.where(
            lanec == 0, s_done.astype(jnp.float32),
            jnp.where(
                lanec == 1, nseg.astype(jnp.float32),
                jnp.where(
                    lanec == 2, k_total.astype(jnp.float32),
                    jnp.where(
                        lanec == 3, nchunks.astype(jnp.float32),
                        jnp.where(lanec == 4, lt_fin, 0.0),
                    ),
                ),
            ),
        )
        stats_ref[0] = jnp.where(row == 0, v, 0.0)


SEG_CHUNKS = 8  # chunks streamed per segment DMA in the fast kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "tiles_x", "tiles_y", "tile_h", "tile_w", "chunk", "p_block",
        "seg_chunks", "mxu_sigma", "blend_bf16", "interpret", "exit_stats",
        "block_exit",
    ),
)
def tile_blend_forward_fast(
    geom_inst: jnp.ndarray,   # (8, M) f32
    color_inst: jnp.ndarray,  # (C, M) f32 or bf16
    tile_starts: jnp.ndarray,
    tile_counts: jnp.ndarray,
    bg: jnp.ndarray | None = None,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_h: int,
    tile_w: int,
    chunk: int = 128,
    p_block: int = 1024,
    seg_chunks: int = SEG_CHUNKS,
    mxu_sigma: bool = True,
    blend_bf16: bool = False,
    interpret: bool = False,
    exit_stats: bool = False,
    block_exit: bool = False,
):
    """Inference forward blend over unaligned ranges. Returns (T, P, C+1).

    Instance arrays must carry >= seg_chunks*chunk rows of sentinel slack
    past the last tile range (zero rows — the rasterizer pads the gather
    index list): segment DMAs read whole seg windows.

    exit_stats=True additionally returns a (T, 8, 128) f32 counter block:
    row 0 lanes 0-3 = (segments done, total segments, chunks done, total
    chunks) per tile — the kernel's OWN early-termination telemetry for
    trained-scene analysis (scripts/trained_scene_bench.py). The default
    path's loop carries are unchanged.
    """
    num_tiles = tiles_x * tiles_y
    p = tile_h * tile_w
    c = color_inst.shape[0]
    m = geom_inst.shape[1]
    p_block = min(p_block, p)
    if p % p_block:
        # non-power-of-two tile areas: largest common divisor keeps the
        # requested slab size a clean split of the pixel block
        import math

        p_block = math.gcd(p, p_block)
    assert p % min(128, p) == 0
    if bg is None:
        bg = jnp.zeros((c,), jnp.float32)
    bg2d = bg.reshape(1, c).astype(jnp.float32)

    out_block = (1, p, c + 1)
    out_specs = [
        pl.BlockSpec(
            out_block, lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((num_tiles,) + out_block[1:], jnp.float32)]
    if exit_stats:
        out_specs.append(
            pl.BlockSpec(
                (1, 8, 128), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((num_tiles, 8, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, c), lambda t, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_ROWS, seg_chunks * chunk), jnp.float32),
            pltpu.VMEM((2, c, seg_chunks * chunk), color_inst.dtype),
            pltpu.VMEM((p, c + 1), jnp.float32),
        ]
        + ([pltpu.VMEM((p, 1), jnp.float32)] if block_exit else [])
        + [
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    if blend_bf16 and not mxu_sigma:
        raise ValueError("blend_bf16 requires mxu_sigma")
    kernel = functools.partial(
        _forward_fast_kernel, tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w,
        g=chunk, p_block=p_block, mxu_sigma=mxu_sigma, blend_bf16=blend_bf16,
        exit_stats=exit_stats, block_exit=block_exit,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=_fwd_cost(num_tiles, p, chunk, c, m),
        interpret=interpret,
    )(tile_starts, tile_counts, geom_inst, color_inst, bg2d)
    if exit_stats:
        return outs[0], outs[1]
    return outs[0]


def _flat_pack(res, g: int, c: int):
    """Pack (G, C) rows into the flat row-major (G*C/128, 128) view via
    exact 0/1 selection matmuls (see the call site's note). Requires
    (g * c) % 128 == 0 and 128 % c == 0."""
    f = 128 // c
    rows = (g * c) // 128
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, g), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, g), 1)
    ch_idx = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 0)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 1)
    out = jnp.zeros((rows, 128), jnp.float32)
    for s in range(f):
        p_s = (j_idx == r_idx * f + s).astype(jnp.float32)
        q_s = (l_idx == s * c + ch_idx).astype(jnp.float32)
        picked = jax.lax.dot_general(  # (rows, C): rows r get instance r*f+s
            p_s, res, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out = out + jax.lax.dot_general(  # lanes [s*C, s*C+C) <- picked
            picked, q_s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return out


def _backward_kernel(
    tile_starts_ref,
    tile_counts_ref,
    data_hbm,  # (8+C, M) — only the 8 geometry rows are read
    gout_ref,  # (1, P, C) upstream gradient block
    grad_colors_hbm,  # output: flat (M*C/128, 128) row-major view (see dma_out)
    buf,  # (2, 8, G) input double buffer (geometry rows only)
    gcol0,  # (G*C/128, 128) output buffer, even chunks
    gcol1,  # (G*C/128, 128) output buffer, odd chunks
    sems,  # (4,): 2 input slots + 2 output slots
    *,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    g: int,
    c: int,
    rowpad: bool,
):
    """d L / d colors_inst, written chunk-by-chunk in ROW-major order.

    Recomputes blend weights (no residuals are stored by the forward):
    grad_colors[j, c] = sum_p w[p, j] * gout[p, c] — one MXU matmul/chunk.
    Input loads AND gradient writes are double-buffered; the output buffer
    arrives pre-zeroed (aliased), so chunks skipped by per-pixel early
    termination need no zero-fill pass.
    """
    t = pl.program_id(0)
    start = tile_starts_ref[t]
    count = tile_counts_ref[t]
    p = tile_h * tile_w

    px, py = _pixel_coords(t, tiles_x, tile_h, tile_w, p)
    nchunks = pl.cdiv(count, g)
    gout = gout_ref[0, :, :]  # (P, C)
    if rowpad:
        # fallback shape (GAGS_BWD_ROWPAD=1): lane-pad the cotangent to 128
        # channels so the chunk matmul emits (G, 128) directly — guaranteed
        # tile-aligned DMA windows at 8x the MXU flops (~2 ms/step extra).
        gout = jnp.concatenate(
            [gout, jnp.zeros((p, 128 - c), jnp.float32)], axis=1
        )

    def dma_in(k, slot):
        off = pl.multiple_of(start + k * g, g)
        return pltpu.make_async_copy(
            data_hbm.at[:GEOM_ROWS, pl.ds(off, g)], buf.at[slot], sems.at[slot]
        )

    # ROW-major gradient output: a G-row span of row-major (M, C) is one
    # contiguous HBM write (the old (C, M) layout wrote C strided spans),
    # and — decisively — the downstream ReductionLayout u16-table build +
    # red_slot row gather see a CANONICAL array. The (C, M) output's
    # transposed view poisoned that gather to per-element stride (HLO
    # fusion.9 = 17.5 ms/step at 360p/300k), and every XLA- or Pallas-side
    # relayout attempt LOST (identity dot: flat — layout walks through it;
    # Pallas canonical copy: +7 ms — XLA materialises the pathological
    # transpose before the custom call). Emitting rows from the kernel is
    # conversion-free.
    #
    # Mosaic memref windows must span whole 128-lane tiles on the minor
    # dim, which rules out (G, C<128) windows of an (M, C) buffer ("slice
    # shape along dimension 1 must be aligned to tiling (128), but is 16"
    # — found on-hardware only; interpret mode doesn't enforce tiling).
    # So the HBM buffer is the FLAT row-major view (M*C/128, 128): bit-
    # identical bytes, every chunk window (G*C/128, 128) spans full tiles,
    # and the caller reshapes back to (M, C) for free (row-major bitcast).
    #
    # `which` is a PYTHON int: the double buffer is two separate refs
    # selected by pl.when predication, NOT a (2, ...) stack indexed at the
    # traced slot — that slice trips the same minor-dim tiling rule.
    rows_per_chunk = g if rowpad else (g * c) // 128

    def dma_out(k, which):
        ref = gcol0 if which == 0 else gcol1
        off_flat = pl.multiple_of(
            (start + k * g) * rows_per_chunk // g, rows_per_chunk
        )
        return pltpu.make_async_copy(
            ref,
            grad_colors_hbm.at[pl.ds(off_flat, rows_per_chunk), :],
            sems.at[2 + which],
        )

    @pl.when(nchunks > 0)
    def _():
        dma_in(0, 0).start()

    def cond(carry):
        k, log_t = carry
        return jnp.logical_and(k < nchunks, jnp.max(log_t) >= LOG_T_EPS)

    def body(carry):
        k, log_t = carry
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nchunks)
        def _():
            dma_in(k + 1, 1 - slot).start()

        dma_in(k, slot).wait()
        alpha = _chunk_alpha(buf[slot], px, py)
        w, _, new_log_t = _blend_weights(alpha, log_t, g)

        # grad[j, c] = sum_p w[p, j] gout[p, c]: ONE dim-0/dim-0
        # contraction — no transpose of w or gout anywhere (the MXU
        # handles the transposed-lhs form natively)
        res = jax.lax.dot_general(
            w,  # (P, G)
            gout,  # (P, C) — (P, 128) in rowpad mode
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (G, C) / (G, 128)
        if not rowpad:
            # (G, C) -> flat row-major (G*C/128, 128) WITHOUT a value
            # reshape: Mosaic rejects the cross-lane (G, C)->(G*C/128,
            # 128) reshape on-device (battery 8 — it is a sublane->lane
            # repack, not a relayout-free view). Instead pack via F =
            # 128/C exact 0/1 selection-matmul pairs on the idle MXU:
            #   flat = sum_s P_s @ res @ Q_s
            # P_s (rows, G) picks instance rows s, s+F, s+2F, ...; Q_s
            # (C, 128) places their C channels at lanes [s*C, s*C+C).
            # Every product is 1.0*x (exact under HIGHEST's f32-split
            # passes) and every output element sums exactly ONE nonzero
            # => bit-identical bytes to the reshape. Cost: G*G*C +
            # G*C*128 MACs/chunk = ~25% of the main chunk matmul (vs
            # rowpad's 8x) on the otherwise-idle MXU.
            res = _flat_pack(res, g, c)

        # reclaim this parity's buffer (write from 2 chunks ago), store,
        # and kick the write — predicated per buffer (see dma_out's note)
        @pl.when(slot == 0)
        def _():
            @pl.when(k >= 2)
            def _():
                dma_out(k - 2, 0).wait()

            gcol0[:, :] = res
            dma_out(k, 0).start()

        @pl.when(slot == 1)
        def _():
            @pl.when(k >= 2)
            def _():
                dma_out(k - 2, 1).wait()

            gcol1[:, :] = res
            dma_out(k, 1).start()

        return k + 1, new_log_t

    init = (jnp.zeros((), jnp.int32), jnp.zeros((p, 1), jnp.float32))
    k_done, _ = jax.lax.while_loop(cond, body, init)

    # drain: in-flight prefetched input + the last (up to) two output writes
    @pl.when(jnp.logical_and(k_done < nchunks, k_done > 0))
    def _():
        dma_in(k_done, jax.lax.rem(k_done, 2)).wait()

    @pl.when(jnp.logical_and(k_done >= 2, jax.lax.rem(k_done, 2) == 0))
    def _():
        dma_out(k_done - 2, 0).wait()

    @pl.when(jnp.logical_and(k_done >= 2, jax.lax.rem(k_done, 2) == 1))
    def _():
        dma_out(k_done - 2, 1).wait()

    @pl.when(jnp.logical_and(k_done >= 1, jax.lax.rem(k_done - 1, 2) == 0))
    def _():
        dma_out(k_done - 1, 0).wait()

    @pl.when(jnp.logical_and(k_done >= 1, jax.lax.rem(k_done - 1, 2) == 1))
    def _():
        dma_out(k_done - 1, 1).wait()


def _backward_full_kernel(
    tile_starts_ref,
    tile_counts_ref,
    data_hbm,  # (8+C, M)
    gout_ref,  # (1, P, C) colour-channel cotangent block
    galpha_ref,  # (1, P, 1) alpha-output cotangent block
    grad_colors_hbm,  # (C, M), pre-zeroed via aliasing
    grad_geom_hbm,  # (8, M), pre-zeroed via aliasing
    buf,  # (2, 8+C, G)
    gcol,  # (2, C, G)
    ggeo,  # (2, 8, G)
    gout_t,  # (C, P) transposed cotangent scratch
    sems,  # (6,): 2 in + 2 colour-out + 2 geom-out
    *,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    g: int,
):
    """Full VJP: colour grads AND screen-space geometry grads.

    Two forward passes over the tile's chunks (no residuals stored):
      A) recompute weights; accumulate Total_p = sum_i u_i w_i (u = colour
         cotangent contracted with the splat colour) and the final
         transmittance; emit colour grads (one MXU matmul per chunk).
      B) recompute again; the suffix sum the alpha-gradient needs is
         S_i = Total - prefix_incl_i, so

           dL/dalpha_i = u_i T_i - S_i/(1-a_i) + g_alpha T_fin/(1-a_i)

         (the CUDA kernels' reverse-order accumulation, reformulated as a
         forward prefix against a precomputed total); chain through the
         Gaussian quadratic form to [mx, my, ca, cb, cc, opac] and emit per-
         instance geometry grads.
    Clamped (alpha=0.999) and floored (alpha<1/255) splats get zero
    geometry gradients, matching min/where autodiff semantics.
    """
    t = pl.program_id(0)
    start = tile_starts_ref[t]
    count = tile_counts_ref[t]
    p = tile_h * tile_w

    px, py = _pixel_coords(t, tiles_x, tile_h, tile_w, p)
    nchunks = pl.cdiv(count, g)

    def dma_in(k, slot):
        off = pl.multiple_of(start + k * g, g)
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(off, g)], buf.at[slot], sems.at[slot]
        )

    def dma_col(k, slot):
        off = pl.multiple_of(start + k * g, g)
        return pltpu.make_async_copy(
            gcol.at[slot], grad_colors_hbm.at[:, pl.ds(off, g)], sems.at[2 + slot]
        )

    def dma_geo(k, slot):
        off = pl.multiple_of(start + k * g, g)
        return pltpu.make_async_copy(
            ggeo.at[slot], grad_geom_hbm.at[:, pl.ds(off, g)], sems.at[4 + slot]
        )

    def cond3(carry):
        k, log_t = carry[0], carry[1]
        return jnp.logical_and(k < nchunks, jnp.max(log_t) >= LOG_T_EPS)

    gout = gout_ref[0, :, :]  # (P, C)
    galpha = galpha_ref[0, :, 0:1]  # (P, 1)
    gout_t[:, :] = gout.T  # once per tile

    # ---------------- pass A: totals + colour grads --------------------------
    @pl.when(nchunks > 0)
    def _():
        dma_in(0, 0).start()

    def body_a(carry):
        k, log_t, log_t_rep, total = carry
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nchunks)
        def _():
            dma_in(k + 1, 1 - slot).start()

        dma_in(k, slot).wait()
        data = buf[slot]
        alpha = _chunk_alpha(data, px, py)
        w, log_t_incl_masked, new_log_t = _blend_weights(alpha, log_t, g)
        u = jax.lax.dot_general(
            gout, data[GEOM_ROWS:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (P, G)
        total = total + jnp.sum(u * w, axis=1, keepdims=True)
        # T after the last INCLUDED splat — what the forward's emitted
        # alpha/background actually used. The naive carry keeps absorbing
        # EXCLUDED splats' (1-alpha) factors after a ray terminates, so
        # exp(naive) underestimates T_fin on saturated pixels and the
        # galpha/background gradient term would be orders too small.
        chunk_min = jnp.min(
            jnp.where(log_t_incl_masked < 0.0, log_t_incl_masked, 0.0),
            axis=1,
            keepdims=True,
        )
        log_t_rep = jnp.minimum(log_t_rep, chunk_min)

        @pl.when(k >= 2)
        def _():
            dma_col(k - 2, slot).wait()

        gcol[slot] = jax.lax.dot_general(
            gout_t[:, :], w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dma_col(k, slot).start()
        return k + 1, new_log_t, log_t_rep, total

    init_a = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((p, 1), jnp.float32),
        jnp.zeros((p, 1), jnp.float32),
        jnp.zeros((p, 1), jnp.float32),
    )
    ka, _, log_t_rep_a, total = jax.lax.while_loop(cond3, body_a, init_a)
    t_final = jnp.exp(log_t_rep_a)  # T after the last included splat

    @pl.when(jnp.logical_and(ka < nchunks, ka > 0))
    def _():
        dma_in(ka, jax.lax.rem(ka, 2)).wait()

    @pl.when(ka >= 2)
    def _():
        dma_col(ka - 2, jax.lax.rem(ka, 2)).wait()

    @pl.when(ka >= 1)
    def _():
        dma_col(ka - 1, jax.lax.rem(ka - 1, 2)).wait()

    # ---------------- pass B: geometry grads ---------------------------------
    @pl.when(nchunks > 0)
    def _():
        dma_in(0, 0).start()

    def body_b(carry):
        k, log_t, prefix = carry
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nchunks)
        def _():
            dma_in(k + 1, 1 - slot).start()

        dma_in(k, slot).wait()
        data = buf[slot]
        mx = data[ROW_MX : ROW_MX + 1, :]
        my = data[ROW_MY : ROW_MY + 1, :]
        ca = data[ROW_CA : ROW_CA + 1, :]
        cb = data[ROW_CB : ROW_CB + 1, :]
        cc = data[ROW_CC : ROW_CC + 1, :]
        dx = px - mx
        dy = py - my
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        vis = jnp.exp(-sigma)
        alpha_raw = data[ROW_OPAC : ROW_OPAC + 1, :] * vis
        alpha = jnp.minimum(ALPHA_CLAMP, alpha_raw)
        live = (sigma >= 0.0) & (alpha >= ALPHA_FLOOR)
        alpha = jnp.where(live, alpha, 0.0)

        w, _, new_log_t = _blend_weights(alpha, log_t, g)
        u = jax.lax.dot_general(
            gout, data[GEOM_ROWS:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        uw = u * w
        cum = prefix + _cumsum_lanes(uw, g)  # inclusive prefix along the ray
        t_excl = jnp.where(alpha > 0.0, w / jnp.maximum(alpha, 1e-12), 0.0)
        inv_1ma = 1.0 / (1.0 - alpha)
        included = w > 0.0
        dl_da = jnp.where(
            included,
            u * t_excl - (total - cum) * inv_1ma + galpha * t_final * inv_1ma,
            0.0,
        )
        active = included & (alpha_raw < ALPHA_CLAMP)
        dl_ds = jnp.where(active, dl_da * (-alpha), 0.0)  # d alpha/d sigma = -alpha

        gmx = jnp.sum(dl_ds * (-(ca * dx + cb * dy)), axis=0, keepdims=True)
        gmy = jnp.sum(dl_ds * (-(cc * dy + cb * dx)), axis=0, keepdims=True)
        gca = jnp.sum(dl_ds * (0.5 * dx * dx), axis=0, keepdims=True)
        gcb = jnp.sum(dl_ds * (dx * dy), axis=0, keepdims=True)
        gcc = jnp.sum(dl_ds * (0.5 * dy * dy), axis=0, keepdims=True)
        gop = jnp.sum(jnp.where(active, dl_da * vis, 0.0), axis=0, keepdims=True)
        zero2 = jnp.zeros((2, g), jnp.float32)

        @pl.when(k >= 2)
        def _():
            dma_geo(k - 2, slot).wait()

        ggeo[slot] = jnp.concatenate([gmx, gmy, gca, gcb, gcc, gop, zero2], axis=0)
        dma_geo(k, slot).start()
        new_prefix = prefix + jnp.sum(uw, axis=1, keepdims=True)
        return k + 1, new_log_t, new_prefix

    init_b = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((p, 1), jnp.float32),
        jnp.zeros((p, 1), jnp.float32),
    )
    kb, _, _ = jax.lax.while_loop(cond3, body_b, init_b)

    @pl.when(jnp.logical_and(kb < nchunks, kb > 0))
    def _():
        dma_in(kb, jax.lax.rem(kb, 2)).wait()

    @pl.when(kb >= 2)
    def _():
        dma_geo(kb - 2, jax.lax.rem(kb, 2)).wait()

    @pl.when(kb >= 1)
    def _():
        dma_geo(kb - 1, jax.lax.rem(kb - 1, 2)).wait()


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_h", "tile_w", "chunk", "interpret"),
)
def tile_blend_backward_full(
    inst_data: jnp.ndarray,  # (8+C, M)
    tile_starts: jnp.ndarray,
    tile_counts: jnp.ndarray,
    grad_tile_colors: jnp.ndarray,  # (T, P, C)
    grad_tile_alpha: jnp.ndarray,  # (T, P, 1)
    *,
    tiles_x: int,
    tiles_y: int,
    tile_h: int,
    tile_w: int,
    chunk: int = 128,
    interpret: bool = False,
):
    """Returns (grad_colors (C, M), grad_geom (8, M)) per instance."""
    num_tiles = tiles_x * tiles_y
    p = tile_h * tile_w
    c = grad_tile_colors.shape[-1]
    m = inst_data.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, p, c), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # zeros → grad_colors alias
            pl.BlockSpec(memory_space=pl.ANY),  # zeros → grad_geom alias
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_ROWS + c, chunk), jnp.float32),
            pltpu.VMEM((2, c, chunk), jnp.float32),
            pltpu.VMEM((2, GEOM_ROWS, chunk), jnp.float32),
            pltpu.VMEM((c, p), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )

    def kernel(ts, tc, data, gout, galpha, _z1, _z2, out_c, out_g, buf, gc, gg, gt_, sems):
        _backward_full_kernel(
            ts, tc, data, gout, galpha, out_c, out_g, buf, gc, gg, gt_, sems,
            tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w, g=chunk,
        )

    zc = jnp.zeros((c, m), jnp.float32)
    zg = jnp.zeros((GEOM_ROWS, m), jnp.float32)
    grad_colors, grad_geom = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c, m), jnp.float32),
            jax.ShapeDtypeStruct((GEOM_ROWS, m), jnp.float32),
        ],
        # scalar-prefetch operands occupy indices 0-1; tensor inputs follow:
        # data=2, gout=3, galpha=4, zc=5, zg=6
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_starts, tile_counts, inst_data, grad_tile_colors, grad_tile_alpha, zc, zg)
    return grad_colors, grad_geom


def _segsum_kernel(
    chunk_block_ref,  # scalar prefetch (nc,) int32, non-decreasing block ids
    rows_ref,  # (SUB*G, 2C) u16 VMEM block: hi/lo halves of grad rows
    rank_ref,  # (1, SUB, G) VMEM block: block-RELATIVE rank per slot, -1 = pad
    out_hbm,  # (B*G, 128) pl.ANY, pre-zeroed via aliasing; cols past C unused
    acc,  # (2*G, 128) VMEM scratch: double-buffered per-block accumulator.
          # Lane dim is a full 128 tile: Mosaic rejects partial-lane memref
          # slices (both vector and DMA), so the dot result is padded.
    state,  # SMEM (4,): [cur_slot, pending0 (block+1, 0=none), pending1, _]
    sems,  # DMA (2,)
    *,
    g: int,
    nc: int,
    sub: int,
    cdim: int,
):
    """Sorted-segment-sum: one-hot MXU matmuls per 128-slot chunk.

    Replaces `jax.ops.segment_sum` for the per-gaussian gradient reduction —
    XLA lowers that to scatter-add, measured at ~138 ms for 1.2M x 16 rows
    on v5e (59 ms inside the fused train step). Requires the
    `ReductionLayout` block-aligned rank-sorted layout: every chunk's live
    slots fall in ONE 128-rank block, so the in-chunk reduction is a (G, G)
    one-hot matmul and cross-chunk accumulation stays in VMEM until the
    block changes (grid is sequential on TPU; flushes are double-buffered
    DMAs). SUB chunks are processed per grid step (the per-step overhead at
    ~12k single-chunk steps cost ~6 ms), and rows arrive as u16 bit-halves
    reassembled in-register (a pre-assembled f32 array cost ~6 ms in
    XLA relayout copies).
    """
    lanes = acc.shape[1]

    def flush(bid, slot):
        return pltpu.make_async_copy(
            acc.at[pl.ds(slot * g, g), :],
            out_hbm.at[pl.ds(bid * g, g), :],
            sems.at[slot],
        )

    @pl.when(pl.program_id(0) == 0)
    def _():
        state[1] = 0
        state[2] = 0

    for i in range(sub):
        cg = pl.program_id(0) * sub + i
        b = chunk_block_ref[cg]
        first = jnp.logical_or(
            cg == 0, chunk_block_ref[jnp.maximum(cg - 1, 0)] != b
        )
        last = jnp.logical_or(
            cg == nc - 1, chunk_block_ref[jnp.minimum(cg + 1, nc - 1)] != b
        )

        @pl.when(first)
        def _():
            new_slot = jnp.where(cg == 0, jnp.int32(0), 1 - state[0])
            pend = jnp.where(cg == 0, jnp.int32(0), state[1 + new_slot])

            @pl.when(pend > 0)
            def _():
                flush(pend - 1, new_slot).wait()

            state[0] = new_slot
            state[1 + new_slot] = 0
            acc[pl.ds(new_slot * g, g), :] = jnp.zeros((g, lanes), jnp.float32)

        slot = state[0]
        hw = rows_ref[pl.ds(i * g, g), :]  # (G, 2C) u16
        rows = jax.lax.bitcast_convert_type(
            (hw[:, :cdim].astype(jnp.uint32) << 16)
            | hw[:, cdim:].astype(jnp.uint32),
            jnp.float32,
        )  # (G, C) exact f32
        rel = rank_ref[0, i, :]  # (G,) block-relative ranks; -1 matches nothing
        oneh = (
            rel[:, None] == jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        ).astype(jnp.float32)
        contrib = jax.lax.dot_general(
            oneh,
            rows,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (G, C)
        if cdim < lanes:
            contrib = jnp.pad(contrib, ((0, 0), (0, lanes - cdim)))
        acc[pl.ds(slot * g, g), :] += contrib

        @pl.when(last)
        def _():
            flush(b, slot).start()
            state[1 + slot] = b + 1

        @pl.when(cg == nc - 1)
        def _():
            @pl.when(state[1] > 0)
            def _():
                flush(state[1] - 1, 0).wait()

            @pl.when(state[2] > 0)
            def _():
                flush(state[2] - 1, 1).wait()


SEGSUM_SUB = 8  # chunks per grid step (amortises per-step overhead)


@functools.partial(
    jax.jit, static_argnames=("num_ranks", "chunk", "interpret")
)
def sorted_segment_sum(
    rows_u16: jnp.ndarray,  # (Mp, 2C) u16 bit-halves, rank-sorted block-aligned
    slot_rank: jnp.ndarray,  # (Mp,) int32 block-relative rank, -1 = pad
    chunk_block: jnp.ndarray,  # (Mp//chunk,) int32 non-decreasing block ids
    num_ranks: int,
    chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (num_ranks, C) per-rank f32 sums of the u16-half rows."""
    mp, cdim2 = rows_u16.shape
    cdim = cdim2 // 2
    assert cdim <= 128, "sorted_segment_sum assumes C <= one lane tile"
    sub = SEGSUM_SUB
    nc = mp // chunk
    assert nc % sub == 0, "ReductionLayout must pad Mp to SEGSUM_SUB*chunk"
    nb = (num_ranks + chunk - 1) // chunk
    # (nsteps, sub, chunk) ranks: block (1, sub, chunk) obeys the TPU
    # block-shape rule (second-to-minor multiple of 8, minor 128)
    rank3d = slot_rank.reshape(nc // sub, sub, chunk)
    lanes = 128
    zeros = jnp.zeros((nb * chunk, lanes), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc // sub,),
        in_specs=[
            pl.BlockSpec(
                (sub * chunk, cdim2), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, sub, chunk), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # zeros → out alias
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2 * chunk, lanes), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(cb, rws, rnk, _z, out, acc, state, sems):
        _segsum_kernel(
            cb, rws, rnk, out, acc, state, sems,
            g=chunk, nc=nc, sub=sub, cdim=cdim,
        )

    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb * chunk, lanes), jnp.float32)],
        # scalar-prefetch is operand 0; zeros is tensor input #2 → operand 3
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(chunk_block, rows_u16, rank3d, zeros)
    return out[:num_ranks, :cdim]


EXPAND_K = 1024  # instance slots per expansion grid step
# gaussian window: alignment pad (<=127) + K+1 owner span fits exactly
EXPAND_W = EXPAND_K + 128


def _expand_gid_kernel(
    glo_ref,  # scalar prefetch (nc * K/SB,): first owner rank per SB slots
    off_hbm,  # (8, n_pad) int32; row 0 = instance offsets (monotone)
    gid_ref,  # (1, 1, K) int32 output block: owning rank per slot
    buf,  # (2, 8, W) int32 window double buffer
    sems,  # DMA (2,)
    *,
    nc: int,
):
    """Owning-rank recovery for the ragged->dense instance expansion.

    Replaces the XLA spread (scatter+cumsum, ~2.2 ms at M~1M — the scatter
    dominates). Gaussians are depth-sorted ALIVE-FIRST (count >= 1 before
    any empty one), so S slots are owned by <= S+1 consecutive ranks:
    per KEYS_SB-slot sub-block, a 128-aligned KEYS_WS-lane sub-window
    (start from the SB-granular scalar-prefetch searchsorted) bounds the
    step-function compare to (SB, WS) — ~4.5x fewer VPU ops than the
    full (K, K+128) window — and a lane reduction yields
    gid = window_start + #{j in window: off[j] <= i} - 1 (ranks before
    the window all satisfy off <= i by monotonicity).
    Pure VPU — an MXU formulation (telescoping byte-plane matmul) measured
    10 ms/frame because the 12-column output uses ~10% of the array.
    """
    k = EXPAND_K
    w = EXPAND_W
    sb = KEYS_SB
    ws = KEYS_WS
    nsb = k // sb
    c = pl.program_id(0)

    def dma(cc, slot):
        g = glo_ref[cc * nsb]
        base = pl.multiple_of(g - jax.lax.rem(g, 128), 128)
        return pltpu.make_async_copy(
            off_hbm.at[:, pl.ds(base, w)], buf.at[slot], sems.at[slot]
        )

    @pl.when(c == 0)
    def _():
        dma(0, 0).start()

    slot = jax.lax.rem(c, 2)

    @pl.when(c + 1 < nc)
    def _():
        dma(c + 1, 1 - slot).start()

    dma(c, slot).wait()
    g = glo_ref[c * nsb]
    base = g - jax.lax.rem(g, 128)
    for s in range(nsb):
        g_s = glo_ref[c * nsb + s]
        ws_abs = g_s - jax.lax.rem(g_s, 128)
        rel = pl.multiple_of(ws_abs - base, 128)
        off = buf[slot, 0:1, pl.ds(rel, ws)]  # (1, WS)
        i_glob = (c * k + s * sb) + jax.lax.broadcasted_iota(
            jnp.int32, (sb, 1), 0
        )
        cnt = jnp.sum((i_glob >= off).astype(jnp.int32), axis=1, keepdims=True)
        gid_ref[0, 0, pl.ds(s * sb, sb)] = (ws_abs + cnt - 1)[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def expand_gid(
    offsets_table: jnp.ndarray,  # (8, n_pad) int32, row 0 = offsets
    g_lo_sb: jnp.ndarray,  # (nc * K/SB,) int32 first owner rank per SB slots
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (nc*K,) owning-rank ids (garbage past the last valid slot)."""
    nc = g_lo_sb.shape[0] // (EXPAND_K // KEYS_SB)
    (gid,) = pl.pallas_call(
        functools.partial(_expand_gid_kernel, nc=nc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, EXPAND_K), lambda c, *_: (c, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 8, EXPAND_W), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((nc, 1, EXPAND_K), jnp.int32)],
        interpret=interpret,
    )(g_lo_sb, offsets_table)
    return gid.reshape(-1)


# keys-kernel sub-blocking: SB slots span <= SB+1 consecutive ranks, so a
# 128-aligned sub-window of WS = 128 (alignment) + SB lanes suffices — the
# (slots, window) compare shrinks from (K, K+128) to 8x (128, 256), ~4.5x
# fewer VPU ops. The chunk window still fits in K+128 lanes: the last
# sub-block's aligned start is <= align128(g_lo + K - SB) - align128(g_lo)
# <= K - SB + 127 -> (mult of 128) <= K - SB, and K - SB + WS = K + 128.
KEYS_SB = 128
KEYS_WS = 256
EXPAND_KW = EXPAND_K + 128


def _expand_keys_kernel(
    glo_ref,   # scalar prefetch (nc * K/SB,): first owner rank per SB slots
    nv_ref,    # scalar prefetch (1,): pre-cull valid instance count
    tbl_hbm,   # (16, n_pad) f32 per-rank table:
               #   rows [off_clamped, x0, y0, pw, mx, my, ca, cb, cc, L, 0..]
    keys_ref,  # (1, 1, K) int32/uint32 out: final sort keys
    cnt_ref,   # (1, 1, 128) int32 out: per-chunk valid count (broadcast row)
    buf,       # (2, 16, KW) f32 window double buffer
    sems,      # DMA (2,)
    *,
    nc: int,
    shift: int,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    has_cull: bool,
    key_u32: bool,
    half_px: float = 0.5,
):
    """Fused ragged->dense expansion + sort-key construction (+ optional
    exact ellipse-tile cull) for the unaligned inference binning.

    Replaces, in ONE windowed pass: expand_gid, the (M,)-row u16 gather of
    per-rank data (per-row bound, ~1.7 ms at 768k instances), the XLA
    dy/dx/tile/key elementwise chain, and the cull evaluation. Exploits the
    same invariant as expand_gid (alive-first depth order => S slots are
    owned by <= S+1 consecutive ranks): per SB-slot sub-block, a 128-
    aligned WS-lane sub-window (start from the SB-granular scalar-prefetch
    searchsorted) bounds the compare to (SB, WS); the owner one-hot is the
    lane-difference of the monotone step mask, so the per-slot rank
    attributes come from one EXACT (SB, WS) @ (WS, 16) HIGHEST matmul
    against the windowed table (0/1 one-hot x f32-exact integer values —
    error-free). All integer arithmetic runs in f32
    (every operand < 2^24, exact); dy = slot // pw uses one correctly-
    rounded division plus a +-1 fixup (|fl(q) - q| <= q*2^-23 < 1 at
    q < 2^20).
    """
    k = EXPAND_K
    w = EXPAND_KW
    sb = KEYS_SB
    ws = KEYS_WS
    nsb = k // sb
    c = pl.program_id(0)
    # key arithmetic runs in int32 regardless of tier (two's-complement
    # shift/or produce the identical bit pattern) and the u32 tier
    # bitcasts at the end — avoids f32->u32 converts and u32 shifts,
    # which are the least-proven Mosaic ops in this kernel
    key_max = jnp.int32(-1 if key_u32 else 2**31 - 1)

    def dma(cc, slot):
        g = glo_ref[cc * nsb]
        base = pl.multiple_of(g - jax.lax.rem(g, 128), 128)
        return pltpu.make_async_copy(
            tbl_hbm.at[:, pl.ds(base, w)], buf.at[slot], sems.at[slot]
        )

    @pl.when(c == 0)
    def _():
        dma(0, 0).start()

    slot = jax.lax.rem(c, 2)

    @pl.when(c + 1 < nc)
    def _():
        dma(c + 1, 1 - slot).start()

    dma(c, slot).wait()
    g = glo_ref[c * nsb]
    base = g - jax.lax.rem(g, 128)  # absolute rank of window lane 0
    nv_f = nv_ref[0].astype(jnp.float32)
    total = jnp.zeros((1, 1), jnp.float32)

    for s in range(nsb):
        # 128-aligned sub-window: covers this sub-block's <= SB+1 owner
        # ranks (alignment pad <= 127 + SB + 1 <= WS)
        g_s = glo_ref[c * nsb + s]
        ws_abs = g_s - jax.lax.rem(g_s, 128)
        rel = pl.multiple_of(ws_abs - base, 128)
        win = buf[slot, :, pl.ds(rel, ws)]  # (16, WS) f32
        off = win[0:1, :]  # (1, WS)
        ws_f = ws_abs.astype(jnp.float32)
        i_f = (
            (c * k + s * sb).astype(jnp.float32)
            # Mosaic's tpu.iota only emits integer vectors — build i32,
            # convert (values < 2^24 by the tier guard, so f32-exact)
            + jax.lax.broadcasted_iota(jnp.int32, (sb, 1), 0).astype(
                jnp.float32
            )
        )  # (SB, 1) global slot ids, f32-exact (< 2^24 by the tier guard)
        mask = (i_f >= off).astype(jnp.float32)  # (SB, WS) monotone step
        cnt = jnp.sum(mask, axis=1, keepdims=True)  # (SB, 1)
        # ranks before the sub-window all satisfy off <= i (monotone), so
        # the absolute owner is window start + local count - 1
        gid_f = ws_f + cnt - 1.0
        # owner one-hot = lane-difference of the step mask (exactly one 1)
        onehot = mask - jnp.concatenate(
            [mask[:, 1:], jnp.zeros((sb, 1), jnp.float32)], axis=1
        )
        cols = jax.lax.dot_general(
            onehot, win,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (SB, 16) exact per-slot rank attributes
        off_g = cols[:, 0:1]
        x0 = cols[:, 1:2]
        y0 = cols[:, 2:3]
        pw = jnp.maximum(cols[:, 3:4], 1.0)
        slot_f = i_f - off_g  # in [0, pw*ph), f32-exact
        dyc = jnp.floor(slot_f / pw)
        r = slot_f - dyc * pw  # exact (products < 2^24)
        dy = jnp.where(r >= pw, dyc + 1.0, jnp.where(r < 0.0, dyc - 1.0, dyc))
        dx = slot_f - dy * pw
        tx = x0 + dx
        ty = y0 + dy
        tile_f = ty * tiles_x + tx
        valid = i_f < nv_f
        if has_cull:
            # exact alpha-floor tile test (tiles.ellipse_tile_keep, column
            # layout): keep iff some pixel centre of the tile can reach
            # sigma <= L — min of the PD quadratic over the pixel rect
            mx = cols[:, 4:5]
            my = cols[:, 5:6]
            ca = cols[:, 6:7]
            cb = cols[:, 7:8]
            cc2 = cols[:, 8:9]
            lvl = cols[:, 9:10]
            u0 = tx * tile_w + half_px - mx
            u1 = u0 + (tile_w - 2 * half_px)
            v0 = ty * tile_h + half_px - my
            v1 = v0 + (tile_h - 2 * half_px)
            inside = (u0 <= 0) & (0 <= u1) & (v0 <= 0) & (0 <= v1)

            def edge_u(ub):
                vs = jnp.clip(-cb * ub / cc2, v0, v1)
                return (0.5 * ca * ub + cb * vs) * ub + 0.5 * cc2 * vs * vs

            def edge_v(vb):
                us = jnp.clip(-cb * vb / ca, u0, u1)
                return (0.5 * cc2 * vb + cb * us) * vb + 0.5 * ca * us * us

            smin = jnp.minimum(
                jnp.minimum(edge_u(u0), edge_u(u1)),
                jnp.minimum(edge_v(v0), edge_v(v1)),
            )
            valid = valid & (inside | (smin <= lvl))
        key = (tile_f.astype(jnp.int32) << shift) | gid_f.astype(jnp.int32)
        keys = jnp.where(valid, key, key_max)  # (SB, 1) int32
        if key_u32:
            keys = jax.lax.bitcast_convert_type(keys, jnp.uint32)
        keys_ref[0, 0, pl.ds(s * sb, sb)] = keys[:, 0]
        total = total + jnp.sum(valid.astype(jnp.float32), axis=0, keepdims=True)

    cnt_ref[0, :, :] = total.astype(jnp.int32) * jnp.ones((1, 128), jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "shift", "tiles_x", "tile_w", "tile_h", "has_cull", "key_u32",
        "interpret",
    ),
)
def expand_keys(
    tbl16: jnp.ndarray,  # (16, n_pad) f32 per-rank table (see kernel doc)
    g_lo_sb: jnp.ndarray,  # (nc * K/SB,) int32 first owner rank per SB slots
    num_valid: jnp.ndarray,  # () int32 pre-cull valid instance count
    *,
    shift: int,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    has_cull: bool,
    key_u32: bool,
    interpret: bool = False,
):
    """Returns (keys (nc*K,) int32/uint32, valid_counts (nc,) int32)."""
    nc = g_lo_sb.shape[0] // (EXPAND_K // KEYS_SB)
    kdt = jnp.uint32 if key_u32 else jnp.int32
    keys, cnts = pl.pallas_call(
        functools.partial(
            _expand_keys_kernel, nc=nc, shift=shift, tiles_x=tiles_x,
            tile_w=tile_w, tile_h=tile_h, has_cull=has_cull, key_u32=key_u32,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nc,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, EXPAND_K), lambda c, *_: (c, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 128), lambda c, *_: (c, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 16, EXPAND_KW), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nc, 1, EXPAND_K), kdt),
            jax.ShapeDtypeStruct((nc, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(g_lo_sb, num_valid.reshape(1), tbl16)
    return keys.reshape(-1), cnts[:, 0, 0]


def _dense_segsum_kernel(
    vals_ref,  # (CHUNK, C) VMEM block
    ids_ref,  # (1, 1, CHUNK) int32 VMEM block; out-of-range ids drop out
    out_hbm,  # (S_pad, 128) pl.ANY
    acc,  # (S_pad, 128) VMEM scratch
    sem,  # DMA (1,)
    *,
    s_pad: int,
    nc: int,
):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    ids = ids_ref[0, 0, :]  # (CHUNK,)
    chunk = ids.shape[0]
    oneh = (
        ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (chunk, s_pad), 1)
    ).astype(jnp.float32)
    contrib = jax.lax.dot_general(
        oneh,
        vals_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (S_pad, C)
    cdim = vals_ref.shape[1]
    if cdim < acc.shape[1]:
        contrib = jnp.pad(contrib, ((0, 0), (0, acc.shape[1] - cdim)))
    acc[:, :] += contrib

    @pl.when(c == nc - 1)
    def _():
        cp = pltpu.make_async_copy(acc, out_hbm, sem.at[0])
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def dense_segment_sum_fwd(
    values: jnp.ndarray,  # (P, C) f32
    ids: jnp.ndarray,  # (P,) int32 in [0, num_segments); OOB ignored
    num_segments: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-sum for MODERATE segment counts (<= ~2k) via per-chunk
    one-hot MXU matmuls — XLA's scatter-add lowering costs ~2 ms per
    230k-pixel segment_sum on v5e; this does all of them in ~0.3 ms."""
    p, cdim = values.shape
    assert cdim <= 128
    chunk = 1024 if num_segments <= 1280 else 256
    pp = ((p + chunk - 1) // chunk) * chunk
    if pp != p:
        values = jnp.pad(values, ((0, pp - p), (0, 0)))
        ids = jnp.pad(ids, (0, pp - p), constant_values=num_segments)
    nc = pp // chunk
    s_pad = ((num_segments + 7) // 8) * 8
    ids3d = ids.reshape(nc, 1, chunk)

    (out,) = pl.pallas_call(
        functools.partial(_dense_segsum_kernel, s_pad=s_pad, nc=nc),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk, cdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((s_pad, 128), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((s_pad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(values, ids3d)
    return out[:num_segments, :cdim]


def _fwd_cost(num_tiles: int, p: int, g: int, c: int, m: int) -> pl.CostEstimate:
    # rough per-tile estimate assuming ~2 chunks average; guides scheduling only
    chunks = max(2 * num_tiles, m // g)
    flops = chunks * (2 * p * g * g + 2 * p * g * c + 30 * p * g)
    return pl.CostEstimate(
        flops=flops,
        bytes_accessed=chunks * g * (GEOM_ROWS + c) * 4 + num_tiles * p * c * 4,
        transcendentals=chunks * 2 * p * g,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "tiles_x", "tiles_y", "tile_h", "tile_w", "chunk", "interpret", "aligned"
    ),
)
def tile_blend_forward(
    inst_data: jnp.ndarray,  # (8+C, M): [mx,my,ca,cb,cc,op,0,0, colours...]
    tile_starts: jnp.ndarray,  # (num_tiles,)
    tile_counts: jnp.ndarray,  # (num_tiles,)
    bg: jnp.ndarray | None = None,  # (C,) background (None = zeros)
    *,
    tiles_x: int,
    tiles_y: int,
    tile_h: int,
    tile_w: int,
    chunk: int = 128,
    interpret: bool = False,
    aligned: bool = True,
):
    """Returns (T, P, C+1): C composited channels (bg pre-blended), then
    alpha."""
    num_tiles = tiles_x * tiles_y
    p = tile_h * tile_w
    c = inst_data.shape[0] - GEOM_ROWS
    m = inst_data.shape[1]
    if bg is None:
        bg = jnp.zeros((c,), jnp.float32)
    bg2d = bg.reshape(1, c).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, c), lambda t, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, p, c + 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_ROWS + c, chunk), jnp.float32),
            pltpu.VMEM((p, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _forward_kernel, tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w, g=chunk,
        aligned=aligned,
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, p, c + 1), jnp.float32)],
        cost_estimate=_fwd_cost(num_tiles, p, chunk, c, m),
        interpret=interpret,
    )(tile_starts, tile_counts, inst_data, bg2d)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_h", "tile_w", "chunk", "interpret"),
)
def tile_blend_backward(
    inst_data: jnp.ndarray,  # (8+C, M) (colour rows unused)
    tile_starts: jnp.ndarray,
    tile_counts: jnp.ndarray,
    grad_tile_colors: jnp.ndarray,  # (T, P, C)
    *,
    tiles_x: int,
    tiles_y: int,
    tile_h: int,
    tile_w: int,
    chunk: int = 128,
    interpret: bool = False,
):
    """Returns grad wrt per-instance colours, ROW-major shape (M, C) — the
    layout the downstream ReductionLayout u16-table build + row gather
    want (see _backward_kernel.dma_out's note). With GAGS_BWD_ROWPAD=1
    the HBM output is lane-padded to (M, 128) — the kernel pads the
    cotangent to 128 channels so every chunk matmul emits a (G, 128) window
    directly at ~8x the chunk-matmul flops (measured battery 8) — kept as
    the GAGS_BWD_ROWPAD=1 fallback. The default is the flat (M*C/128,
    128) row-major view, packed in-kernel by exact selection matmuls
    (_flat_pack) because Mosaic rejects the equivalent value reshape
    on-device (battery 8).

    Rows past the last tile's padded range are never written — callers must
    rely on the sentinel Gaussian id to drop them in the segment-sum.
    """
    num_tiles = tiles_x * tiles_y
    p = tile_h * tile_w
    c = grad_tile_colors.shape[-1]
    m = inst_data.shape[1]
    # Default is the flat (M*C/128, 128) row-major view. Battery 8 proved
    # Mosaic rejects an in-kernel (G, C)->(G*C/128, 128) VALUE RESHAPE
    # ("expected a layout with tiling (8, 128) or less for memref" class);
    # the kernel now packs via exact selection matmuls instead
    # (_flat_pack), which never asks Mosaic for a cross-lane relayout.
    # GAGS_BWD_ROWPAD=1 forces the guaranteed-compile lane-pad fallback
    # ((M, 128) output, ~8x chunk-matmul flops + an 8x-bigger pre-zeroed
    # alias donor — the 960 us broadcast_in_dim f32[M,128] in the r4
    # train profile).
    rowpad = bool(int(os.environ.get("GAGS_BWD_ROWPAD", "0")))
    if (chunk * c) % 128 or (m * c) % 128:
        rowpad = True  # flat view needs whole 128-lane output rows per chunk
    out_rows, out_cols = ((m, 128) if rowpad else ((m * c) // 128, 128))
    buf_rows = chunk if rowpad else (chunk * c) // 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, p, c), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # pre-zeroed output alias donor
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_ROWS, chunk), jnp.float32),
            pltpu.VMEM((buf_rows, out_cols), jnp.float32),
            pltpu.VMEM((buf_rows, out_cols), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    def kernel(ts, tc, data, gout, _zeros, out, buf, gcol0, gcol1, sems):
        _backward_kernel(
            ts, tc, data, gout, out, buf, gcol0, gcol1, sems,
            tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w, g=chunk,
            c=c, rowpad=rowpad,
        )

    zeros = jnp.zeros((out_rows, out_cols), jnp.float32)
    (grad_colors,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((out_rows, out_cols), jnp.float32)],
        # +2 scalar-prefetch operands precede the tensor inputs in the
        # aliasing index space: zeros is tensor input #2 → operand index 4
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_starts, tile_counts, inst_data, grad_tile_colors, zeros)
    if rowpad:
        return grad_colors[:, :c]
    return grad_colors.reshape(m, c)
