"""High-level differentiable rasterizer: project → bin → Pallas blend.

API parity target: `gsplat.rasterization` as the reference calls it
(`gaussian_renderer/__init__.py:56-70`) — N Gaussians, C-channel colours
(3 for RGB, 16 for distilled features), optional expected-depth channel,
background blending, returned alpha map.

Differentiation: gradients flow to `colors` (exact, via the Pallas backward
kernel + a segment-sum back to Gaussians). Geometry inputs (means / quats /
scales / opacities) are treated as frozen — exactly the GAD training setup,
where only `_semantic_feature` is optimised and geometry has
requires_grad=False (reference `scene/gaussian_model.py:192-206`). Their
gradients are defined as zero; full geometry VJP (needed only for RGB
pre-training / densification) is a planned extension.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gags_tpu.splat import tiles
from gags_tpu.splat import pallas_kernel as pk
from gags_tpu.splat.projection import (
    ProjectedGaussians,
    effective_opacity,
    project_gaussians,
    project_gaussians_soa,
)

# A/B experiment flag (GAGS_T16=1): do the inference instance-table
# relayout as ONE u16 transpose + lane-major reassembly instead of two
# f32/bf16 transposes. Bit-exact either way; drain-time on hardware
# decides (see NOTES.md backlog).
import os as _os

_TRANSPOSE_U16 = _os.environ.get("GAGS_T16", "0") == "1"
# RULED OUT on hardware (r4 battery, deleted per VERDICT r3 #3) — the
# rulings, so they are not re-staged:
#   * kernel_relayout (in-kernel u16 reassembly + identity-matmul
#     transposes): lost every leg on two bases (33.8 vs 31.2 ms; 28.8 vs
#     26.5; stage-drain 24.5 vs 21.6 bf16). layout_probe explains why:
#     its (M, 128)-u16 DMA stream is exactly the 8.4x-penalised
#     non-lane-major u16 read layout.
#   * packed_out (channel-major (T, C+1, P) blend output): 33.1/26.4 ms
#     vs bases — the suspected 17->128 output lane pad does not exist
#     (layout_probe HWC/CHW write ratio 0.8).
# A/B experiment flag (GAGS_CHW=1): channel-major (C, H, W) FINAL image
# (RasterizeConfig.image_chw). Bit-exact transpose of the default layout.
_IMAGE_CHW = _os.environ.get("GAGS_CHW", "0") == "1"
# NOTE: soa_geom deliberately has NO env flag: it changes the CALL
# contract (transposed geometry args), so flipping it globally would
# break every AoS call site — opt in per call site only.


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    # 32x32 measured best on v5e for both inference (35.3 vs 33.7 FPS at
    # 8x128, 720p/250k) and training (105 vs 112 ms/step at 360p/300k):
    # square tiles give more coherent early termination at equal instance
    # counts. Pixel count 1024 = the (8,128) f32 vreg tile either way.
    tile_h: int = 32
    tile_w: int = 32
    chunk: int = 128
    # instance budget = factor * N (fractional OK — the binner rounds the
    # budget to the chunk size). Every M-length stream (expand, key sort,
    # row gather) scales with it: at 720p/250k the bench scene uses only
    # 62% of a 3.0x budget, so trimming the factor is a proportional,
    # exact win wherever overflow stays zero (overflow is surfaced and
    # asserted by bench/battery runs; autotune only keeps zero-overflow
    # winners).
    budget_factor: float = 4.0
    budget: Optional[int] = None  # explicit override
    interpret: bool = False  # Pallas interpreter mode (CPU tests)
    geometry_grads: bool = False  # full VJP (means/quats/scales/opacities)
    # chunk-aligned per-tile ranges (dummy padding). Required for ANY
    # backward pass (gradient-write chunk ownership); inference sets
    # aligned=False to skip the binner's SAT+dummy machinery (~1/3 of
    # binning cost) — the forward kernel masks unaligned head/tail lanes.
    aligned: bool = True
    # inference (aligned=False) blend tuning: pixel-slab size inside the
    # fast kernel, and bf16 colour rows (halves the colour gather + DMA
    # bytes; feature output error ~1e-3 relative, geometry math unaffected).
    # 256 measured best at 32x32/720p (r4 battery: 20.5 vs 22.0 ms with
    # blend_bf16; scripts/slab_probe.py shows (256, 128) elementwise
    # chains run ~4x cheaper per op than whole-(1024, 128) blocks —
    # temporaries stay near the register file instead of streaming VMEM).
    p_block: int = 256
    fast_color_rows: bool = False
    # sigma as a (P, 8) @ (8, G) MXU bilinear form in tile-centred coords
    # instead of ~9 materialised (P, G) VPU ops; polynomial-expansion
    # cancellation adds ~1e-4 log2-sigma error (an order below the bf16
    # colour-row error). Inference fast path only.
    mxu_sigma: bool = True
    # bf16 blend pipeline (inference fast path): every (P, G) temp past
    # the sigma matmul is bf16 — half the VPU/VMEM stream. Image error
    # ~1e-2 relative vs the f32 path; use for throughput-bound feature
    # rendering where downstream consumers (decoder + softmax relevancy)
    # are insensitive at that scale. Requires mxu_sigma.
    blend_bf16: bool = False
    # p_block-level early termination (inference fast path): per-pixel
    # log-T lives in kernel VMEM and each p_block slab's matmuls are
    # SKIPPED once all its pixels saturate (T < 1e-4) — the TPU-native
    # analogue of the CUDA per-pixel-thread retirement the reference's
    # trained-scene frame rates ride on. Byte-identical output (saturated
    # pixels already blend with w = 0); pays off on trained-statistics
    # scenes with full surface coverage, ~free elsewhere.
    block_exit: bool = False
    # shrink binning rects to each splat's alpha-floor contour
    # sqrt(2*ln(255*opacity)) when < 3 sigma — image-exact (those pairs
    # fail the kernels' 1/255 floor anyway), sheds instances on
    # opacity-sparse (i.e. trained) scenes. See projection.py.
    opacity_extents: bool = True
    # exact ellipse-tile cull on the unaligned (inference) binning paths:
    # drop instances whose tile has no pixel above the alpha floor
    # (tiles.ellipse_tile_keep) — sheds the corner tiles of each splat's
    # bbox, image-exact. Ignored on aligned (training) binnings.
    # Default OFF: hardware-measured +5.4 ms/frame at 720p/250k (the cull
    # columns' compute outweighs the pair shed — BENCH_r03: 31.0 ms with
    # cull vs 25.6 without); autotune re-tries it per shape.
    tile_cull: bool = False
    # fused expansion+gather+cull+key Pallas kernel for the unaligned
    # binning (tiles/pallas_kernel.expand_keys): deletes the (M,)-row
    # gather and the XLA key chain. Exact same keys; unaligned narrow-key
    # tiers only (no-op elsewhere). Measured -6.4 ms/frame at 1080p/1M,
    # neutral at 720p (r4 battery 2) — autotune decides per shape.
    fused_keys: bool = False
    # channel-major (C, H, W) FINAL image: with C=16 on the minor dim the
    # default (H, W, C) output pads 16 -> 128 lanes in HBM ((8, 128)
    # tiling) — ~8x the write bytes of the frame's deliverable (59 -> 472
    # MB at 720p/C16 f32). (C, H, W) puts W on lanes (no pad) and matches
    # the reference's torch CHW tensors (gaussian_renderer returns CHW).
    # Bit-exact transpose; inference (aligned=False) fast path only —
    # RasterizeResult.image is (C, H, W) when set.
    image_chw: bool = False
    # lane-major (SoA) geometry inputs: rasterize() takes means (3, N),
    # quats (4, N), scales (3, N) and the whole projection→binning→table
    # chain runs on (N,) components — no (N, k<128) stream is read or
    # written outside the row-major gather tables. Bit-identical results
    # (same projection core). Inference (aligned=False) path only.
    soa_geom: bool = False
    # TRAINING forward on the streaming fast kernel: aligned ranges are a
    # special case of unaligned (chunk-aligned starts, zero-opacity
    # dummies blend as no-ops), so the forward half of the training step
    # can ride the inference kernel's op diet (folded constants, exp2
    # scan, whole-segment DMAs). NOT bit-identical to the classic
    # aligned forward (~1e-4 relative, the fuzzed f32 contract); colour
    # GRADIENTS are unchanged bit-for-bit (the backward kernels recompute
    # from the same inputs). Default off — A/B via train_bench.
    fast_fwd_aligned: bool = False
    # NOTE (grad-row layout, r4): the backward kernel emits per-instance
    # colour grads ROW-major (M, C) directly — the earlier (C, M) output's
    # transposed view poisoned the ReductionLayout u16 table to
    # lane-major, turning its (Mp,)-row gather per-element-strided
    # (HLO-profiled 17.5 ms/step at 360p/300k, fusion.9; layout_probe:
    # 8.4x penalty on lane-major u16 row reads). Repair-in-place attempts
    # all LOST: an XLA identity dot measured flat (layout assignment
    # walks straight through it) and a Pallas identity copy measured
    # +7 ms (XLA materialises the pathological transpose before the
    # custom call). Emitting rows from the kernel is conversion-free —
    # there is no config knob because there is nothing left to choose.

    def instance_budget(self, n: int) -> int:
        if self.budget is not None:
            return self.budget
        return max(int(self.budget_factor * n), 4 * self.chunk)


def auto_config(**overrides) -> "RasterizeConfig":
    """RasterizeConfig with interpret mode auto-enabled on the CPU backend
    (the Pallas TPU kernels only compile for TPU; CPU runs interpret)."""
    import jax

    overrides.setdefault("interpret", jax.default_backend() == "cpu")
    # env A/B flags ride the CONFIG (never hidden impl-level overrides:
    # autotune/bench labels must describe what actually ran)
    overrides.setdefault("image_chw", _IMAGE_CHW)
    from gags_tpu.splat import tiles as _tiles

    overrides.setdefault("fused_keys", _tiles._FUSED_KEYS)
    return RasterizeConfig(**overrides)


class RasterizeResult(NamedTuple):
    image: jnp.ndarray  # (H, W, C); (C, H, W) when config.image_chw
    alpha: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (N,) int32, 0 = culled
    means2d: jnp.ndarray  # (N, 2)
    overflow: jnp.ndarray  # () int32 dropped instances (0 in normal operation)


def _tiles_to_image(tile_img, tiles_x, tiles_y, tile_h, tile_w, height, width):
    """(T, P, C) tile-major → (H, W, C) with crop of the padded border."""
    c = tile_img.shape[-1]
    img = tile_img.reshape(tiles_y, tiles_x, tile_h, tile_w, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        tiles_y * tile_h, tiles_x * tile_w, c
    )
    return img[:height, :width]


def _tiles_to_image_chw(tile_img, tiles_x, tiles_y, tile_h, tile_w, height, width):
    """(T, P, C) tile-major → (C, H, W) channel-major with border crop.

    W on the minor dim keeps the HBM tiling pad-free for any C (the
    (H, W, C<=17) layout pads channels to 128 lanes — ~8x the bytes)."""
    c = tile_img.shape[-1]
    img = tile_img.reshape(tiles_y, tiles_x, tile_h, tile_w, c)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        c, tiles_y * tile_h, tiles_x * tile_w
    )
    return img[:, :height, :width]


def soa_geometry(means, quats, scales):
    """Lane-major one-time geometry copies for RasterizeConfig.soa_geom
    call sites: (N, 3)/(N, 4)/(N, 3) AoS → (3, N)/(4, N)/(3, N). The
    single source of the SoA call contract — every consumer (render CLI,
    relevancy CLI, serve, bench, autotune) goes through here."""
    return jnp.asarray(means.T), jnp.asarray(quats.T), jnp.asarray(scales.T)


def _image_epilogue(cfg):
    """Pick the tile→image converters for cfg.image_chw.

    Returns (to_img, to_alpha); to_alpha always yields (H, W). image_chw
    is inference-only (aligned=False) — the aligned training paths keep
    the (T, P, C) kernel layout and (H, W, C) images."""
    if cfg.image_chw and not cfg.aligned:
        f = _tiles_to_image_chw
        return f, lambda *a: f(*a)[0]
    return _tiles_to_image, lambda *a: _tiles_to_image(*a)[..., 0]


def _image_to_tiles(img, tiles_x, tiles_y, tile_h, tile_w):
    """(H, W, C) → (T, P, C), zero-padding to the tile grid."""
    h, w, c = img.shape
    ph = tiles_y * tile_h - h
    pw = tiles_x * tile_w - w
    img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)))
    img = img.reshape(tiles_y, tile_h, tiles_x, tile_w, c)
    return img.transpose(0, 2, 1, 3, 4).reshape(tiles_x * tiles_y, tile_h * tile_w, c)


def _geom_table(proj, opacities):
    """(N+1, 8) row-major geometry table [mx,my,ca,cb,cc,opac,0,0] with a
    zero (opacity-0) sentinel row. Row-major so the per-instance gather
    reads contiguous bytes per index (TPU gathers hate strided columns)."""
    n = proj.means2d.shape[0]
    pad1 = jnp.zeros((n + 1, 1), jnp.float32)
    return jnp.concatenate(
        [
            jnp.pad(proj.means2d, ((0, 1), (0, 0))),
            jnp.pad(proj.conics, ((0, 1), (0, 0))),
            jnp.pad(
                effective_opacity(opacities, proj.compensations)[:, None],
                ((0, 1), (0, 0)),
            ),
            pad1,
            pad1,
        ],
        axis=1,
    )


def _geom_table_comp(comp, opacities):
    """_geom_table from (N,) projection components (SoA path): the table
    values are identical; assembly never touches an (N, 2/3) stack."""
    zero = jnp.zeros_like(comp.mx)
    geom = jnp.stack(
        [
            comp.mx, comp.my, comp.ca, comp.cb, comp.cc,
            effective_opacity(opacities, comp.comp), zero, zero,
        ],
        axis=-1,
    )
    return jnp.pad(geom, ((0, 1), (0, 0)))  # zero (opacity-0) sentinel row


def _geom_table_u16_comp(comp, opacities):
    """(N+1, 16) u16 [hi | lo] geometry table built DIRECTLY from (N,)
    components — bit-identical to tiles.u16_halves(_geom_table_comp(...))
    but with no (N, 8) f32 materialisation, and row-gatherable as-is (u16
    gathers are the fast kind; no split/reassemble round trip). The
    sentinel row is all-zero bits (f32 0.0 == 0x00000000)."""
    cols = [
        comp.mx, comp.my, comp.ca, comp.cb, comp.cc,
        effective_opacity(opacities, comp.comp),
    ]
    bits = [jax.lax.bitcast_convert_type(c, jnp.uint32) for c in cols]
    zero = jnp.zeros_like(bits[0])
    bits += [zero, zero]
    hi = jnp.stack([(b >> 16).astype(jnp.uint16) for b in bits], axis=-1)
    lo = jnp.stack(
        [(b & jnp.uint32(0xFFFF)).astype(jnp.uint16) for b in bits], axis=-1
    )
    return jnp.pad(jnp.concatenate([hi, lo], axis=1), ((0, 1), (0, 0)))


from gags_tpu.splat.tiles import fast_gather_rows  # noqa: F401 (re-export)


@jax.custom_vjp
def permute_rows(x, perm, inv_perm):
    """y = x[perm] with a GATHER-based VJP: dx = dy[inv_perm].

    The autodiff transpose of a gather is a scatter-add — measured at
    ~19 ms for 300k x 16 rows on v5e (XLA scatter pathology). For a
    bijective permutation the transpose IS a gather by the inverse
    permutation, and both directions use the fast u16 row gather.
    """
    return fast_gather_rows(x, perm)


def _permute_rows_fwd(x, perm, inv_perm):
    return fast_gather_rows(x, perm), (perm, inv_perm)


def _permute_rows_bwd(res, g):
    perm, inv_perm = res
    return (
        fast_gather_rows(g, inv_perm),
        _float0_like(perm),
        _float0_like(inv_perm),
    )


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def order_ext(order: jnp.ndarray) -> jnp.ndarray:
    """Depth order extended with the sentinel row mapping (rank n → row n).

    `BinnedInstances.inst_gid` holds depth ranks; tables indexed by it must
    be permuted into rank order first: `table[order_ext(order)]`.
    """
    n = order.shape[0]
    return jnp.concatenate([order, jnp.full((1,), n, jnp.int32)])


def _prepare(means, quats, scales, opacities, viewmat, K, width, height, cfg):
    """Project + bin + build the geometry table. No colour dependence.

    With cfg.soa_geom the geometry args are lane-major ((3, N), (4, N),
    (3, N)) and the whole chain runs on (N,) components — bit-identical
    values (shared projection core), no (N, k<128) stream."""
    tiles_x = -(-width // cfg.tile_w)
    tiles_y = -(-height // cfg.tile_h)
    if cfg.soa_geom:
        n = means.shape[1]
        comp = project_gaussians_soa(
            means, quats, scales, viewmat, K, width, height,
            opacities=opacities if cfg.opacity_extents else None,
        )
        means2d_arg = (comp.mx, comp.my)
        rx, ry, depths = comp.rx, comp.ry, comp.depth
        cull = _cull_rows_comp(comp, opacities) if _wants_cull(cfg) else None
        # pre-split u16 table: the unaligned blend consumes u16 halves
        # anyway; building them directly skips the (N, 8) f32 round trip
        geom = _geom_table_u16_comp(comp, opacities)
        # stacked fields only feed RasterizeResult.means2d/conics — XLA
        # DCEs them under jit when the caller consumes only the image
        proj = ProjectedGaussians(
            means2d=jnp.stack([comp.mx, comp.my], axis=-1),
            conics=jnp.stack([comp.ca, comp.cb, comp.cc], axis=-1),
            depths=comp.depth,
            radii=comp.radius,
            compensations=comp.comp,
            radii_x=comp.rx,
            radii_y=comp.ry,
        )
    else:
        n = means.shape[0]
        proj = project_gaussians(
            means, quats, scales, viewmat, K, width, height,
            opacities=opacities if cfg.opacity_extents else None,
        )
        means2d_arg = proj.means2d
        rx, ry, depths = proj.radii_x, proj.radii_y, proj.depths
        cull = _cull_rows(proj, opacities) if _wants_cull(cfg) else None
        geom = _geom_table(proj, opacities)
    binned = tiles.bin_gaussians(
        means2d_arg,
        rx,
        depths,
        width,
        height,
        cfg.tile_w,
        cfg.tile_h,
        budget=cfg.instance_budget(n),
        chunk=cfg.chunk,
        aligned=cfg.aligned,
        interpret=cfg.interpret,
        radii_y=ry,
        cull_rows=cull,
        fused_keys=cfg.fused_keys,
    )
    return proj, binned, geom, tiles_x, tiles_y


def _wants_cull(cfg) -> bool:
    return cfg.tile_cull and not cfg.aligned


def _cull_rows(proj, opacities):
    """(N, 6) [mx, my, conic_a, conic_b, conic_c, L] for the exact
    ellipse-tile cull (tiles.ellipse_tile_keep). L = ln(255*o_eff): the
    alpha-floor level set in the kernels' sigma units."""
    L = jnp.log(
        255.0 * jnp.maximum(effective_opacity(opacities, proj.compensations), 1e-12)
    )
    return jax.lax.stop_gradient(
        jnp.concatenate(
            [proj.means2d, proj.conics, L[:, None]], axis=1
        ).astype(jnp.float32)
    )


def _cull_rows_comp(comp, opacities):
    """_cull_rows from (N,) projection components (SoA path) — identical
    values, assembled without the stacked means2d/conics intermediates."""
    L = jnp.log(
        255.0 * jnp.maximum(effective_opacity(opacities, comp.comp), 1e-12)
    )
    return jax.lax.stop_gradient(
        jnp.stack([comp.mx, comp.my, comp.ca, comp.cb, comp.cc, L], axis=-1)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _blend(colors, geom_table, inst_gid, tile_starts, tile_counts,
           red_slot, red_rank, red_block, bg, grid_dims, cfg):
    """Differentiable (wrt colors) tile blend. grid_dims = (tiles_x, tiles_y).

    red_*: the cached `ReductionLayout` arrays for the scatter-free
    per-gaussian gradient reduction (see tiles.reduction_layout).
    bg (C,) is blended in-kernel against residual transmittance and is
    treated as a CONSTANT (zero cotangent), like the reference's fixed
    background tensor."""
    return _blend_fwd_impl(
        colors, geom_table, inst_gid, tile_starts, tile_counts, bg, grid_dims, cfg
    )


def _pad_channels(colors):
    """Pad C to a multiple of 8 so the (8+C, M) instance array's sublane
    dimension meets the TPU tiling constraint (RGB's 8+3=11 won't compile)."""
    c = colors.shape[1]
    c_pad = (-c) % 8
    if c_pad:
        colors = jnp.pad(colors, ((0, 0), (0, c_pad)))
    return colors, c


def _blend_fwd_impl(colors, geom_table, inst_gid, tile_starts, tile_counts, bg, grid_dims, cfg,
                    *, pre_split_colors=None, c_true=None, exit_stats=False):
    """`pre_split_colors`: forward-only (SoA) fast path — the (N+1, Cu)
    u16 colour table ALREADY channel-padded, sentinel-row-appended,
    rank-permuted and bit-converted (bf16 bits when cfg.fast_color_rows,
    [hi|lo] f32 halves otherwise). Conversion commutes with the row
    permutation, so the gathered `got` rows are bit-identical to the
    classic chain; `colors` is ignored and `c_true` must be given.

    `exit_stats`: unaligned path only — returns a third value, the fast
    kernel's per-tile (T, 8, 128) early-termination counters (see
    tile_blend_forward_fast)."""
    tiles_x, tiles_y = grid_dims
    if pre_split_colors is None:
        colors, c_true = _pad_channels(colors)
        cp_cols = colors.shape[1]
        colors_pad = jnp.concatenate(
            [colors, jnp.zeros((1, cp_cols), colors.dtype)], axis=0
        )
    else:
        assert not cfg.aligned and c_true is not None
        colors_pad = None
        cu = pre_split_colors.shape[1]
        cp_cols = cu if cfg.fast_color_rows else cu // 2
    if bg is not None and bg.shape[0] != cp_cols:
        bg = jnp.pad(bg, (0, cp_cols - bg.shape[0]))
    if not cfg.aligned:
        # inference: ONE u16 row gather of [geom hi|lo halves | colour
        # rows], split into the fast kernel's (8, M) f32 + (C, M) operands.
        # Extend the binner's one-chunk sentinel tail to a full streaming
        # segment: the kernel DMAs whole seg windows past the last range.
        seg_slack = (pk.SEG_CHUNKS - 1) * cfg.chunk
        n_sentinel = geom_table.shape[0] - 1
        inst_gid = jnp.concatenate(
            [inst_gid, jnp.full((seg_slack,), n_sentinel, jnp.int32)]
        )
        cp = cp_cols
        if geom_table.dtype == jnp.uint16:
            geom_u16 = geom_table  # pre-split (N+1, 16) — SoA path
        else:
            geom_u16 = tiles.u16_halves(geom_table)  # (N+1, 16)
        if pre_split_colors is not None:
            col_u16 = pre_split_colors  # (N+1, Cp or 2Cp)
        elif cfg.fast_color_rows:
            col_u16 = jax.lax.bitcast_convert_type(
                colors_pad.astype(jnp.bfloat16), jnp.uint16
            )  # (N+1, Cp)
        else:
            col_u16 = tiles.u16_halves(colors_pad)  # (N+1, 2Cp)
        got = jnp.concatenate([geom_u16, col_u16], axis=1)[inst_gid]
        if _TRANSPOSE_U16:
            # A/B experiment (GAGS_T16=1): ONE u16 transpose of the whole
            # gathered table (half the relayout bytes of the two f32/bf16
            # transposes below), reassembly lane-major. Bit-exact.
            gt = got.T  # (16+Cc, M) u16
            geom_inst = jax.lax.bitcast_convert_type(
                (gt[:8].astype(jnp.uint32) << 16) | gt[8:16].astype(jnp.uint32),
                jnp.float32,
            )  # (8, M)
            gc_t = gt[16:]
            if cfg.fast_color_rows:
                color_inst = jax.lax.bitcast_convert_type(gc_t, jnp.bfloat16)
            else:
                color_inst = jax.lax.bitcast_convert_type(
                    (gc_t[:cp].astype(jnp.uint32) << 16)
                    | gc_t[cp:].astype(jnp.uint32),
                    jnp.float32,
                )  # (Cp, M)
        else:
            gg = got[:, :16]
            geom_inst = jax.lax.bitcast_convert_type(
                (gg[:, :8].astype(jnp.uint32) << 16) | gg[:, 8:16].astype(jnp.uint32),
                jnp.float32,
            ).T  # (8, M)
            gc = got[:, 16:]
            if cfg.fast_color_rows:
                color_inst = jax.lax.bitcast_convert_type(gc, jnp.bfloat16).T
            else:
                color_inst = jax.lax.bitcast_convert_type(
                    (gc[:, :cp].astype(jnp.uint32) << 16)
                    | gc[:, cp:].astype(jnp.uint32),
                    jnp.float32,
                ).T  # (Cp, M)
        out = pk.tile_blend_forward_fast(
            geom_inst,
            color_inst,
            tile_starts,
            tile_counts,
            bg,
            tiles_x=tiles_x,
            tiles_y=tiles_y,
            tile_h=cfg.tile_h,
            tile_w=cfg.tile_w,
            chunk=cfg.chunk,
            p_block=cfg.p_block,
            mxu_sigma=cfg.mxu_sigma,
            blend_bf16=cfg.blend_bf16,
            interpret=cfg.interpret,
            exit_stats=exit_stats,
            block_exit=cfg.block_exit,
        )
        if exit_stats:
            out, stats = out
            return out[..., :c_true], out[..., -1:], stats
        return out[..., :c_true], out[..., -1:]
    # training path: ONE row-major gather of geometry + colours together
    # (contiguous 8+C floats per index), one transpose to lane-major
    table = jnp.concatenate([geom_table, colors_pad], axis=1)  # (N+1, 8+Cp)
    if cfg.fast_fwd_aligned:
        # forward on the streaming kernel (see the config flag): extend
        # the gather list with sentinel slack so segment DMAs stay in
        # bounds, then run the unaligned kernel over the aligned ranges
        seg_slack = (pk.SEG_CHUNKS - 1) * cfg.chunk
        n_sentinel = geom_table.shape[0] - 1
        gid_ext = jnp.concatenate(
            [inst_gid, jnp.full((seg_slack,), n_sentinel, jnp.int32)]
        )
        inst_data = fast_gather_rows(table, gid_ext)  # (M', 8+Cp)
        out = pk.tile_blend_forward_fast(
            inst_data[:, :pk.GEOM_ROWS].T,
            inst_data[:, pk.GEOM_ROWS:].T,
            tile_starts,
            tile_counts,
            bg,
            tiles_x=tiles_x,
            tiles_y=tiles_y,
            tile_h=cfg.tile_h,
            tile_w=cfg.tile_w,
            chunk=cfg.chunk,
            p_block=cfg.p_block,
            mxu_sigma=cfg.mxu_sigma,
            blend_bf16=False,  # training forward stays f32
            interpret=cfg.interpret,
            block_exit=cfg.block_exit,
        )
        return out[..., :c_true], out[..., -1:]
    inst_data = fast_gather_rows(table, inst_gid).T  # (8+Cp, M)
    out = pk.tile_blend_forward(
        inst_data,
        tile_starts,
        tile_counts,
        bg,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        tile_h=cfg.tile_h,
        tile_w=cfg.tile_w,
        chunk=cfg.chunk,
        interpret=cfg.interpret,
        aligned=cfg.aligned,
    )
    return out[..., :c_true], out[..., -1:]


def _blend_fwd(colors, geom_table, inst_gid, tile_starts, tile_counts,
               red_slot, red_rank, red_block, bg, grid_dims, cfg):
    out = _blend_fwd_impl(
        colors, geom_table, inst_gid, tile_starts, tile_counts, bg, grid_dims, cfg
    )
    residuals = (
        colors.shape[0], geom_table, inst_gid, tile_starts, tile_counts,
        red_slot, red_rank, red_block, bg,
    )
    return out, residuals


def _float0_like(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _reduce_by_rank(grad_inst_t, red_slot, red_rank, red_block, n, cfg):
    """Per-instance grads (M, C) → per-RANK sums (n, C), scatter-free.

    Gather rows into the cached rank-sorted block-aligned layout, then the
    Pallas one-hot-matmul reduction (sorted_segment_sum). Replaces
    jax.ops.segment_sum, whose scatter-add lowering cost ~59 ms/step."""
    cdim = grad_inst_t.shape[1]
    rows_ext = jnp.concatenate(
        [grad_inst_t, jnp.zeros((1, cdim), grad_inst_t.dtype)], axis=0
    )
    # u16 halves straight into the kernel: reassembly happens in-register
    # there (a pre-assembled (Mp, C) f32 array costs ~6 ms in XLA relayouts)
    rows_u16 = tiles.u16_halves(rows_ext)[red_slot]
    return pk.sorted_segment_sum(
        rows_u16, red_rank, red_block, num_ranks=n + 1, interpret=cfg.interpret
    )[:n]


def _blend_bwd(grid_dims, cfg, res, g):
    if not cfg.aligned:
        raise ValueError(
            "backward through the blend requires aligned binning "
            "(RasterizeConfig.aligned=True): unaligned gradient-write "
            "chunks would race across tile boundaries"
        )
    (n, geom_table, inst_gid, tile_starts, tile_counts,
     red_slot, red_rank, red_block, bg) = res
    tiles_x, tiles_y = grid_dims
    g_img, _g_alpha = g  # alpha has no colour dependence
    c_true = g_img.shape[-1]
    g_img = jnp.pad(g_img, ((0, 0), (0, 0), (0, (-c_true) % 8)))
    geom_inst = fast_gather_rows(geom_table, inst_gid).T  # (8, M) — recomputed
    grad_inst = pk.tile_blend_backward(
        geom_inst,  # backward reads only the first 8 rows
        tile_starts,
        tile_counts,
        g_img,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        tile_h=cfg.tile_h,
        tile_w=cfg.tile_w,
        chunk=cfg.chunk,
        interpret=cfg.interpret,
    )  # (M, C) row-major — feeds the reduction gather conversion-free
    grad_colors = _reduce_by_rank(
        grad_inst, red_slot, red_rank, red_block, n, cfg
    )[:, :c_true]
    return (
        grad_colors,
        jnp.zeros_like(geom_table),
        _float0_like(inst_gid),
        _float0_like(tile_starts),
        _float0_like(tile_counts),
        _float0_like(red_slot),
        _float0_like(red_rank),
        _float0_like(red_block),
        jnp.zeros_like(bg),  # background treated as constant
    )


_blend.defvjp(_blend_fwd, _blend_bwd)


# ---------------------------------------------------------------------------
# full-gradient blend: colours AND screen-space geometry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _blend_full(colors, geom_table, inst_gid, tile_starts, tile_counts,
                red_slot, red_rank, red_block, bg, grid_dims, cfg):
    """Tile blend differentiable wrt colors AND the (N+1, 8) geometry table
    ([mx, my, ca, cb, cc, opac, 0, 0] rows). Chaining the table gradient
    through the (pure-JAX, autodiffable) projection yields means / quats /
    scales / opacities gradients — the rasterizer VJP the reference gets
    from gsplat's CUDA backward, needed for RGB pretraining/densification."""
    return _blend_fwd_impl(
        colors, geom_table, inst_gid, tile_starts, tile_counts, bg, grid_dims, cfg
    )


def _blend_full_fwd(colors, geom_table, inst_gid, tile_starts, tile_counts,
                    red_slot, red_rank, red_block, bg, grid_dims, cfg):
    out = _blend_fwd_impl(
        colors, geom_table, inst_gid, tile_starts, tile_counts, bg, grid_dims, cfg
    )
    residuals = (colors, geom_table, inst_gid, tile_starts, tile_counts,
                 red_slot, red_rank, red_block, bg)
    return out, residuals


def _blend_full_bwd(grid_dims, cfg, res, g):
    if not cfg.aligned:
        raise ValueError(
            "backward through the blend requires aligned binning "
            "(RasterizeConfig.aligned=True)"
        )
    (colors, geom_table, inst_gid, tile_starts, tile_counts,
     red_slot, red_rank, red_block, bg) = res
    n = colors.shape[0]
    tiles_x, tiles_y = grid_dims
    g_img, g_alpha = g
    c_true = g_img.shape[-1]
    g_img = jnp.pad(g_img, ((0, 0), (0, 0), (0, (-c_true) % 8)))
    # the forward blends bg in-kernel: image = acc + T_fin*bg, so the image
    # cotangent carries a dL/dT_fin term the kernel must see via its alpha
    # cotangent (alpha = 1 - T_fin): galpha_eff = galpha - g_img . bg
    g_alpha = g_alpha - jnp.sum(
        g_img[..., :c_true] * bg[: c_true][None, None, :], axis=-1, keepdims=True
    )
    colors, _ = _pad_channels(colors)
    colors_pad = jnp.concatenate(
        [colors, jnp.zeros((1, colors.shape[1]), colors.dtype)], axis=0
    )
    table = jnp.concatenate([geom_table, colors_pad], axis=1)
    inst_data = fast_gather_rows(table, inst_gid).T
    grad_inst_col, grad_inst_geom = pk.tile_blend_backward_full(
        inst_data,
        tile_starts,
        tile_counts,
        g_img,
        g_alpha,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        tile_h=cfg.tile_h,
        tile_w=cfg.tile_w,
        chunk=cfg.chunk,
        interpret=cfg.interpret,
    )
    grad_colors = _reduce_by_rank(
        grad_inst_col.T, red_slot, red_rank, red_block, n, cfg
    )[:, :c_true]
    # per-rank geometry grads incl the sentinel row n → (N+1, 8)
    grad_table = _reduce_by_rank(
        grad_inst_geom.T, red_slot, red_rank, red_block, n + 1, cfg
    )
    return (
        grad_colors,
        grad_table,  # (N+1, 8) — matches geom_table
        _float0_like(inst_gid),
        _float0_like(tile_starts),
        _float0_like(tile_counts),
        _float0_like(red_slot),
        _float0_like(red_rank),
        _float0_like(red_block),
        jnp.zeros_like(bg),  # background treated as constant
    )


_blend_full.defvjp(_blend_full_fwd, _blend_full_bwd)


def _project_geom_table(means, quats, scales, opacities, viewmat, K, width,
                        height, means2d_tap=None):
    proj = project_gaussians(means, quats, scales, viewmat, K, width, height)
    if means2d_tap is not None:
        # zero-valued differentiable tap: grad wrt it IS dL/dmeans2d in
        # pixels — the JAX equivalent of the reference's
        # info["means2d"].retain_grad() (gaussian_renderer/__init__.py:76),
        # consumed by densification stats (gaussian_model.py:476-482)
        proj = proj._replace(means2d=proj.means2d + means2d_tap)
    return _geom_table(proj, opacities), proj


def prepare_binning(
    means, quats, scales, viewmat, K,
    width: int, height: int, config: RasterizeConfig = RasterizeConfig(),
    opacities=None,
) -> tiles.BinnedInstances:
    """Camera-invariant-geometry fast path, stage 1: the sorted instance
    list for one (frozen geometry, camera) pair.

    GAD's geometry never changes (only per-Gaussian features train), so
    this — the sort-dominated part of rasterization — is computed once per
    camera by the data pipeline and reused for all 30k iterations. The
    reference re-runs the CUDA projection + radix sort every iteration.
    """
    proj = project_gaussians(
        means, quats, scales, viewmat, K, width, height,
        opacities=opacities if config.opacity_extents else None,
    )
    n = means.shape[0]
    return tiles.bin_gaussians(
        proj.means2d, proj.radii_x, proj.depths, width, height,
        config.tile_w, config.tile_h,
        budget=config.instance_budget(n), chunk=config.chunk,
        aligned=config.aligned, interpret=config.interpret,
        radii_y=proj.radii_y,
        cull_rows=_cull_rows(proj, opacities)
        if (_wants_cull(config) and opacities is not None) else None,
    )


def rasterize_binned(
    means, quats, scales, opacities, colors,
    viewmat, K,
    inst_gid: jnp.ndarray,
    tile_starts: jnp.ndarray,
    tile_counts: jnp.ndarray,
    width: int,
    height: int,
    background: Optional[jnp.ndarray] = None,
    config: RasterizeConfig = RasterizeConfig(),
    *,
    order: jnp.ndarray,
    red_slot: jnp.ndarray,
    red_rank: jnp.ndarray,
    red_block: jnp.ndarray,
):
    """Stage 2: re-project (cheap) + gather + blend using a cached binning.

    `order` is the cached `BinnedInstances.order` — inst_gid holds depth
    ranks, so the tables are permuted into rank order here (required: rank
    indices into an unpermuted table would silently blend wrong Gaussians).
    `red_*` is the cached `BinnedInstances.red` reduction layout.
    Differentiable wrt colors. Returns (image (H,W,C), alpha (H,W)).
    """
    assert not config.soa_geom, (
        "rasterize_binned is a training path (AoS geometry only)"
    )
    means = jax.lax.stop_gradient(means)
    quats = jax.lax.stop_gradient(quats)
    scales = jax.lax.stop_gradient(scales)
    opacities = jax.lax.stop_gradient(opacities)
    geom, _proj = _project_geom_table(
        means, quats, scales, opacities, viewmat, K, width, height
    )
    tiles_x = -(-width // config.tile_w)
    tiles_y = -(-height // config.tile_h)
    inv_order = jnp.argsort(order).astype(jnp.int32)
    geom = fast_gather_rows(geom, order_ext(order))
    # differentiable permutation: grads come back via inv_order GATHER
    # (the autodiff transpose would be a ~19 ms scatter)
    colors = permute_rows(colors, order, inv_order)
    if background is None:
        background = jnp.zeros((colors.shape[1],), jnp.float32)
    tile_img, tile_alpha = _blend(
        colors, geom, inst_gid, tile_starts, tile_counts,
        red_slot, red_rank, red_block, background,
        (tiles_x, tiles_y), config,
    )
    to_img, to_alpha = _image_epilogue(config)
    img = to_img(
        tile_img, tiles_x, tiles_y, config.tile_h, config.tile_w, height, width
    )
    alpha = to_alpha(
        tile_alpha, tiles_x, tiles_y, config.tile_h, config.tile_w, height, width
    )
    return img, alpha


def rasterize(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    background: Optional[jnp.ndarray] = None,
    config: RasterizeConfig = RasterizeConfig(),
    means2d_tap: Optional[jnp.ndarray] = None,
) -> RasterizeResult:
    """Rasterize N Gaussians with C colour channels into an (H, W, C) image.

    `means2d_tap`: optional (N, 2) ZERO-valued array added to the projected
    screen positions inside the differentiable path (geometry_grads only).
    Its gradient is exactly dL/dmeans2d in pixel units — the screen-space
    densification signal the reference reads via retain_grad.

    Gradients: d image / d colors is always exact. With
    config.geometry_grads, gradients also flow to means / quats / scales /
    opacities (Pallas full backward + autodiff through the projection);
    otherwise geometry is stop-gradiented — the GAD training setup, where
    only per-Gaussian features are optimised (gaussian_model.py:192-206).
    Tile binning is discrete and always treated as non-differentiable.
    """
    if not config.geometry_grads:
        means = jax.lax.stop_gradient(means)
        quats = jax.lax.stop_gradient(quats)
        scales = jax.lax.stop_gradient(scales)
        opacities = jax.lax.stop_gradient(opacities)

    # binning decisions come from a gradient-stopped projection
    if config.soa_geom:
        # SoA contract: lane-major geometry, forward-only inference path
        assert not config.geometry_grads, (
            "soa_geom is forward-only (the differentiable table path "
            "takes AoS geometry)"
        )
        assert not config.aligned, "soa_geom requires aligned=False"
        assert means.shape[0] == 3 and quats.shape[0] == 4, (
            "soa_geom: pass means (3, N), quats (4, N), scales (3, N)"
        )
    proj_sg, binned, geom_sg, tiles_x, tiles_y = _prepare(
        jax.lax.stop_gradient(means),
        jax.lax.stop_gradient(quats),
        jax.lax.stop_gradient(scales),
        jax.lax.stop_gradient(opacities),
        viewmat, K, width, height, config,
    )
    proj = proj_sg
    if config.geometry_grads:
        # differentiable geometry table (autodiff chains table grads back)
        geom_table, proj = _project_geom_table(
            means, quats, scales, opacities, viewmat, K, width, height,
            means2d_tap,
        )
        blend_fn = _blend_full
    else:
        # _prepare's table IS the stop-gradient table (jit deduped the
        # old rebuild anyway; the SoA path depends on reusing it)
        geom_table, blend_fn = geom_sg, _blend
    # inst_gid holds depth ranks — permute tables to rank order (N-sized
    # fast gathers; the differentiable permutes use gather-based VJPs)
    perm = order_ext(binned.order)
    inv_order = jnp.argsort(binned.order).astype(jnp.int32)
    inv_perm = jnp.concatenate(
        [inv_order, jnp.full((1,), binned.order.shape[0], jnp.int32)]
    )
    if binned.red is not None:
        red = binned.red
    else:
        # unaligned inference binning carries no reduction layout; any
        # attempt to differentiate raises in _blend_bwd before these
        # placeholders are touched
        red = tiles.ReductionLayout(
            slot_to_pos=jnp.zeros((128,), jnp.int32),
            slot_rank=jnp.full((128,), -1, jnp.int32),
            chunk_block=jnp.zeros((1,), jnp.int32),
        )
    if background is None:
        background = jnp.zeros((colors.shape[1],), jnp.float32)
    if config.soa_geom:
        # forward-only SoA fast path: both tables pre-split to u16 BEFORE
        # the rank permutation (conversion commutes with row permutes, so
        # `got` is bit-identical), then row-gathered natively — no f32
        # split→gather→reassemble round trips, no custom_vjp wrapper
        # (differentiating the unaligned path raises anyway).
        c_true = colors.shape[1]
        colors_p, _ = _pad_channels(colors)
        colors_sent = jnp.concatenate(
            [colors_p, jnp.zeros((1, colors_p.shape[1]), colors_p.dtype)]
        )
        if config.fast_color_rows:
            col_u16 = jax.lax.bitcast_convert_type(
                colors_sent.astype(jnp.bfloat16), jnp.uint16
            )
        else:
            col_u16 = tiles.u16_halves(colors_sent)
        tile_img, tile_alpha = _blend_fwd_impl(
            colors,  # ignored (pre_split_colors takes over)
            geom_table[perm],
            binned.inst_gid,
            binned.tile_starts,
            binned.tile_counts,
            background,
            (tiles_x, tiles_y),
            config,
            pre_split_colors=col_u16[perm],
            c_true=c_true,
        )
    else:
        tile_img, tile_alpha = blend_fn(
            permute_rows(colors, binned.order, inv_order),
            permute_rows(geom_table, perm, inv_perm),
            binned.inst_gid,
            binned.tile_starts,
            binned.tile_counts,
            red.slot_to_pos,
            red.slot_rank,
            red.chunk_block,
            background,
            (tiles_x, tiles_y),
            config,
        )
    to_img, to_alpha = _image_epilogue(config)
    img = to_img(
        tile_img, tiles_x, tiles_y, config.tile_h, config.tile_w, height, width
    )
    alpha = to_alpha(
        tile_alpha, tiles_x, tiles_y, config.tile_h, config.tile_w, height, width
    )
    return RasterizeResult(
        image=img,
        alpha=alpha,
        radii=proj.radii,
        means2d=proj.means2d,
        overflow=binned.overflow,
    )


def rasterize_exit_stats(
    means, quats, scales, opacities, colors, viewmat, K,
    width: int, height: int,
    background: Optional[jnp.ndarray] = None,
    config: RasterizeConfig = RasterizeConfig(),
):
    """Fast-path forward WITH the kernel's per-tile early-exit counters.

    Returns (tile_stats (T, 8, 128), num_valid). Row 0 lanes 0-4 of each
    tile: segments done/total, chunks done/total, final max ungated
    log-T (the exit-condition quantity).

    This exists because `_blend_fwd_impl` takes tables ALREADY permuted
    to depth-rank order — `rasterize()` does that permutation inline —
    and every probe that called the impl directly with `_prepare`'s raw
    gid-ordered table measured a garbage workload: round-5 battery 1b/3
    recorded "chunk-stop 0.0%" from exactly this misuse (each instance
    blended the geometry of gaussian rank-id instead of its own, so
    saturation structure was destroyed while drain timings — which used
    the correct `rasterize()` — stayed valid). Use THIS for counters.
    """
    assert not config.aligned, "exit stats: unaligned fast path only"
    pj, binned, geom_table, tiles_x, tiles_y = _prepare(
        means, quats, scales, opacities, viewmat, K, width, height, config
    )
    perm = order_ext(binned.order)
    inv_order = jnp.argsort(binned.order).astype(jnp.int32)
    inv_perm = jnp.concatenate(
        [inv_order, jnp.full((1,), binned.order.shape[0], jnp.int32)]
    )
    if background is None:
        background = jnp.zeros((colors.shape[1],), jnp.float32)
    _, _, stats = _blend_fwd_impl(
        permute_rows(colors, binned.order, inv_order),
        permute_rows(geom_table, perm, inv_perm),
        binned.inst_gid,
        binned.tile_starts,
        binned.tile_counts,
        background,
        (tiles_x, tiles_y),
        config,
        exit_stats=True,
    )
    return stats, binned.num_valid
