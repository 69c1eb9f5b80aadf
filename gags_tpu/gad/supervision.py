"""GT supervision construction: gather + blend CLIP features per pixel.

Counterpart of the reference's `read_sam_clip_feature`
(`scene/dataset_readers.py:54-121`) and `get_trained_seg`
(`utils/loss_utils.py:138-154`), expressed as pure vectorised gathers so
they run *inside* the jitted train step — the reference instead stages
img_embed/seg_map on CPU and moves them every iteration (train.py:51-52,
162-165).

Layouts: seg_map (H, W, 4) int32 with levels [default, s, m, l] and -1 for
"no mask"; img_embed (M, D) padded to a static M; scale_map (H, W, 3).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gags_tpu.gad import losses
from gags_tpu.utils.image import mean_smooth, resize_bilinear_align_corners, resize_nearest


def segment_median(values: jnp.ndarray, seg: jnp.ndarray, num_segments: int):
    """Per-segment lower median (torch.median semantics) of flat `values`.

    seg < 0 entries are excluded. Returns (medians (S,), counts (S,));
    empty segments get median 0. One lexicographic (seg, value) sort +
    searchsorted run boundaries — no data-dependent shapes.
    """
    s = jnp.where(seg < 0, jnp.int32(num_segments), seg.astype(jnp.int32))
    s_sorted, v_sorted = jax.lax.sort((s, values), num_keys=2)
    bounds = jnp.arange(num_segments + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(s_sorted, bounds, side="left")
    counts = starts[1:] - starts[:-1]
    pos = starts[:-1] + jnp.maximum(counts - 1, 0) // 2
    med = v_sorted[jnp.minimum(pos, values.shape[0] - 1)]
    return jnp.where(counts > 0, med, 0.0), counts


def mixed_seg_map(seg_map: jnp.ndarray, scale_map: jnp.ndarray) -> jnp.ndarray:
    """Compose one (H, W) id map by picking the argmax granularity per pixel.

    The scale map is box-smoothed (k=5) first, then argmax over the 3
    granularities selects which of the s/m/l id maps supplies each pixel —
    matching `get_trained_seg` exactly.
    """
    sm = mean_smooth(scale_map, 5)  # (H, W, 3)
    sel = jnp.argmax(sm, axis=-1)  # (H, W) in {0,1,2}
    sml = seg_map[..., 1:4]  # (H, W, 3)
    return jnp.take_along_axis(sml, sel[..., None], axis=-1)[..., 0]


@jax.custom_vjp
def fused_supervision_l1(
    decoded: jnp.ndarray,   # (..., D) f32 decoder output (3-D or flat)
    img_embed: jnp.ndarray,  # (M, D) per-mask CLIP embeddings (data, no grad)
    seg_sml: jnp.ndarray,   # (..., 3) int32 s/m/l ids, -1 = no mask
    scale_map: jnp.ndarray,  # (..., 3) granularity weights
) -> jnp.ndarray:
    """Masked per-pixel L1 against the blended GT map, residual-free.

    Equals `l1_map(decoded * maskf, gt_map * maskf)` for the same-resolution
    default-mode `blend_gt_feature_map` (the GAD train-step path), but as a
    custom-VJP whose residuals are the RAW INPUTS only: the default AD of
    the composition saves the gathered (H, W, 3, D)-worth of embedding rows
    (or gt_map) as residuals and materialises a (H, W, D) `d_gt` cotangent
    in the backward — ~1.4 GB/step of extra HBM traffic at 360p/512-d that
    the round-2 train profile showed as unfused converts/copies. Here the
    backward recomputes the gather terms and contracts them against
    sign(diff) directly into the (H, W, 3) scale-map cotangent.

    img_embed is treated as data: its cotangent is returned as zeros (the
    train step never differentiates w.r.t. the supervision embeddings).

    All internal math runs on FLAT (H*W, D) arrays: the r4 battery-2 HLO
    profile showed the 3-D (H, W, 512) gather terms each paying an
    unfused f16->f32 convert (1.14 ms) plus a {2,1,0}->{1,2,0} layout
    copy (1.43 ms) to satisfy the reduce/conv fusions' layout choice —
    ~7.7 ms/step at 360p/512-d. 2-D arrays leave XLA no 3-D layout
    freedom; the boundary reshapes are bitcasts on canonical layouts and
    the per-element math/reduction order is unchanged (bit-identical).

    Leading dims are polymorphic: (H, W, D) and pre-flattened (H*W, D)
    callers get identical values (the train step passes flat pixels so no
    big 3-D tensor ever exists — see gad/train.py's _supervision_losses).
    """
    lead, d = decoded.shape[:-1], decoded.shape[-1]
    gt, maskf = _fused_sup_primal(
        img_embed, seg_sml.reshape(-1, 3), scale_map.reshape(-1, 3)
    )
    dec2 = decoded.reshape(-1, d)
    return losses.channel_mean(jnp.abs(dec2 * maskf - gt * maskf)).reshape(lead)


def _fused_sup_primal(img_embed, seg2, scale2):
    # EXACTLY the same-resolution fast path of blend_gt_feature_map: three
    # gather+fma terms, one loop fusion (see that function's comment).
    # seg2/scale2 are flat (P, 3); returns ((P, D), (P, 1)).
    maskf = jnp.all(seg2 != -1, axis=-1).astype(jnp.float32)[..., None]
    # convert the (M, D) TABLE once, not the three (P, D) gather outputs:
    # the r4 train profile showed each gather's f16->f32 convert as a
    # separate unfused 1.14 ms / 450 MB elementwise op (230400x512) —
    # 3.4 ms/step for what is a ~300-row table cast. Gather rows in f32;
    # values are bit-identical (same cast, applied before the copy).
    table = img_embed.astype(jnp.float32)

    def term(g):
        f = table[seg2[..., g] % table.shape[0]]
        return f * scale2[..., g : g + 1]

    return term(0) + term(1) + term(2), maskf


def _fused_sup_fwd(decoded, img_embed, seg_sml, scale_map):
    return (
        fused_supervision_l1(decoded, img_embed, seg_sml, scale_map),
        (decoded, img_embed, seg_sml, scale_map),
    )


def _fused_sup_bwd(res, g):
    decoded, img_embed, seg_sml, scale_map = res
    lead, d = decoded.shape[:-1], decoded.shape[-1]
    seg2 = seg_sml.reshape(-1, 3)
    gt, maskf = _fused_sup_primal(img_embed, seg2, scale_map.reshape(-1, 3))
    dec2 = decoded.reshape(-1, d)
    sgn = jnp.sign(dec2 * maskf - gt * maskf)  # (P, D)
    gm = (g.reshape(-1) / d)[..., None] * maskf  # (P, 1)
    d_decoded = (gm * sgn).reshape(lead + (d,))

    table = img_embed.astype(jnp.float32)  # cast the table, not the gathers

    def d_scale_term(k):
        f = table[seg2[..., k] % table.shape[0]]
        return -jnp.sum(sgn * f, axis=-1) * gm[..., 0]  # (P,)

    d_scale = jnp.stack(
        [d_scale_term(k) for k in range(3)], axis=-1
    ).reshape(lead + (3,))
    import numpy as np

    d_seg = np.zeros(seg_sml.shape, dtype=jax.dtypes.float0)
    return d_decoded, jnp.zeros_like(img_embed), d_seg, d_scale


fused_supervision_l1.defvjp(_fused_sup_fwd, _fused_sup_bwd)


def blend_gt_feature_map(
    img_embed: jnp.ndarray,  # (M, D) per-mask CLIP embeddings
    seg_map: jnp.ndarray,  # (H, W, 4) int32
    scale_map: jnp.ndarray,  # (h, w, 3) granularity weights at render res
    max_mode: bool = False,
    median_mode: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel GT CLIP map blended across granularities.

    Returns (feature_map (h, w, D), mask (h, w, 1)).

    Parity notes vs the reference:
      * seg ids of -1 gather `img_embed[-1]` there (python negative
        indexing) — and when seg/render resolutions differ, that last row
        BLEEDS into mask-valid pixels through the align_corners bilinear
        resize, so clamping to row 0 is NOT equivalent; we reproduce the
        wraparound (-1 -> M-1). With a zero-padded embedding table the
        bleed source is a zero row instead of the last real mask — benign,
        and exact golden parity holds for unpadded tables
        (tests/test_reference_golden.py).
      * feature maps are bilinear-resized with align_corners=True and masks
        nearest-resized when seg and render resolutions differ
        (dataset_readers.py:72-79).
      * median_mode (dataset_readers.py:90-118): every pixel of an s-level
        segment gets that segment's per-channel MEDIAN scale weights
        (normalised to sum 1); the reference's python loop over segment ids
        becomes one (seg, value) sort per channel.
    """
    h_out, w_out = scale_map.shape[0], scale_map.shape[1]

    seg_sml = seg_map[..., 1:4]  # (H, W, 3)
    valid = seg_sml != -1

    if (
        (h_out, w_out) == seg_map.shape[:2]
        and not max_mode
        and not median_mode
    ):
        # same-resolution fast path (the -r 0 / feature-res training case):
        # three separate gather+fma terms keep XLA in ONE loop fusion —
        # the generic path's (H, W, 3, D) f32 intermediate costs ~14 ms/step
        # at 360p/512-d in reshape/copy/convert traffic (1.4 GB)
        mask = jnp.all(valid, axis=-1)[..., None]
        table = img_embed.astype(jnp.float32)  # cast table, not gathers

        def term(g):
            f = table[seg_sml[..., g] % table.shape[0]]
            return f * scale_map[..., g : g + 1]

        return term(0) + term(1) + term(2), mask

    idx = seg_sml % img_embed.shape[0]  # -1 wraps to the last row
    # gather in the embeddings' storage dtype (f16 on disk — reference
    # preprocess.py:352 saves half precision), halving the dominant HBM
    # traffic of supervision; arithmetic upcasts to f32 right after
    feats = img_embed[idx].astype(jnp.float32)  # (H, W, 3, D)

    mask_all = jnp.all(valid, axis=-1).astype(jnp.float32)[..., None]  # (H, W, 1)
    mask = resize_nearest(mask_all, (h_out, w_out)).astype(bool)

    fs = resize_bilinear_align_corners(feats[..., 0, :], (h_out, w_out))
    fm = resize_bilinear_align_corners(feats[..., 1, :], (h_out, w_out))
    fl = resize_bilinear_align_corners(feats[..., 2, :], (h_out, w_out))

    if max_mode:
        ms = resize_nearest(valid[..., 0].astype(jnp.float32), (h_out, w_out))
        mm = resize_nearest(valid[..., 1].astype(jnp.float32), (h_out, w_out))
        ml = resize_nearest(valid[..., 2].astype(jnp.float32), (h_out, w_out))
        sel = jnp.argmax(scale_map, axis=-1)
        one_hot = jnp.eye(3, dtype=scale_map.dtype)[sel]  # (h, w, 3)
        fmap = (
            fs * (one_hot[..., 0] * ms)[..., None]
            + fm * (one_hot[..., 1] * mm)[..., None]
            + fl * (one_hot[..., 2] * ml)[..., None]
        )
        mask = fmap[..., 0:1] != 0.0
    elif median_mode:
        num_segments = img_embed.shape[0]
        seg_r = resize_nearest(
            seg_map.astype(jnp.float32), (h_out, w_out)
        ).astype(jnp.int32)
        seg_s = seg_r[..., 1]  # scale_bal_idx=1: the s-granularity segments
        flat = seg_s.reshape(-1)
        med = jnp.stack(
            [
                segment_median(scale_map[..., ch].reshape(-1), flat, num_segments)[0]
                for ch in range(3)
            ],
            axis=-1,
        )  # (S, 3)
        # guard: segments absent from the image have all-zero medians; the
        # where(seg_s != -1) below discards those rows, but an unguarded 0/0
        # would poison the whole gt_map through NaN propagation in gradients
        med = med / jnp.maximum(jnp.sum(med, axis=-1, keepdims=True), 1e-12)
        balanced = med[jnp.maximum(flat, 0)].reshape(h_out, w_out, 3)
        scale_bal = jnp.where((seg_s != -1)[..., None], balanced, scale_map)
        fmap = (
            fs * scale_bal[..., 0:1]
            + fm * scale_bal[..., 1:2]
            + fl * scale_bal[..., 2:3]
        )
    else:
        fmap = (
            fs * scale_map[..., 0:1]
            + fm * scale_map[..., 1:2]
            + fl * scale_map[..., 2:3]
        )
    return fmap, mask
