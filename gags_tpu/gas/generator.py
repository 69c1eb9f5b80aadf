"""Automatic mask generation with granularity bucketing (GAS stage C core).

Counterpart of the reference's forked `SamAutomaticMaskGenerator.generate`
returning a 4-tuple of mask lists (`preprocess.py:468`): for every point
prompt SAM's three multimask outputs are kept and bucketed by token —
subpart (s) / part (m) / whole (l) — plus a score-selected "default" set;
each bucket is filtered by predicted IoU, stability score and box NMS
before the GAGS mask NMS (`gags_tpu.gas.masks`).

TPU-first: prompts run in static batches under one jitted decode; the
filtering runs on host over the (already small) surviving masks.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    points_per_batch: int = 256
    pred_iou_thresh: float = 0.7      # preprocess.py:231
    stability_score_thresh: float = 0.85
    stability_offset: float = 1.0
    box_nms_thresh: float = 0.7
    min_mask_region_area: int = 100
    mask_threshold: float = 0.0
    # prompts whose low-res logits are upscaled to full image size at once:
    # the (B, 4, S, S) f32 upscale costs B*4*S^2*4 bytes (4.3 GB at B=256,
    # S=1024) — sliced to keep peak HBM at ~0.5 GB
    upscale_slice: int = 32


def stability_score(mask_logits: jnp.ndarray, thresh: float, offset: float) -> jnp.ndarray:
    """IoU between the mask at (thresh+offset) and (thresh-offset)."""
    hi = jnp.sum(mask_logits > thresh + offset, axis=(-2, -1)).astype(jnp.float32)
    lo = jnp.sum(mask_logits > thresh - offset, axis=(-2, -1)).astype(jnp.float32)
    return hi / jnp.maximum(lo, 1.0)


def mask_to_box(mask: np.ndarray) -> Tuple[int, int, int, int]:
    """XYWH bbox of a binary mask (0,0,0,0 when empty)."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return (0, 0, 0, 0)
    return (int(xs.min()), int(ys.min()), int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1))


def box_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> List[int]:
    """Greedy IoU NMS over XYXY boxes (torchvision.batched_nms semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep: List[int] = []
    sup = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clip(0) * (boxes[:, 3] - boxes[:, 1]).clip(0)
    for i in order:
        if sup[i]:
            continue
        keep.append(int(i))
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = (x2 - x1).clip(0) * (y2 - y1).clip(0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        sup |= iou > thresh
    return keep


def remove_small_regions(
    mask: np.ndarray, area_thresh: float, mode: str
) -> Tuple[np.ndarray, bool]:
    """Remove small disconnected regions ('islands') or fill small 'holes'.

    Semantics of segment-anything's utils.amg.remove_small_regions (the
    cleanup `min_mask_region_area=100` triggers, preprocess.py:235):
    8-connected components of the mask (islands) or its complement (holes);
    components below `area_thresh` are flipped. If removing islands would
    empty the mask, the largest island is kept. Returns (mask, changed).
    """
    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    try:
        import cv2

        n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
        sizes = stats[1:, -1]
    except ImportError:  # pragma: no cover - cv2 is in the base env
        from scipy import ndimage

        regions, n_comp = ndimage.label(working, structure=np.ones((3, 3)))
        n_labels = n_comp + 1
        sizes = np.bincount(regions.reshape(-1), minlength=n_labels)[1:]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n_labels) if i not in fill]
        if not fill:  # every island is small: keep the largest
            fill = [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True


def postprocess_small_regions(
    recs: List[dict], min_area: int, nms_thresh: float
) -> List[dict]:
    """Per-mask island/hole cleanup + dedup NMS, preferring unchanged masks.

    Mirrors SamAutomaticMaskGenerator.postprocess_small_regions: fill holes
    < min_area, drop islands < min_area, recompute boxes, then box-NMS with
    score 1.0 for untouched masks and 0.0 for modified ones so cleanup-
    created duplicates collapse onto the original mask.
    """
    if not recs or min_area <= 0:
        return recs
    cleaned, scores = [], []
    for r in recs:
        m = r["segmentation"]
        m, ch1 = remove_small_regions(m, min_area, "holes")
        m, ch2 = remove_small_regions(m, min_area, "islands")
        cleaned.append(m)
        scores.append(0.0 if (ch1 or ch2) else 1.0)
    boxes = np.array(
        [
            (lambda b: [b[0], b[1], b[0] + b[2], b[1] + b[3]])(mask_to_box(m))
            for m in cleaned
        ],
        np.float32,
    )
    keep = box_nms(boxes, np.array(scores, np.float32), nms_thresh)
    out = []
    for i in sorted(keep):
        r = recs[i]
        if scores[i] == 0.0:  # changed: rewrite segmentation/area/bbox
            r = dict(r)
            r["segmentation"] = cleaned[i]
            r["area"] = int(cleaned[i].sum())
            r["bbox"] = mask_to_box(cleaned[i])
        out.append(r)
    return out


class AutomaticMaskGenerator:
    """4-granularity automatic mask generator over a jitted SAM."""

    def __init__(self, sam_model, sam_params, sam_cfg, gen_cfg: GeneratorConfig = GeneratorConfig()):
        self.model = sam_model
        # converted checkpoints arrive as numpy trees; indexing ops inside
        # the jitted towers (rel-pos gathers) need device arrays
        sam_params = jax.tree.map(jnp.asarray, sam_params)
        self.params = sam_params
        self.sam_cfg = sam_cfg
        self.cfg = gen_cfg
        self._encode = jax.jit(
            lambda img: sam_model.apply(sam_params, img, method="encode_image")
        )
        self._decode = jax.jit(
            lambda emb, pts, lbl: sam_model.apply(
                sam_params, emb, pts, lbl, method="decode"
            )
        )
        size = sam_cfg.image_size

        @functools.partial(jax.jit, static_argnames=("nh", "nw", "h", "w"))
        def _upscale(ms, nh, nw, h, w):
            ms = jax.image.resize(
                ms, (ms.shape[0], ms.shape[1], size, size), "bilinear"
            )[:, :, :nh, :nw]
            return jax.image.resize(
                ms, (ms.shape[0], ms.shape[1], h, w), "bilinear"
            )

        self._upscale = _upscale

    def encode_images(
        self, images: List[np.ndarray], pad_to: "int | None" = None
    ) -> List[jnp.ndarray]:
        """Batch-encode several images through the ViT encoder at once.

        The encoder's measured sweet spot on one v5e is batch 4 with bf16
        params (106 ms/img vs 154 single-image f32 — r4 battery); the
        per-image AMG decode loop stays sequential, so callers batch the
        ENCODER only: feed each returned embedding back via
        `generate(..., embed=...)`. `pad_to` repeats the last image up to
        a fixed batch size so a dataset's final partial group reuses the
        full-group compilation instead of paying a fresh one (~25-40 s on
        the tunnel). Counterpart of the reference's per-image
        predictor.set_image loop (preprocess.py:186-330), which cannot
        batch.
        """
        from gags_tpu.models.sam import preprocess_sam_image

        if not images:
            return []
        batches = [
            preprocess_sam_image(img, self.sam_cfg.image_size)[0]
            for img in images
        ]
        n = len(batches)
        if pad_to is not None and n < pad_to:
            batches = batches + [batches[-1]] * (pad_to - n)
        embeds = self._encode(jnp.concatenate(batches, axis=0))
        return [embeds[i : i + 1] for i in range(n)]

    def generate(
        self, image: np.ndarray, point_grid: np.ndarray,
        embed: "jnp.ndarray | None" = None,
    ) -> Tuple[List[dict], List[dict], List[dict], List[dict]]:
        """image: uint8 (H, W, 3); point_grid: (P, 2) normalised [0,1].

        `embed`: optional precomputed (1, ...) image embedding from
        `encode_images` (the resize geometry (nh, nw) is recomputed from
        the image shape — it is a pure function of (h, w)).

        Returns (masks_default, masks_s, masks_m, masks_l) — SAM-style dicts
        with segmentation/area/bbox/predicted_iou/stability_score.
        """
        from gags_tpu.models.sam import preprocess_sam_image, resize_geometry

        h, w = image.shape[:2]
        if embed is None:
            batch, (nh, nw) = preprocess_sam_image(image, self.sam_cfg.image_size)
            embed = self._encode(jnp.asarray(batch))
        else:
            nh, nw = resize_geometry(h, w, self.sam_cfg.image_size)

        cfg = self.cfg
        n_pts = len(point_grid)
        pb = cfg.points_per_batch
        # prompt coords live in the resized-padded frame, normalised by size
        coords = point_grid * np.array([[nw, nh]]) / self.sam_cfg.image_size

        buckets: Dict[str, List[dict]] = {"default": [], "s": [], "m": [], "l": []}
        level_names = ["s", "m", "l"]

        def dispatch(start):
            """Enqueue one prompt batch's mask decode (async), so the host
            fetch + record-building of batch k overlaps the device decode
            of batch k+1."""
            pts = coords[start : start + pb]
            pad = pb - len(pts)
            pts_p = np.pad(pts, ((0, pad), (0, 0)))
            lbl = np.concatenate([np.ones(len(pts)), -np.ones(pad)])
            masks_lr, iou = self._decode(
                embed,
                jnp.asarray(pts_p[:, None, :], jnp.float32),
                jnp.asarray(lbl[:, None], jnp.int32),
            )
            return pts, masks_lr, iou

        def consume(pts, masks_lr, iou):
            # upscale low-res logits to the original frame in slices (the
            # full (B, 4, S, S) f32 upscale is ~4.3 GB at B=256, S=1024),
            # software-pipelined one slice deep: fetch slice j while the
            # device upscales j+1 (peak HBM = 2 slices' results + temps)
            mask_slices, stab_slices = [], []

            def fetch(pair):
                # stability on the fully-upscaled (h, w) logits — the same
                # frame stock AMG uses: its predict_torch returns
                # postprocess_masks output (256 -> model size -> crop ->
                # original) BEFORE calculate_stability_score runs, and
                # with crop_n_layers=0 (preprocess.py:234) the crop frame
                # IS the original image
                stab_slices.append(np.asarray(pair[0]))
                mask_slices.append(np.asarray(pair[1]))

            pend = None
            for s0 in range(0, masks_lr.shape[0], cfg.upscale_slice):
                ms = self._upscale(masks_lr[s0 : s0 + cfg.upscale_slice], nh, nw, h, w)
                cur = (
                    stability_score(ms, cfg.mask_threshold, cfg.stability_offset),
                    ms > cfg.mask_threshold,
                )
                if pend is not None:
                    fetch(pend)
                pend = cur
            fetch(pend)
            masks_np = np.concatenate(mask_slices, axis=0)
            stab_np = np.concatenate(stab_slices, axis=0)
            iou_np = np.asarray(iou)

            for i in range(len(pts)):
                # multimask channels 1..3 = subpart/part/whole; channel of
                # best score = the "default" pick
                cand = []
                for ch in range(1, 4):
                    rec = self._make_record(
                        masks_np[i, ch], float(iou_np[i, ch]), float(stab_np[i, ch])
                    )
                    if rec is not None:
                        cand.append((ch, rec))
                        if self._passes(rec):
                            buckets[level_names[ch - 1]].append(rec)
                if cand:
                    best = max(cand, key=lambda cr: cr[1]["predicted_iou"])[1]
                    if self._passes(best):
                        buckets["default"].append(best)

        pending = None
        for start in range(0, n_pts, pb):
            nxt = dispatch(start)
            if pending is not None:
                consume(*pending)
            pending = nxt
        if pending is not None:
            consume(*pending)

        out = []
        for k in ["default", "s", "m", "l"]:
            recs = buckets[k]
            if recs:
                boxes = np.array(
                    [
                        [r["bbox"][0], r["bbox"][1], r["bbox"][0] + r["bbox"][2], r["bbox"][1] + r["bbox"][3]]
                        for r in recs
                    ],
                    np.float32,
                )
                scores = np.array([r["predicted_iou"] for r in recs], np.float32)
                keep = box_nms(boxes, scores, cfg.box_nms_thresh)
                recs = [recs[i] for i in keep]
                # stock-AMG small-region cleanup: fill sub-100px holes and
                # drop sub-100px islands of KEPT masks (not just drop whole
                # small masks), then dedupe cleanup-created duplicates
                recs = postprocess_small_regions(
                    recs, cfg.min_mask_region_area, cfg.box_nms_thresh
                )
            out.append(recs)
        return tuple(out)

    def _make_record(self, seg: np.ndarray, iou: float, stab: float):
        area = int(seg.sum())
        if area < 1:  # empty after thresholding — nothing to record
            return None
        return dict(
            segmentation=seg,
            area=area,
            bbox=mask_to_box(seg),
            predicted_iou=iou,
            stability_score=stab,
        )

    def _passes(self, rec) -> bool:
        return (
            rec["predicted_iou"] >= self.cfg.pred_iou_thresh
            and rec["stability_score"] >= self.cfg.stability_score_thresh
        )
