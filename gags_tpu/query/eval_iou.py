"""Open-vocabulary IoU + localization evaluation (LERF-OVS protocol).

Counterpart of the reference `evaluate_iou_loc.py`:
  * labelme-style GT jsons per eval frame → per-label merged masks + bboxes
    (eval_gt_lerfdata, lines 49-90), polygon fill via PIL (the reference
    uses cv2.fillPoly);
  * per prompt: relevancy map → 30x30 box-filter average → min/max
    normalise → threshold (0.4 in eval.sh) → majority smooth → IoU
    (activate_stream, lines 93-176);
  * localization: every argmax coordinate of the box-filtered relevancy
    tested against the GT bboxes (lerf_localization, lines 179-226).
"""

from __future__ import annotations

import glob
import json
import os
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np
from PIL import Image, ImageDraw

import jax.numpy as jnp

from gags_tpu.query.relevancy import (
    box_filter_reflect101,
    heatmap_to_mask,
    majority_smooth,
    max_across_levels,
    iou,
)


def polygon_to_mask(img_shape: Tuple[int, int], points) -> np.ndarray:
    """Rasterise a polygon to a binary mask (cv2.fillPoly parity is
    pixel-centre fill; PIL's polygon fill matches to within the boundary
    pixel convention)."""
    img = Image.new("L", (img_shape[1], img_shape[0]), 0)
    pts = [(float(x), float(y)) for x, y in np.asarray(points, np.float64)]
    ImageDraw.Draw(img).polygon(pts, outline=1, fill=1)
    return np.asarray(img, np.uint8)


def load_lerf_gt(json_folder: str) -> Tuple[Dict, Tuple[int, int], List[str]]:
    """Parse frame_*.json labelme annotations → {frame_idx: {label:
    {'bboxes': (k,4), 'mask': (H,W)}}} (reference eval_gt_lerfdata)."""
    gt_paths = sorted(glob.glob(os.path.join(json_folder, "frame_*.json")))
    img_paths = sorted(glob.glob(os.path.join(json_folder, "frame_*.jpg")))
    gt_ann = {}
    h = w = 0
    for path in gt_paths:
        with open(path) as f:
            data = json.load(f)
        h, w = data["info"]["height"], data["info"]["width"]
        idx = int(data["info"]["name"].split("_")[-1].split(".jpg")[0]) - 1
        ann = defaultdict(dict)
        for obj in data["objects"]:
            label = obj["category"]
            box = np.asarray(obj["bbox"]).reshape(-1)
            mask = polygon_to_mask((h, w), obj["segmentation"])
            if ann[label].get("mask") is not None:
                prev = ann[label]["mask"]
                merged = prev.copy()
                merged[mask != 0] = 1
                mask = merged
                ann[label]["bboxes"] = np.concatenate(
                    [ann[label]["bboxes"].reshape(-1, 4), box.reshape(-1, 4)], axis=0
                )
            else:
                ann[label]["bboxes"] = box
            ann[label]["mask"] = mask
        gt_ann[str(idx)] = dict(ann)
    return gt_ann, (h, w), img_paths


def eval_frame_iou(
    decoded: np.ndarray,  # (H, W, D) CLIP-space feature map
    pos_embeds: np.ndarray,  # (P, D) one per prompt (order = labels)
    neg_embeds: np.ndarray,
    img_ann: Dict,
    labels: List[str],
    thresh: float = 0.4,
) -> List[float]:
    """Per-prompt IoU for one frame."""
    rel = max_across_levels(
        jnp.asarray(decoded)[None], jnp.asarray(pos_embeds), jnp.asarray(neg_embeds)
    )[0]
    ious = []
    for k, label in enumerate(labels):
        mask_pred, _ = heatmap_to_mask(rel[k], thresh)
        mask_pred = np.asarray(majority_smooth(mask_pred))
        ious.append(iou(img_ann[label]["mask"].astype(bool), mask_pred.astype(bool)))
    return ious


def eval_frame_localization(
    decoded: np.ndarray,
    pos_embeds: np.ndarray,
    neg_embeds: np.ndarray,
    img_ann: Dict,
    labels: List[str],
) -> int:
    """Number of prompts whose filtered-relevancy argmax falls in a GT bbox."""
    rel = max_across_levels(
        jnp.asarray(decoded)[None], jnp.asarray(pos_embeds), jnp.asarray(neg_embeds)
    )[0]
    acc = 0
    for k, label in enumerate(labels):
        filt = np.asarray(box_filter_reflect101(rel[k], 30))
        score = filt.max()
        ys, xs = np.nonzero(filt == score)
        coords = np.stack([xs, ys], -1)
        hit = False
        for box in np.asarray(img_ann[label]["bboxes"]).reshape(-1, 4):
            x1, y1, x2, y2 = box
            x_min, x_max = min(x1, x2), max(x1, x2)
            y_min, y_max = min(y1, y2), max(y1, y2)
            for cx, cy in coords:
                if x_min <= cx <= x_max and y_min <= cy <= y_max:
                    acc += 1
                    hit = True
                    break
            if hit:
                break
    return acc
