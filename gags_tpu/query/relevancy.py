"""Open-vocabulary relevancy math, fully vectorised.

Counterpart of the reference's OpenCLIP relevancy stack
(`eval/openclip_encoder.py:42-56,96-112`, `preprocess.py:97-108`) and the
eval-side heat-map post-processing (`evaluate_iou_loc.py:108-148`).

Key simplification (exact, not approximate): the reference computes, per
negative, softmax(10*[sim_pos, sim_neg]) and keeps the pair with the lowest
positive probability. That pairwise softmax is sigmoid(10*(sim_pos -
sim_neg)), monotone decreasing in sim_neg — so the minimum over negatives
is simply sigmoid(10*(sim_pos - max_neg)). One matmul + one sigmoid instead
of the reference's stack/gather dance.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_NEGATIVES = ("object", "things", "stuff", "texture")
TEMPERATURE = 10.0


def relevancy(
    embeds: jnp.ndarray,  # (..., D) image features (need not be unit norm)
    pos_embeds: jnp.ndarray,  # (P, D) unit-norm text embeddings
    neg_embeds: jnp.ndarray,  # (N, D) unit-norm negative embeddings
) -> jnp.ndarray:
    """Returns (..., P) positive-probability maps in [0, 1]."""
    sim_pos = embeds @ pos_embeds.T  # (..., P)
    sim_neg = embeds @ neg_embeds.T  # (..., N)
    worst_neg = jnp.max(sim_neg, axis=-1, keepdims=True)  # (..., 1)
    return jax.nn.sigmoid(TEMPERATURE * (sim_pos - worst_neg))


def max_across_levels(
    sem_map: jnp.ndarray,  # (L, H, W, D)
    pos_embeds: jnp.ndarray,
    neg_embeds: jnp.ndarray,
) -> jnp.ndarray:
    """(L, P, H, W) relevancy volume (reference get_max_across layout)."""
    rel = relevancy(sem_map, pos_embeds, neg_embeds)  # (L, H, W, P)
    return jnp.transpose(rel, (0, 3, 1, 2))


def box_filter_reflect101(img: jnp.ndarray, k: int = 30) -> jnp.ndarray:
    """k x k mean filter with OpenCV's default border (BORDER_REFLECT_101)
    and anchor (k//2, k//2) — matches `cv2.filter2D(np.ones((k,k))/k^2)` as
    used at evaluate_iou_loc.py:110-114. (H, W) input."""
    ay = k // 2
    pad_before, pad_after = ay, k - 1 - ay
    x = jnp.pad(img, ((pad_before, pad_after), (pad_before, pad_after)), mode="reflect")
    ix = jnp.pad(jnp.cumsum(x, 0), ((1, 0), (0, 0)))
    x = ix[k:] - ix[:-k]
    iy = jnp.pad(jnp.cumsum(x, 1), ((0, 0), (1, 0)))
    x = iy[:, k:] - iy[:, :-k]
    return x / (k * k)


def heatmap_to_mask(
    rel: jnp.ndarray, thresh: float, k: int = 30
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The eval thresholding chain (evaluate_iou_loc.py:110-147):

    vm = 0.5*(boxfilter(rel) + rel); normalise to [-1, 1] via min/max; clip
    to [0, 1]; threshold. Returns (mask_pred uint8 before majority smooth,
    vm the averaged heat map).
    """
    vm = 0.5 * (box_filter_reflect101(rel, k) + rel)
    out = vm - jnp.min(vm)
    out = out / (jnp.max(out) + 1e-9)
    out = out * 2.0 - 1.0
    out = jnp.clip(out, 0.0, 1.0)
    return (out > thresh).astype(jnp.uint8), vm


def majority_smooth(mask: jnp.ndarray, scale: int = 3) -> jnp.ndarray:
    """Majority vote over a (2*scale+1)^2 window, replicating the reference's
    exact window clipping (eval/utils.py:55-64 — note its upper bounds are
    min(i+scale+1, h-1), which EXCLUDES the last row/column at the border;
    we reproduce that quirk for metric parity)."""
    h, w = mask.shape
    m = mask.astype(jnp.float32)
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(m, 0), 1), ((1, 0), (1, 0)))  # (h+1, w+1)

    yy = jnp.arange(h)
    xx = jnp.arange(w)
    y0 = jnp.maximum(0, yy - scale)
    y1 = jnp.minimum(yy + scale + 1, h - 1)
    x0 = jnp.maximum(0, xx - scale)
    x1 = jnp.minimum(xx + scale + 1, w - 1)
    y1 = jnp.maximum(y1, y0)  # degenerate guard (h-1 quirk at the last row)
    x1 = jnp.maximum(x1, x0)

    ones = (
        ii[y1[:, None], x1[None, :]]
        - ii[y0[:, None], x1[None, :]]
        - ii[y1[:, None], x0[None, :]]
        + ii[y0[:, None], x0[None, :]]
    )
    total = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    # bincount-argmax tie-breaks toward 0 → ones win only on strict majority
    return (2 * ones > total).astype(jnp.uint8)


def iou(mask_pred, mask_gt) -> float:
    import numpy as np

    inter = np.logical_and(mask_gt, mask_pred).sum()
    union = np.logical_or(mask_gt, mask_pred).sum()
    return float(inter) / float(union) if union else 0.0
