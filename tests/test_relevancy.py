"""Relevancy math + eval post-processing parity tests."""

import numpy as np
import jax.numpy as jnp

from gags_tpu.query import (
    relevancy,
    max_across_levels,
    box_filter_reflect101,
    heatmap_to_mask,
    majority_smooth,
)
from gags_tpu.query.relevancy import iou


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _pairwise_softmax_oracle(embeds, pos, neg):
    """Literal pairwise-softmax-min-over-negatives, the long way."""
    sims_p = embeds @ pos.T  # (n, P)
    sims_n = embeds @ neg.T  # (n, N)
    out = np.zeros_like(sims_p)
    for k in range(pos.shape[0]):
        probs = []
        for j in range(neg.shape[0]):
            z = np.stack([sims_p[:, k], sims_n[:, j]], -1) * 10.0
            e = np.exp(z - z.max(-1, keepdims=True))
            sm = e / e.sum(-1, keepdims=True)
            probs.append(sm[:, 0])
        out[:, k] = np.min(np.stack(probs, -1), -1)
    return out


def test_relevancy_matches_pairwise_softmax():
    rng = np.random.default_rng(0)
    embeds = _unit(rng.normal(size=(100, 32)).astype(np.float32))
    pos = _unit(rng.normal(size=(3, 32)).astype(np.float32))
    neg = _unit(rng.normal(size=(4, 32)).astype(np.float32))
    got = np.asarray(relevancy(jnp.asarray(embeds), jnp.asarray(pos), jnp.asarray(neg)))
    expect = _pairwise_softmax_oracle(embeds, pos, neg)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_max_across_levels_shape():
    rng = np.random.default_rng(1)
    sem = jnp.asarray(rng.normal(size=(2, 8, 10, 16)).astype(np.float32))
    pos = jnp.asarray(_unit(rng.normal(size=(5, 16)).astype(np.float32)))
    neg = jnp.asarray(_unit(rng.normal(size=(4, 16)).astype(np.float32)))
    out = max_across_levels(sem, pos, neg)
    assert out.shape == (2, 5, 8, 10)


def test_box_filter_matches_scipy_mirror():
    from scipy import ndimage

    rng = np.random.default_rng(2)
    img = rng.normal(size=(50, 64)).astype(np.float32)
    k = 30
    got = np.asarray(box_filter_reflect101(jnp.asarray(img), k))
    kernel = np.ones((k, k), np.float32) / (k * k)
    expect = ndimage.correlate(img, kernel, mode="mirror")
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_box_filter_constant_preserved():
    img = jnp.full((40, 40), 2.5)
    out = np.asarray(box_filter_reflect101(img, 30))
    np.testing.assert_allclose(out, 2.5, rtol=1e-6)


def test_heatmap_to_mask_range():
    rng = np.random.default_rng(3)
    rel = jnp.asarray(rng.uniform(0.4, 0.6, size=(60, 80)).astype(np.float32))
    mask, vm = heatmap_to_mask(rel, 0.4)
    m = np.asarray(mask)
    assert m.dtype == np.uint8 and set(np.unique(m)) <= {0, 1}


def test_majority_smooth_matches_reference_loops():
    rng = np.random.default_rng(4)
    mask = (rng.uniform(size=(20, 24)) > 0.5).astype(np.uint8)
    got = np.asarray(majority_smooth(jnp.asarray(mask)))

    h, w = mask.shape
    expect = mask.copy()
    scale = 3
    for i in range(h):
        for j in range(w):
            sq = mask[
                max(0, i - scale) : min(i + scale + 1, h - 1),
                max(0, j - scale) : min(j + scale + 1, w - 1),
            ]
            expect[i, j] = np.argmax(np.bincount(sq.reshape(-1)))
    np.testing.assert_array_equal(got, expect)


def test_iou():
    a = np.zeros((4, 4), bool)
    b = np.zeros((4, 4), bool)
    a[:2] = True
    b[1:3] = True
    assert iou(a, b) == 4 / 12
