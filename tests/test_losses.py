"""Loss / supervision parity vs straightforward numpy loop oracles."""

import numpy as np
import jax.numpy as jnp

from gags_tpu.gad import losses
from gags_tpu.gad.supervision import mixed_seg_map, blend_gt_feature_map
from gags_tpu.utils.image import (
    mean_smooth,
    resize_nearest,
    resize_bilinear_align_corners,
)


def _rand_seg(h, w, n_regions, seed=0, frac_invalid=0.2):
    rng = np.random.default_rng(seed)
    seg = rng.integers(0, n_regions, size=(h, w)).astype(np.int32)
    seg[rng.uniform(size=(h, w)) < frac_invalid] = -1
    return seg


def test_region_balanced_l1_matches_loop():
    h, w = 24, 32
    rng = np.random.default_rng(1)
    loss_map = rng.uniform(size=(h, w)).astype(np.float32)
    seg = _rand_seg(h, w, 7, seed=2)
    got = float(losses.region_balanced_l1(jnp.asarray(loss_map), jnp.asarray(seg), 64))
    vals = []
    for idx in np.unique(seg[seg != -1]):
        vals.append(loss_map[seg == idx].mean())
    np.testing.assert_allclose(got, np.mean(vals), rtol=1e-5)


def test_region_variance_loss_matches_loop():
    h, w, c = 16, 20, 5
    rng = np.random.default_rng(3)
    feat = rng.normal(size=(h, w, c)).astype(np.float32)
    seg = _rand_seg(h, w, 6, seed=4)
    got = float(losses.region_variance_loss(jnp.asarray(feat), jnp.asarray(seg), 64))
    total = 0.0
    for idx in np.unique(seg[seg != -1]):
        m = seg == idx
        n = int(m.sum())
        if n < 2:
            continue
        pix = feat[m]  # (n, c)
        var = pix.var(axis=0, ddof=1)  # unbiased like torch.var
        total += n * var.mean()
    np.testing.assert_allclose(got, total / (h * w), rtol=1e-4)


def test_entropy_loss():
    p = jnp.array([[[0.5, 0.25, 0.25]]])
    got = float(losses.scale_entropy_loss(p, eps=0.0))
    expect = -(0.5 * np.log(0.5) + 2 * 0.25 * np.log(0.25)) / 3
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_mean_smooth_matches_conv():
    rng = np.random.default_rng(5)
    img = rng.normal(size=(10, 12, 3)).astype(np.float32)
    got = np.asarray(mean_smooth(jnp.asarray(img), 5))
    pad = np.pad(img, ((2, 2), (2, 2), (0, 0)))
    expect = np.zeros_like(img)
    for y in range(10):
        for x in range(12):
            expect[y, x] = pad[y : y + 5, x : x + 5].sum((0, 1)) / 25.0
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_resize_nearest_matches_torch_semantics():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(6)
    img = rng.normal(size=(7, 9, 2)).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(img), (13, 5)))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    expect = F.interpolate(t, size=(13, 5), mode="nearest")[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_resize_bilinear_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(7)
    img = rng.normal(size=(8, 6, 4)).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(img), (15, 11)))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    expect = (
        F.interpolate(t, size=(15, 11), mode="bilinear", align_corners=True)[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_mixed_seg_map_picks_argmax_level():
    h, w = 6, 6
    seg = np.stack(
        [
            np.full((h, w), 9),
            np.full((h, w), 1),
            np.full((h, w), 2),
            np.full((h, w), 3),
        ],
        axis=-1,
    ).astype(np.int32)
    scale = np.zeros((h, w, 3), np.float32)
    scale[:3] = [1, 0, 0]  # top rows → s level
    scale[3:] = [0, 0, 1]  # bottom rows → l level
    out = np.asarray(mixed_seg_map(jnp.asarray(seg), jnp.asarray(scale)))
    # interior pixels away from the boundary keep their level despite smoothing
    assert (out[0] == 1).all()
    assert (out[5] == 3).all()


def test_blend_gt_feature_map_weights():
    h, w, d = 4, 4, 8
    rng = np.random.default_rng(8)
    embed = rng.normal(size=(10, d)).astype(np.float32)
    seg = np.stack(
        [
            np.zeros((h, w)),
            np.full((h, w), 2),
            np.full((h, w), 5),
            np.full((h, w), 7),
        ],
        -1,
    ).astype(np.int32)
    seg[0, 0, 1] = -1  # one invalid pixel at the s level
    scale = np.tile(np.array([0.2, 0.3, 0.5], np.float32), (h, w, 1))
    fmap, mask = blend_gt_feature_map(
        jnp.asarray(embed), jnp.asarray(seg), jnp.asarray(scale)
    )
    expect = 0.2 * embed[2] + 0.3 * embed[5] + 0.5 * embed[7]
    np.testing.assert_allclose(np.asarray(fmap[2, 2]), expect, rtol=1e-5)
    m = np.asarray(mask)[..., 0]
    assert not m[0, 0] and m[1, 1]


def test_blend_gt_feature_map_max_mode():
    h, w, d = 3, 3, 4
    embed = np.arange(24, dtype=np.float32).reshape(6, 4)
    seg = np.stack(
        [np.zeros((h, w)), np.full((h, w), 1), np.full((h, w), 3), np.full((h, w), 5)],
        -1,
    ).astype(np.int32)
    scale = np.tile(np.array([0.1, 0.7, 0.2], np.float32), (h, w, 1))
    fmap, mask = blend_gt_feature_map(
        jnp.asarray(embed), jnp.asarray(seg), jnp.asarray(scale), max_mode=True
    )
    np.testing.assert_allclose(np.asarray(fmap[1, 1]), embed[3], rtol=1e-6)


def test_blend_gt_feature_map_median_mode():
    """median_mode: every pixel of an s-level segment gets the segment's
    per-channel median scale weights, renormalised to sum 1
    (reference dataset_readers.py:90-118, torch lower-median semantics)."""
    h, w, d = 4, 6, 5
    rng = np.random.default_rng(3)
    embed = rng.normal(size=(8, d)).astype(np.float32)
    seg_s = np.array(
        [
            [0, 0, 0, 1, 1, 1],
            [0, 0, 0, 1, 1, 1],
            [2, 2, 2, 1, 1, 1],
            [2, 2, 2, -1, -1, -1],
        ],
        np.int32,
    )
    seg = np.stack(
        [np.zeros((h, w)), seg_s, np.full((h, w), 4), np.full((h, w), 6)], -1
    ).astype(np.int32)
    scale = rng.uniform(0.05, 1.0, size=(h, w, 3)).astype(np.float32)

    fmap, _ = blend_gt_feature_map(
        jnp.asarray(embed), jnp.asarray(seg), jnp.asarray(scale), median_mode=True
    )

    # numpy oracle: torch.median returns the LOWER middle for even counts
    def lower_median(a):
        a = np.sort(a)
        return a[(len(a) - 1) // 2]

    bal = scale.copy()
    for sid in [0, 1, 2]:
        m = seg_s == sid
        med = np.array([lower_median(scale[..., c][m]) for c in range(3)])
        med = med / med.sum()
        bal[m] = med
    # embeds: s-level uses seg_s, m-level id 4, l-level id 6 everywhere; -1
    # pixels wrap to the LAST row (reference python negative indexing,
    # dataset_readers.py:75 — golden-tested in test_reference_golden.py)
    fs = embed[seg_s % embed.shape[0]]
    expect = (
        fs * bal[..., 0:1] + embed[4] * bal[..., 1:2] + embed[6] * bal[..., 2:3]
    )
    np.testing.assert_allclose(np.asarray(fmap), expect, rtol=1e-5, atol=1e-6)
