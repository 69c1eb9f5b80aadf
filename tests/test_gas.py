"""GAS stage tests: NMS vs loop oracle, packing, prompts, depth sampling."""

import numpy as np
import jax.numpy as jnp

from gags_tpu.gas import masks as gm
from gags_tpu.gas import prompts as gp
from gags_tpu.gas.depth_sampler import (
    min_depth_over_cameras,
    project_points,
    splat_depth_samples,
)


def _rand_masks(n, h, w, seed):
    rng = np.random.default_rng(seed)
    out = np.zeros((n, h, w), bool)
    for i in range(n):
        y, x = rng.integers(0, h - 4), rng.integers(0, w - 4)
        hh, ww = rng.integers(3, h - y), rng.integers(3, w - x)
        out[i, y : y + hh, x : x + ww] = True
    return out


def _nms_oracle(masks, scores, iou_thr, score_thr, inner_thr):
    """Literal re-derivation of the reference's loop algorithm."""
    order = np.argsort(-scores, kind="stable")
    s, m = scores[order], masks[order]
    n = len(order)
    areas = m.reshape(n, -1).sum(1).astype(float)
    iou = np.zeros((n, n))
    inner = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            inter = np.logical_and(m[i], m[j]).sum()
            union = np.logical_or(m[i], m[j]).sum()
            iou[i, j] = inter / union if union else 0
            if inter / areas[i] < 0.5 and inter / areas[j] >= 0.85:
                inner[i, j] = 1 - (inter / areas[j]) * (inter / areas[i])
            if inter / areas[i] >= 0.85 and inter / areas[j] < 0.5:
                inner[j, i] = 1 - (inter / areas[j]) * (inter / areas[i])
    iou = np.triu(iou, 1)
    keep = iou.max(0) <= iou_thr
    keep_conf = s > score_thr
    kiu = np.triu(inner, 1).max(0) <= 1 - inner_thr
    kil = np.tril(inner, 1).max(0) <= 1 - inner_thr
    for k in (keep_conf, kiu, kil):
        if k.sum() == 0:
            k[np.argsort(-s)[:3]] = True
    keep = keep & keep_conf & kiu & kil
    return set(order[keep].tolist())


def test_mask_nms_matches_oracle():
    for seed in range(4):
        masks = _rand_masks(12, 24, 30, seed)
        rng = np.random.default_rng(100 + seed)
        scores = rng.uniform(0.5, 1.0, 12).astype(np.float32)
        got = set(gm.mask_nms(masks, scores, 0.8, 0.7, 0.5).tolist())
        expect = _nms_oracle(masks, scores, 0.8, 0.7, 0.5)
        assert got == expect, (seed, got, expect)


def test_pack_granularities_offsets():
    rng = np.random.default_rng(0)
    h, w = 8, 10
    embeds = {k: rng.normal(size=(n, 4)).astype(np.float32)
              for k, n in zip(["default", "s", "m", "l"], [3, 2, 4, 1])}
    segs = {
        "default": np.full((h, w), 2, np.int32),
        "s": np.full((h, w), 1, np.int32),
        "m": np.full((h, w), 3, np.int32),
        "l": np.zeros((h, w), np.int32),
    }
    segs["s"][0, 0] = -1
    embed, packed = gm.pack_granularities(embeds, segs)
    assert embed.shape == (10, 4)
    assert packed.shape == (4, h, w)
    assert packed[0, 3, 3] == 2          # level 0 unshifted
    assert packed[1, 3, 3] == 1 + 3      # + len(default)
    assert packed[1, 0, 0] == -1         # -1 preserved
    assert packed[2, 3, 3] == 3 + 5      # + len(default)+len(s)
    assert packed[3, 3, 3] == 0 + 9
    # ids index into the concatenated embedding correctly
    np.testing.assert_array_equal(embed[packed[2, 3, 3]], embeds["m"][3])


def test_pad_to_square_and_crops():
    img = np.zeros((6, 10, 3), np.uint8)
    img[:, :, 0] = 200
    sq = gm.pad_to_square(img)
    assert sq.shape == (10, 10, 3)
    assert (sq[2:8] == img).all()
    m = dict(segmentation=np.ones((6, 10), bool), bbox=(2, 1, 5, 4))
    crops = gm.extract_mask_crops([m], img, size=32)
    assert crops.shape == (1, 32, 32, 3)
    assert crops.max() <= 1.0 and crops.min() >= 0.0


def test_uniform_point_grid():
    pts = gp.build_point_grid(4)
    assert pts.shape == (16, 2)
    assert abs(pts[0, 0] - 1 / 8) < 1e-9
    assert abs(pts[-1, 1] - 7 / 8) < 1e-9


def test_mindepth_grid_ratio_rule():
    rng = np.random.default_rng(0)
    h, w = 64, 64
    depth = np.full((h, w), 8.0, np.float32)
    sample = np.zeros((h, w), np.float32)
    sample[::4, ::4] = 2.0  # min-hit depth 2 → ratio 4 → k = 16 per cell
    pts, boxes = gp.build_mindepth_point_grid(2, depth, sample, 4, rng)
    # 4 cells × min(16,20)^2 = 4*256
    assert pts.shape == (4 * 256, 2)
    assert (pts >= 0).all() and (pts <= 1).all()
    # empty sample map → ratio nan → 1 point per cell
    pts2, _ = gp.build_mindepth_point_grid(2, depth, np.zeros_like(sample), 4, rng)
    assert pts2.shape == (4, 2)


def test_project_points_occlusion():
    pts = jnp.array([[0.0, 0.0, 4.0], [0.0, 0.0, 6.0]])  # second occluded
    vm = jnp.eye(4)
    K = jnp.array([[50.0, 0, 32], [0, 50, 24], [0, 0, 1]])
    depth = jnp.full((48, 64), 4.0)
    u, v, vis, z = project_points(pts, vm, K, depth, 64, 48)
    assert bool(vis[0]) and not bool(vis[1])
    assert int(u[0]) == 32 and int(v[0]) == 24
    np.testing.assert_allclose(np.asarray(z), [4.0, 6.0], atol=1e-6)


def test_min_depth_and_splat():
    pts = jnp.array([[0.0, 0.0, 4.0], [0.5, 0.0, 5.0]])
    vm = jnp.eye(4)[None]
    K = jnp.array([[50.0, 0, 32], [0, 50, 24], [0, 0, 1]])[None]
    depth = jnp.stack([jnp.full((48, 64), 4.0)])
    depth = depth.at[0, 24, 37].set(5.0)  # make second point visible too
    mind, vis, uv = min_depth_over_cameras(pts, vm, K, depth)
    assert np.allclose(np.asarray(mind), [4.0, 5.0])
    m = splat_depth_samples(mind, vis[:, 0], uv[:, 0], 48, 64)
    assert float(m[24, 32]) == 4.0
    assert float(m[24, 37]) == 5.0
    assert float(np.asarray(m).sum()) == 9.0


def test_remove_small_regions_semantics():
    """Island/hole cleanup matches segment-anything remove_small_regions."""
    from gags_tpu.gas.generator import remove_small_regions

    m = np.zeros((30, 30), bool)
    m[5:25, 5:25] = True
    m[10:12, 10:12] = False  # 4-px hole -> filled under thresh 10
    m[0:2, 0:2] = True       # 4-px island -> removed

    out, ch = remove_small_regions(m, 10, "holes")
    assert ch and out[10:12, 10:12].all() and out[0:2, 0:2].all()
    out2, ch2 = remove_small_regions(out, 10, "islands")
    assert ch2 and not out2[0:2, 0:2].any() and out2[5:25, 5:25].all()

    # unchanged mask reports changed=False
    out3, ch3 = remove_small_regions(out2, 10, "holes")
    assert not ch3 and (out3 == out2).all()

    # a mask made ONLY of small islands keeps its largest island
    tiny = np.zeros((20, 20), bool)
    tiny[0:2, 0:2] = True   # area 4
    tiny[10:13, 10:12] = True  # area 6 (largest)
    out4, ch4 = remove_small_regions(tiny, 100, "islands")
    assert ch4 and out4.sum() == 6 and out4[10:13, 10:12].all()


def test_postprocess_small_regions_dedupes_to_unchanged():
    """Cleanup + NMS: modified masks that collapse onto an unchanged mask's
    box are dropped in its favour (stock postprocess_small_regions)."""
    from gags_tpu.gas.generator import mask_to_box, postprocess_small_regions

    base = np.zeros((40, 40), bool)
    base[10:30, 10:30] = True
    speckled = base.copy()
    speckled[0:2, 0:2] = True  # island that cleanup removes -> same box

    def rec(seg):
        return dict(segmentation=seg, area=int(seg.sum()),
                    bbox=mask_to_box(seg), predicted_iou=0.9,
                    stability_score=0.9)

    out = postprocess_small_regions([rec(speckled), rec(base)], 100, 0.7)
    assert len(out) == 1
    # the surviving record is the UNCHANGED one (score 1 beats 0)
    np.testing.assert_array_equal(out[0]["segmentation"], base)

    # masks with no small regions pass through untouched
    out2 = postprocess_small_regions([rec(base)], 100, 0.7)
    assert len(out2) == 1 and out2[0]["segmentation"] is base


def test_pcd_prompt_modes():
    """sample_from_pcd / project_from_sampled_pcd (SAM_utils.py:368-388)."""
    from gags_tpu.gas.prompts import project_from_sampled_pcd, sample_from_pcd

    rng = np.random.default_rng(0)
    n_pts, n_img = 50, 3
    depth = rng.uniform(1, 10, n_pts)
    mask = rng.random((n_pts, n_img)) < 0.4
    mask[10] = False  # a point with no hits must never be sampled
    ids = sample_from_pcd(depth, mask, sample_num=200, rng=rng)
    assert ids == sorted(set(ids))
    assert 10 not in ids
    assert all(mask[i].any() for i in ids)

    # projection: (row, col) mapping -> normalised (x, y)
    h, w = 40, 60
    mapping = np.stack(
        [rng.integers(0, h, (n_pts,)), rng.integers(0, w, (n_pts,))], -1
    )
    vis = np.zeros(n_pts, bool)
    vis[[2, 5]] = True
    layers = project_from_sampled_pcd(vis, mapping, n_layers=1, h=h, w=w)
    assert len(layers) == 2 and layers[0].shape == (2, 2)
    np.testing.assert_allclose(layers[0][0], [mapping[2, 1] / w, mapping[2, 0] / h])
    assert (layers[0] >= 0).all() and (layers[0] <= 1).all()


def test_pack_granularities_missing_level_keeps_4_channels():
    """An empty granularity bucket (all masks failed thresholds/NMS) must
    still produce the (4, H, W) contract with an all -1 channel — the
    downstream seg_map[..., 1:4] reads [s, m, l] by POSITION."""
    rng = np.random.default_rng(0)
    h, w = 6, 8
    embeds = {k: rng.normal(size=(3, 4)).astype(np.float32)
              for k in ("default", "m", "l")}  # 's' missing
    segs = {k: rng.integers(-1, 3, size=(h, w)).astype(np.float32)
            for k in ("default", "m", "l")}
    embed, packed = gm.pack_granularities(embeds, segs)
    assert packed.shape == (4, h, w)
    assert (packed[1] == -1).all()  # missing 's' level
    assert embed.shape == (9, 4)
    # offsets: 'm' ids start after default+ (no s), 'l' after m
    m_ids = packed[2][packed[2] != -1]
    if m_ids.size:
        assert m_ids.min() >= 3
