"""SAM architecture + mask generator tests on tiny configs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gags_tpu.models.sam import SAM, SAMConfig, preprocess_sam_image
from gags_tpu.gas.generator import (
    AutomaticMaskGenerator,
    GeneratorConfig,
    box_nms,
    mask_to_box,
    stability_score,
)

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = SAMConfig.tiny()
    model = SAM(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    pts = jnp.zeros((2, 1, 2))
    lbl = jnp.ones((2, 1), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, pts, lbl)
    return cfg, model, params


def test_sam_shapes(tiny_sam):
    cfg, model, params = tiny_sam
    g = cfg.grid
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    emb = model.apply(params, img, method="encode_image")
    assert emb.shape == (1, g, g, cfg.prompt_dim)
    pts = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (3, 1, 2)), jnp.float32)
    lbl = jnp.ones((3, 1), jnp.int32)
    masks, iou = model.apply(params, emb, pts, lbl, method="decode")
    assert masks.shape == (3, 4, 4 * g, 4 * g)
    assert iou.shape == (3, 4)
    assert np.isfinite(np.asarray(masks)).all()


def test_prompt_position_changes_masks(tiny_sam):
    cfg, model, params = tiny_sam
    img = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    emb = model.apply(params, img, method="encode_image")
    p1 = jnp.array([[[0.2, 0.2]]])
    p2 = jnp.array([[[0.8, 0.8]]])
    l = jnp.ones((1, 1), jnp.int32)
    m1, _ = model.apply(params, emb, p1, l, method="decode")
    m2, _ = model.apply(params, emb, p2, l, method="decode")
    assert float(jnp.abs(m1 - m2).max()) > 1e-6


def test_preprocess_sam_image():
    img = np.full((50, 100, 3), 128, np.uint8)
    out, (nh, nw) = preprocess_sam_image(img, 64)
    assert out.shape == (1, 64, 64, 3)
    assert (nh, nw) == (32, 64)
    assert abs(out[0, 40, 0, 0]) < 1e-6  # padded region is zero


def test_stability_score():
    logits = jnp.array([[[3.0, 0.5], [0.5, -3.0]]])  # thresh 0, offset 1
    s = stability_score(logits, 0.0, 1.0)
    # >1: one pixel; >-1: three pixels → 1/3
    np.testing.assert_allclose(np.asarray(s), [1 / 3], rtol=1e-6)


def test_mask_to_box_and_nms():
    m = np.zeros((10, 10), bool)
    m[2:5, 3:8] = True
    assert mask_to_box(m) == (3, 2, 5, 3)
    boxes = np.array([[0, 0, 10, 10], [1, 1, 9, 9], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = box_nms(boxes, scores, 0.5)
    assert keep == [0, 2]


def test_generator_end_to_end(tiny_sam):
    cfg, model, params = tiny_sam
    gen = AutomaticMaskGenerator(
        model, params, cfg,
        GeneratorConfig(points_per_batch=8, pred_iou_thresh=-10.0,
                        stability_score_thresh=-1.0, min_mask_region_area=0),
    )
    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, (48, 64, 3), np.uint8)
    grid = rng.uniform(0.1, 0.9, (6, 2))
    d, s, m, l = gen.generate(image, grid)
    # with thresholds disabled every prompt yields records in some bucket
    assert len(d) > 0
    for rec in d + s + m + l:
        assert rec["segmentation"].shape == (48, 64)
        assert rec["area"] == int(rec["segmentation"].sum())


def test_blocked_rel_attention_matches_naive():
    """The flash-style blocked global attention must equal the naive
    materialised attention (same rel-pos decomposition, online softmax)."""
    import jax.numpy as jnp
    from gags_tpu.models.sam import _blocked_rel_attention, _rel_pos_bias

    rng = np.random.default_rng(0)
    b, n, h, w, hd = 1, 2, 16, 16, 8
    hw = h * w
    q = jnp.asarray(rng.normal(size=(b, n, hw, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, hw, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, hw, hd)).astype(np.float32))
    rel_h = jnp.asarray(rng.normal(size=(2 * h - 1, hd)).astype(np.float32))
    rel_w = jnp.asarray(rng.normal(size=(2 * w - 1, hd)).astype(np.float32))
    rh = _rel_pos_bias(h, h, rel_h)
    rw = _rel_pos_bias(w, w, rel_w)
    scale = 1.0 / np.sqrt(hd)

    # naive reference (the pre-flash formulation)
    att = (q * scale) @ k.transpose(0, 1, 3, 2)
    qr = q.reshape(b, n, h, w, hd)
    bias_h = jnp.einsum("bnhwc,hkc->bnhwk", qr, rh)
    bias_w = jnp.einsum("bnhwc,wkc->bnhwk", qr, rw)
    att = att.reshape(b, n, h, w, h, w) + bias_h[..., :, None] + bias_w[..., None, :]
    att = jax.nn.softmax(att.reshape(b, n, hw, hw), axis=-1)
    ref = att @ v

    out = _blocked_rel_attention(q, k * scale, v, rh, rw, h, w, row_block=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_generate_with_precomputed_embed_matches(tiny_sam):
    """encode_images + generate(embed=...) must equal the single-image
    path exactly (same encoder program, geometry recomputed from shape);
    the pad_to repeat must not leak padded embeddings."""
    cfg, model, params = tiny_sam
    gen = AutomaticMaskGenerator(
        model, params, cfg,
        GeneratorConfig(points_per_batch=8, pred_iou_thresh=-10.0,
                        stability_score_thresh=-1.0, min_mask_region_area=0),
    )
    rng = np.random.default_rng(5)
    images = [
        rng.integers(0, 255, (48, 64, 3), np.uint8) for _ in range(3)
    ]
    grid = rng.uniform(0.1, 0.9, (4, 2))
    embeds = gen.encode_images(images, pad_to=4)
    assert len(embeds) == 3
    for img, emb in zip(images, embeds):
        base = gen.generate(img, grid)
        fast = gen.generate(img, grid, embed=emb)
        for lb, lf in zip(base, fast):
            assert len(lb) == len(lf)
            for rb, rf in zip(lb, lf):
                assert np.array_equal(rb["segmentation"], rf["segmentation"])
                assert rb["predicted_iou"] == rf["predicted_iou"]
