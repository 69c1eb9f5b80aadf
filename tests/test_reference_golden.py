"""Golden parity tests against the REFERENCE's own torch implementations.

Unlike the independently-written numpy oracles elsewhere in tests/, these
import `/root/reference`'s actual functions (pure torch/numpy, runnable on
CPU) and compare our JAX counterparts on small random fixtures — catching
any shared misreading of the reference:

  * `read_sam_clip_feature`   (scene/dataset_readers.py:54-121)
  * `Scale_balance_loss`      (utils/loss_utils.py:32-57, mix_seg=True)
  * `scale_regulation_loss`   (utils/loss_utils.py:59-66)
  * `scale_region_regulation_loss` (utils/loss_utils.py:103-136, mix_seg)
  * `get_trained_seg`         (utils/loss_utils.py:138-154)
  * `mask_nms`                (preprocess.py:380-447)

Unavailable reference deps (simple_knn CUDA ext, segment_anything,
open_clip, plyfile) are stubbed into sys.modules before import — none of
the functions under test touch them.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with unavailable deps stubbed."""
    import os

    if not os.path.isdir(REF):
        pytest.skip(f"reference checkout not present at {REF}")
    _stub("simple_knn")
    _stub("simple_knn._C", distCUDA2=lambda *a, **k: None)
    _stub("plyfile", PlyData=object, PlyElement=object)
    _stub("open_clip", create_model_and_transforms=None, tokenizer=None)
    sam = _stub(
        "segment_anything",
        SamAutomaticMaskGenerator=object,
        sam_model_registry={},
    )
    sam.__path__ = []  # mark as package for submodule stubs
    _stub("segment_anything.utils")
    _stub(
        "segment_anything.utils.amg",
        batched_mask_to_box=None,
        calculate_stability_score=None,
    )
    tv = _stub("torchvision", transforms=None)
    tv.__path__ = []
    _stub("torchvision.transforms", Compose=None, Resize=None, ToTensor=None,
          Normalize=None)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    loss_utils = importlib.import_module("utils.loss_utils")
    dataset_readers = importlib.import_module("scene.dataset_readers")

    # preprocess.py imports SAM/open_clip symbols at top level; pull just
    # mask_nms out by executing its source with the stubs in place
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_preprocess", f"{REF}/preprocess.py"
    )
    preprocess = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(preprocess)
    return types.SimpleNamespace(
        loss_utils=loss_utils,
        read_sam_clip_feature=dataset_readers.read_sam_clip_feature,
        mask_nms=preprocess.mask_nms,
    )


def _fixture_maps(rng, h=24, w=32, n_embed=12, d=8, hs=None, ws=None):
    """Random (img_embed, seg_map(4,h,w), scale_map(3,hs,ws)) fixture."""
    hs = hs or h
    ws = ws or w
    img_embed = rng.standard_normal((n_embed, d)).astype(np.float32)
    seg = rng.integers(-1, n_embed, size=(4, h, w)).astype(np.float32)
    logits = rng.standard_normal((3, hs, ws)).astype(np.float32)
    e = np.exp(logits - logits.max(0, keepdims=True))
    scale = (e / e.sum(0, keepdims=True)).astype(np.float32)
    return img_embed, seg, scale


@pytest.mark.parametrize("same_res", [True, False])
@pytest.mark.parametrize("mode", ["default", "max", "median"])
def test_blend_gt_feature_map_golden(ref, mode, same_res):
    from gags_tpu.gad.supervision import blend_gt_feature_map
    import jax.numpy as jnp

    rng = np.random.default_rng(0 if same_res else 1)
    hs, ws = (24, 32) if same_res else (16, 20)
    img_embed, seg, scale = _fixture_maps(rng, hs=hs, ws=ws)
    if mode == "median":
        # the reference's median loop assumes the s-level ids present are
        # a contiguous [min, max] range; make ids non-negative for parity
        seg = np.abs(seg)

    t_feat, t_mask = ref.read_sam_clip_feature(
        torch.from_numpy(img_embed),
        torch.from_numpy(seg),
        torch.from_numpy(scale),
        max_mode=(mode == "max"),
        median_mode=(mode == "median"),
    )
    t_feat = t_feat.numpy().transpose(1, 2, 0)  # (c, hs, ws) -> (hs, ws, c)

    j_feat, j_mask = blend_gt_feature_map(
        jnp.asarray(img_embed),
        jnp.asarray(seg.transpose(1, 2, 0).astype(np.int32)),
        jnp.asarray(scale.transpose(1, 2, 0)),
        max_mode=(mode == "max"),
        median_mode=(mode == "median"),
    )
    j_feat = np.asarray(j_feat)

    valid = np.asarray(j_mask)[..., 0].astype(bool)
    # compare under the validity mask (outside it, -1 ids gather
    # img_embed[-1] in torch vs clamped row 0 here — both discarded)
    np.testing.assert_allclose(
        j_feat[valid], t_feat[valid], rtol=2e-5, atol=2e-5
    )
    t_mask_np = t_mask.numpy().astype(bool)
    if t_mask_np.ndim == 3:
        t_mask_np = t_mask_np[0]
    if mode != "max":  # max_mode masks differ only at exact-zero features
        np.testing.assert_array_equal(valid, t_mask_np)


def test_region_balanced_l1_golden(ref):
    from gags_tpu.gad.losses import region_balanced_l1
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    h, w, s = 20, 28, 9
    loss_map = rng.random((h, w)).astype(np.float32)
    seg = rng.integers(-1, s, size=(h, w)).astype(np.int64)

    t = ref.loss_utils.Scale_balance_loss(
        torch.from_numpy(loss_map), torch.from_numpy(seg), mask=None, mix_seg=True
    ).item()
    j = float(
        region_balanced_l1(
            jnp.asarray(loss_map), jnp.asarray(seg.astype(np.int32)), max_segments=s
        )
    )
    assert abs(t - j) < 1e-5


def test_scale_entropy_golden(ref):
    from gags_tpu.gad.losses import scale_entropy_loss
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    sm = rng.random((3, 10, 12)).astype(np.float32)
    t = ref.loss_utils.scale_regulation_loss(torch.from_numpy(sm)).item()
    j = float(scale_entropy_loss(jnp.asarray(sm.transpose(1, 2, 0))))
    assert abs(t - j) < 1e-6


def test_region_variance_golden(ref):
    from gags_tpu.gad.losses import region_variance_loss
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    h, w, s = 18, 22, 7
    feat = rng.standard_normal((3, h, w)).astype(np.float32)
    seg = rng.integers(-1, s, size=(h, w)).astype(np.int64)

    t = ref.loss_utils.scale_region_regulation_loss(
        torch.from_numpy(feat), torch.from_numpy(seg), mix_seg=True
    ).item()
    j = float(
        region_variance_loss(
            jnp.asarray(feat.transpose(1, 2, 0)),
            jnp.asarray(seg.astype(np.int32)),
            max_segments=s,
        )
    )
    assert abs(t - j) < 1e-5


def test_mixed_seg_map_golden(ref):
    from gags_tpu.gad.supervision import mixed_seg_map
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    h, w = 26, 30
    seg = rng.integers(-1, 11, size=(4, h, w)).astype(np.float32)
    logits = rng.standard_normal((3, h, w)).astype(np.float32)
    e = np.exp(logits - logits.max(0, keepdims=True))
    scale = (e / e.sum(0, keepdims=True)).astype(np.float32)

    t = ref.loss_utils.get_trained_seg(
        torch.from_numpy(seg), torch.from_numpy(scale)
    ).numpy()
    j = np.asarray(
        mixed_seg_map(
            jnp.asarray(seg.transpose(1, 2, 0).astype(np.int32)),
            jnp.asarray(scale.transpose(1, 2, 0)),
        )
    )
    # argmax ties between float conv results may differ at ulp level;
    # smoothed maps from random softmaxes have no exact ties in practice
    np.testing.assert_array_equal(j.astype(np.float32), t)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mask_nms_golden(ref, seed):
    from gags_tpu.gas.masks import mask_nms

    rng = np.random.default_rng(seed)
    n, h, w = 14, 20, 24
    masks = np.zeros((n, h, w), bool)
    for i in range(n):
        # random rectangles (some nested/overlapping)
        y0, x0 = rng.integers(0, h - 4), rng.integers(0, w - 4)
        y1 = rng.integers(y0 + 2, min(h, y0 + 14) + 1)
        x1 = rng.integers(x0 + 2, min(w, x0 + 14) + 1)
        masks[i, y0:y1, x0:x1] = True
    scores = rng.random(n).astype(np.float32)

    # reference thresholds as called at preprocess.py:471, PLUS a low
    # inner_thr: at 0.3 a double-written inner value (each pair hit from
    # both (i,j) and (j,i) — the bug the triu restriction fixes) flips
    # keep decisions that 0.5 cannot distinguish
    for inner_thr in (0.5, 0.3):
        t_idx = ref.mask_nms(
            torch.from_numpy(masks), torch.from_numpy(scores),
            iou_thr=0.8, score_thr=0.7, inner_thr=inner_thr,
        )
        t_idx = np.sort(np.asarray(t_idx).reshape(-1))
        j_idx = np.sort(mask_nms(masks, scores, iou_thr=0.8, score_thr=0.7,
                                 inner_thr=inner_thr))
        np.testing.assert_array_equal(t_idx, j_idx, err_msg=f"inner_thr={inner_thr}")
