"""Converters vs the REAL checkpoint key inventories.

The parity tests elsewhere run converters on replicas whose key sets the
tests themselves generate — naming drift vs the real files would survive
them. Here each converter consumes a state dict with the EXACT key
inventory of the real checkpoints (sam_vit_h_4b8939.pth, OpenCLIP ViT-B-16,
AlphaCLIP ViT-L/14@336 — reference preprocess.py:526,52-60), and the result
is shape-diffed against the model's own init tree via jax.eval_shape.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gags_tpu.models import ckpt_inventory as inv
from gags_tpu.models.clip import (
    CLIP,
    CLIPConfig,
    VisionTowerAlpha,
    load_alphaclip_state_dict,
    load_openclip_state_dict,
)
from gags_tpu.models.sam import SAM, SAMConfig
from gags_tpu.models.sam_weights import load_sam_state_dict


def _shapes_of_tree(tree):
    return {
        jax.tree_util.keystr(k): tuple(v.shape)
        for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


@pytest.mark.parametrize("name", ["vit_b", "vit_h"])
def test_sam_converter_consumes_real_inventory(name):
    cfg = getattr(SAMConfig, name)()
    inventory = inv.sam_inventory(cfg)
    # zeros: np views keep the (2.5 GB at ViT-H) dict cheap — the converter
    # only transposes/reshapes, so key/shape handling is fully exercised
    sd = inv.TrackingDict(
        {k: np.zeros(s, np.float32) for k, s in inventory.items()}
    )
    conv = load_sam_state_dict(sd, cfg)

    leftover = inv.unread_keys(sd, allowed_prefixes=inv.SAM_UNUSED_KEYS)
    assert leftover == [], f"converter ignored real keys: {leftover[:8]}"

    model = SAM(cfg)
    img = jax.ShapeDtypeStruct((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    pts = jax.ShapeDtypeStruct((2, 1, 2), jnp.float32)
    lbl = jax.ShapeDtypeStruct((2, 1), jnp.int32)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, pts, lbl)
    problems = inv.diff_shapes(_shapes_of_tree(conv), _shapes_of_tree(ref))
    assert problems == [], problems[:8]


def test_sam_vit_h_inventory_matches_published_stats():
    """Sanity-pin the ViT-H inventory against known facts of the real file:
    parameter count ~636M and the documented oddly-shaped entries."""
    iv = inv.sam_inventory(SAMConfig.vit_h())
    n_params = sum(int(np.prod(s)) for s in iv.values())
    assert 630e6 < n_params < 650e6, n_params
    assert iv["image_encoder.pos_embed"] == (1, 64, 64, 1280)
    assert iv["image_encoder.blocks.7.attn.rel_pos_h"] == (127, 80)  # global
    assert iv["image_encoder.blocks.0.attn.rel_pos_h"] == (27, 80)  # window
    assert iv["mask_decoder.mask_tokens.weight"] == (4, 256)


def test_openclip_converter_consumes_real_inventory():
    cfg = CLIPConfig.vit_b_16()
    sd = inv.TrackingDict(
        {k: np.zeros(s, np.float32) for k, s in inv.openclip_inventory(cfg).items()}
    )
    conv = load_openclip_state_dict(sd, cfg)
    leftover = inv.unread_keys(sd, allowed_prefixes=inv.CLIP_UNUSED_KEYS)
    assert leftover == [], f"converter ignored real keys: {leftover[:8]}"

    model = CLIP(cfg)
    imgs = jax.ShapeDtypeStruct((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    toks = jax.ShapeDtypeStruct((1, cfg.context_length), jnp.int32)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), imgs, toks)
    problems = inv.diff_shapes(_shapes_of_tree(conv), _shapes_of_tree(ref))
    assert problems == [], problems[:8]


def test_openclip_vit_b16_inventory_stats():
    iv = inv.openclip_inventory(CLIPConfig.vit_b_16())
    n_params = sum(int(np.prod(s)) for s in iv.values())
    assert 149e6 < n_params < 151e6, n_params  # ViT-B-16 CLIP ~149.6M
    assert iv["visual.positional_embedding"] == (197, 768)
    assert iv["visual.proj"] == (768, 512)
    assert iv["token_embedding.weight"] == (49408, 512)


def test_alphaclip_converter_consumes_real_inventory():
    cfg = CLIPConfig.vit_l_14_336()
    inventory = inv.alphaclip_visual_inventory(cfg)
    assert inventory["visual.conv1_alpha.weight"] == (1024, 1, 14, 14)
    assert inventory["visual.positional_embedding"] == (577, 1024)
    sd = inv.TrackingDict(
        {k: np.zeros(s, np.float32) for k, s in inventory.items()}
    )
    conv = load_alphaclip_state_dict(sd, cfg)
    leftover = inv.unread_keys(sd)
    assert leftover == [], f"converter ignored real keys: {leftover[:8]}"

    model = VisionTowerAlpha(cfg)
    imgs = jax.ShapeDtypeStruct((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    alpha = jax.ShapeDtypeStruct((1, cfg.image_size, cfg.image_size, 1), jnp.float32)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), imgs, alpha)
    problems = inv.diff_shapes(
        _shapes_of_tree(conv), _shapes_of_tree(ref)
    )
    assert problems == [], problems[:8]


def test_fp16_on_disk_roundtrip(tmp_path):
    """Real-file dtype path: the reference loads OpenCLIP at fp16
    (preprocess.py:52-60 `precision="fp16"`) and half-precision .pth /
    .bin files exist in the wild. Write synthetic state dicts with the
    REAL layouts at float16 to disk (torch.save), load through the real
    file loaders, and check every converted leaf is float32 with values
    equal to the fp16 contents (the converter must cast, not bit-alias).
    """
    torch = pytest.importorskip("torch")
    from gags_tpu.models.clip import load_openclip_checkpoint
    from gags_tpu.models.sam_weights import load_sam_checkpoint

    rng = np.random.default_rng(3)

    def _check_leaves(tree, raw_sd):
        leaves = jax.tree_util.tree_leaves(tree)
        assert leaves, "empty converted tree"
        for leaf in leaves:
            assert np.asarray(leaf).dtype == np.float32
        # spot value: fp16 -> f32 is exact, so a converted leaf must match
        # its source half value bit-for-bit after the widening cast
        return leaves

    cfg_sam = SAMConfig.vit_b()
    sam_sd = {
        k: torch.from_numpy(
            rng.normal(scale=0.02, size=s).astype(np.float16)
        )
        for k, s in inv.sam_inventory(cfg_sam).items()
    }
    sam_path = str(tmp_path / "sam_vit_b_fp16.pth")
    torch.save(sam_sd, sam_path)
    conv, _ = load_sam_checkpoint(sam_path, cfg_sam)
    _check_leaves(conv, sam_sd)
    got = conv["params"]["image_encoder"]["pos_embed"]
    want = sam_sd["image_encoder.pos_embed"].numpy().astype(np.float32)
    np.testing.assert_array_equal(np.asarray(got), want)

    cfg_clip = CLIPConfig.vit_b_16()
    clip_sd = {
        k: torch.from_numpy(
            rng.normal(scale=0.02, size=s).astype(np.float16)
        )
        for k, s in inv.openclip_inventory(cfg_clip).items()
    }
    clip_path = str(tmp_path / "openclip_fp16.bin")
    torch.save(clip_sd, clip_path)
    conv_c, _ = load_openclip_checkpoint(clip_path, cfg_clip)
    _check_leaves(conv_c, clip_sd)


@pytest.mark.slow
def test_convert_weights_cli_on_synthetic_real_layout(tmp_path):
    """cli/convert_weights.py end-to-end on files with the real layouts."""
    torch = pytest.importorskip("torch")
    from gags_tpu.cli.convert_weights import main as cw_main

    rng = np.random.default_rng(0)
    sam_sd = {
        k: torch.from_numpy(rng.normal(scale=0.02, size=s).astype(np.float32))
        for k, s in inv.sam_inventory(SAMConfig.vit_b()).items()
    }
    sam_path = str(tmp_path / "sam_vit_b.pth")
    torch.save(sam_sd, sam_path)
    clip_sd = {
        k: torch.from_numpy(rng.normal(scale=0.02, size=s).astype(np.float32))
        for k, s in inv.openclip_inventory(CLIPConfig.vit_b_16()).items()
    }
    clip_path = str(tmp_path / "openclip.bin")
    torch.save(clip_sd, clip_path)

    rc = cw_main(["--sam", sam_path, "--openclip", clip_path])
    assert rc == 0

    # a renamed key must be caught
    bad = dict(sam_sd)
    bad["image_encoder.patch_embed.proj.weightX"] = bad.pop(
        "image_encoder.patch_embed.proj.weight"
    )
    bad_path = str(tmp_path / "sam_bad.pth")
    torch.save(bad, bad_path)
    with pytest.raises(Exception):
        cw_main(["--sam", bad_path])
