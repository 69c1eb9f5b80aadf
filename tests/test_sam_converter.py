"""SAM torch→flax weight converter: full param-tree structural validation."""

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.models.sam import SAM, SAMConfig
from gags_tpu.models.sam_weights import load_sam_state_dict


def _fake_torch_state(cfg: SAMConfig, rng) -> dict:
    """A state dict in the public sam_vit_* checkpoint layout with random
    values at the correct shapes."""
    sd = {}
    d, dep, heads = cfg.encoder_dim, cfg.encoder_depth, cfg.encoder_heads
    g, pd = cfg.grid, cfg.prompt_dim
    sd["image_encoder.patch_embed.proj.weight"] = rng.normal(size=(d, 3, cfg.patch_size, cfg.patch_size))
    sd["image_encoder.patch_embed.proj.bias"] = rng.normal(size=(d,))
    sd["image_encoder.pos_embed"] = rng.normal(size=(1, g, g, d))
    for i in range(dep):
        p = f"image_encoder.blocks.{i}"
        sd[f"{p}.norm1.weight"] = np.ones(d)
        sd[f"{p}.norm1.bias"] = np.zeros(d)
        sd[f"{p}.attn.qkv.weight"] = rng.normal(size=(3 * d, d))
        sd[f"{p}.attn.qkv.bias"] = rng.normal(size=(3 * d,))
        sd[f"{p}.attn.proj.weight"] = rng.normal(size=(d, d))
        sd[f"{p}.attn.proj.bias"] = rng.normal(size=(d,))
        hd = d // heads
        win = cfg.window_size if i not in cfg.global_attn_idx else g
        sd[f"{p}.attn.rel_pos_h"] = rng.normal(size=(2 * win - 1, hd))
        sd[f"{p}.attn.rel_pos_w"] = rng.normal(size=(2 * win - 1, hd))
        sd[f"{p}.norm2.weight"] = np.ones(d)
        sd[f"{p}.norm2.bias"] = np.zeros(d)
        sd[f"{p}.mlp.lin1.weight"] = rng.normal(size=(4 * d, d))
        sd[f"{p}.mlp.lin1.bias"] = rng.normal(size=(4 * d,))
        sd[f"{p}.mlp.lin2.weight"] = rng.normal(size=(d, 4 * d))
        sd[f"{p}.mlp.lin2.bias"] = rng.normal(size=(d,))
    sd["image_encoder.neck.0.weight"] = rng.normal(size=(pd, d, 1, 1))
    sd["image_encoder.neck.1.weight"] = np.ones(pd)
    sd["image_encoder.neck.1.bias"] = np.zeros(pd)
    sd["image_encoder.neck.2.weight"] = rng.normal(size=(pd, pd, 3, 3))
    sd["image_encoder.neck.3.weight"] = np.ones(pd)
    sd["image_encoder.neck.3.bias"] = np.zeros(pd)
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = rng.normal(size=(2, pd // 2))
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = rng.normal(size=(1, pd))
    sd["prompt_encoder.not_a_point_embed.weight"] = rng.normal(size=(1, pd))
    sd["prompt_encoder.no_mask_embed.weight"] = rng.normal(size=(1, pd))
    sd["mask_decoder.iou_token.weight"] = rng.normal(size=(1, pd))
    sd["mask_decoder.mask_tokens.weight"] = rng.normal(size=(4, pd))

    def tw(p, dim):
        for name, shp in (("q_proj", (dim, pd)), ("k_proj", (dim, pd)),
                          ("v_proj", (dim, pd)), ("out_proj", (pd, dim))):
            sd[f"{p}.{name}.weight"] = rng.normal(size=shp)
            sd[f"{p}.{name}.bias"] = rng.normal(size=(shp[0],))

    for i in range(cfg.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        tw(f"{p}.self_attn", pd)
        for j in (1, 2, 3, 4):
            sd[f"{p}.norm{j}.weight"] = np.ones(pd)
            sd[f"{p}.norm{j}.bias"] = np.zeros(pd)
        tw(f"{p}.cross_attn_token_to_image", pd // 2)
        tw(f"{p}.cross_attn_image_to_token", pd // 2)
        sd[f"{p}.mlp.lin1.weight"] = rng.normal(size=(8 * pd, pd))
        sd[f"{p}.mlp.lin1.bias"] = rng.normal(size=(8 * pd,))
        sd[f"{p}.mlp.lin2.weight"] = rng.normal(size=(pd, 8 * pd))
        sd[f"{p}.mlp.lin2.bias"] = rng.normal(size=(pd,))
    tw("mask_decoder.transformer.final_attn_token_to_image", pd // 2)
    sd["mask_decoder.transformer.norm_final_attn.weight"] = np.ones(pd)
    sd["mask_decoder.transformer.norm_final_attn.bias"] = np.zeros(pd)
    sd["mask_decoder.output_upscaling.0.weight"] = rng.normal(size=(pd, pd // 4, 2, 2))
    sd["mask_decoder.output_upscaling.0.bias"] = rng.normal(size=(pd // 4,))
    sd["mask_decoder.output_upscaling.1.weight"] = np.ones(pd // 4)
    sd["mask_decoder.output_upscaling.1.bias"] = np.zeros(pd // 4)
    sd["mask_decoder.output_upscaling.3.weight"] = rng.normal(size=(pd // 4, pd // 8, 2, 2))
    sd["mask_decoder.output_upscaling.3.bias"] = rng.normal(size=(pd // 8,))
    for i in range(4):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}.layers"
        sd[f"{p}.0.weight"] = rng.normal(size=(pd, pd))
        sd[f"{p}.0.bias"] = rng.normal(size=(pd,))
        sd[f"{p}.1.weight"] = rng.normal(size=(pd, pd))
        sd[f"{p}.1.bias"] = rng.normal(size=(pd,))
        sd[f"{p}.2.weight"] = rng.normal(size=(pd // 8, pd))
        sd[f"{p}.2.bias"] = rng.normal(size=(pd // 8,))
    p = "mask_decoder.iou_prediction_head.layers"
    sd[f"{p}.0.weight"] = rng.normal(size=(pd, pd))
    sd[f"{p}.0.bias"] = rng.normal(size=(pd,))
    sd[f"{p}.1.weight"] = rng.normal(size=(pd, pd))
    sd[f"{p}.1.bias"] = rng.normal(size=(pd,))
    sd[f"{p}.2.weight"] = rng.normal(size=(4, pd))
    sd[f"{p}.2.bias"] = rng.normal(size=(4,))
    return sd


def test_sam_converter_tree_matches_and_applies():
    cfg = SAMConfig.tiny()
    model = SAM(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    pts = jnp.zeros((2, 1, 2))
    lbl = jnp.ones((2, 1), jnp.int32)
    ref = model.init(jax.random.PRNGKey(0), img, pts, lbl)

    sd = _fake_torch_state(cfg, np.random.default_rng(0))
    conv = load_sam_state_dict(sd, cfg)

    ref_paths = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    conv_paths = {
        jax.tree_util.keystr(k): np.asarray(v).shape
        for k, v in jax.tree_util.tree_flatten_with_path(conv)[0]
    }
    assert set(ref_paths) == set(conv_paths)
    for k in ref_paths:
        assert tuple(ref_paths[k]) == tuple(conv_paths[k]), k

    masks, iou = model.apply(conv, img, pts, lbl)
    assert masks.shape == (2, 4, 4 * cfg.grid, 4 * cfg.grid)
    assert np.isfinite(np.asarray(masks)).all()
