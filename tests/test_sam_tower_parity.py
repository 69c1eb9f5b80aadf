"""Full-pipeline SAM parity vs an independent torch implementation.

One random state dict in the segment-anything checkpoint layout (the
format `sam_vit_h_4b8939.pth` uses, reference `preprocess.py:526`) is
loaded into BOTH our flax SAM (via `load_sam_state_dict`, the converter
real weights go through) and HuggingFace transformers' SamModel (an
independent torch port of the same architecture). The whole pipeline —
windowed/global ViT encoder with decomposed rel-pos bias, neck,
random-gaussian point encoding, two-way mask-decoder transformer,
upscaling + hypernetwork heads — must agree to float tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax.numpy as jnp

from gags_tpu.models.sam import SAM, SAMConfig
from gags_tpu.models.sam_weights import load_sam_state_dict

CFG = SAMConfig.tiny()  # image 64, patch 8, dim 32, depth 2, window 4, prompt 16


def _rand_sam_sd(rng: np.random.Generator, cfg: SAMConfig):
    """Random weights in segment-anything's state-dict layout."""
    sd = {}

    def lin(prefix, dout, din):
        sd[f"{prefix}.weight"] = rng.normal(0, 0.05, (dout, din)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.05, (dout,)).astype(np.float32)

    def ln(prefix, d):
        sd[f"{prefix}.weight"] = rng.normal(1, 0.05, (d,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.05, (d,)).astype(np.float32)

    e, d, g = cfg.encoder_dim, cfg.prompt_dim, cfg.grid
    hd = e // cfg.encoder_heads
    sd["image_encoder.patch_embed.proj.weight"] = rng.normal(
        0, 0.05, (e, 3, cfg.patch_size, cfg.patch_size)
    ).astype(np.float32)
    sd["image_encoder.patch_embed.proj.bias"] = rng.normal(0, 0.05, (e,)).astype(np.float32)
    sd["image_encoder.pos_embed"] = rng.normal(0, 0.05, (1, g, g, e)).astype(np.float32)
    for i in range(cfg.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        ln(f"{p}.norm1", e)
        ln(f"{p}.norm2", e)
        lin(f"{p}.attn.qkv", 3 * e, e)
        lin(f"{p}.attn.proj", e, e)
        win = g if i in cfg.global_attn_idx else cfg.window_size
        sd[f"{p}.attn.rel_pos_h"] = rng.normal(0, 0.05, (2 * win - 1, hd)).astype(np.float32)
        sd[f"{p}.attn.rel_pos_w"] = rng.normal(0, 0.05, (2 * win - 1, hd)).astype(np.float32)
        lin(f"{p}.mlp.lin1", 4 * e, e)
        lin(f"{p}.mlp.lin2", e, 4 * e)
    sd["image_encoder.neck.0.weight"] = rng.normal(0, 0.05, (d, e, 1, 1)).astype(np.float32)
    ln("image_encoder.neck.1", d)
    sd["image_encoder.neck.2.weight"] = rng.normal(0, 0.05, (d, d, 3, 3)).astype(np.float32)
    ln("image_encoder.neck.3", d)

    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = rng.normal(
        0, 1.0, (2, d // 2)
    ).astype(np.float32)
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = rng.normal(
            0, 1.0, (1, d)
        ).astype(np.float32)
    sd["prompt_encoder.not_a_point_embed.weight"] = rng.normal(0, 1.0, (1, d)).astype(np.float32)
    sd["prompt_encoder.no_mask_embed.weight"] = rng.normal(0, 1.0, (1, d)).astype(np.float32)
    # mask downscaling exists in real checkpoints; unused by the point path
    sd["prompt_encoder.mask_downscaling.0.weight"] = rng.normal(0, 0.05, (d // 4, 1, 2, 2)).astype(np.float32)
    sd["prompt_encoder.mask_downscaling.0.bias"] = np.zeros((d // 4,), np.float32)
    ln("prompt_encoder.mask_downscaling.1", d // 4)
    sd["prompt_encoder.mask_downscaling.3.weight"] = rng.normal(0, 0.05, (d, d // 4, 2, 2)).astype(np.float32)
    sd["prompt_encoder.mask_downscaling.3.bias"] = np.zeros((d,), np.float32)
    ln("prompt_encoder.mask_downscaling.4", d)
    sd["prompt_encoder.mask_downscaling.6.weight"] = rng.normal(0, 0.05, (d, d, 1, 1)).astype(np.float32)
    sd["prompt_encoder.mask_downscaling.6.bias"] = np.zeros((d,), np.float32)

    sd["mask_decoder.iou_token.weight"] = rng.normal(0, 1.0, (1, d)).astype(np.float32)
    sd["mask_decoder.mask_tokens.weight"] = rng.normal(0, 1.0, (cfg.mask_tokens, d)).astype(np.float32)

    def attn(prefix, down=1):
        lin(f"{prefix}.q_proj", d // down, d)
        lin(f"{prefix}.k_proj", d // down, d)
        lin(f"{prefix}.v_proj", d // down, d)
        lin(f"{prefix}.out_proj", d, d // down)

    for i in range(cfg.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        attn(f"{p}.self_attn")
        ln(f"{p}.norm1", d)
        attn(f"{p}.cross_attn_token_to_image", 2)
        ln(f"{p}.norm2", d)
        lin(f"{p}.mlp.lin1", 8 * d, d)
        lin(f"{p}.mlp.lin2", d, 8 * d)
        ln(f"{p}.norm3", d)
        attn(f"{p}.cross_attn_image_to_token", 2)
        ln(f"{p}.norm4", d)
    attn("mask_decoder.transformer.final_attn_token_to_image", 2)
    ln("mask_decoder.transformer.norm_final_attn", d)
    sd["mask_decoder.output_upscaling.0.weight"] = rng.normal(0, 0.05, (d, d // 4, 2, 2)).astype(np.float32)
    sd["mask_decoder.output_upscaling.0.bias"] = rng.normal(0, 0.05, (d // 4,)).astype(np.float32)
    ln("mask_decoder.output_upscaling.1", d // 4)
    sd["mask_decoder.output_upscaling.3.weight"] = rng.normal(0, 0.05, (d // 4, d // 8, 2, 2)).astype(np.float32)
    sd["mask_decoder.output_upscaling.3.bias"] = rng.normal(0, 0.05, (d // 8,)).astype(np.float32)
    for i in range(cfg.mask_tokens):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}.layers"
        lin(f"{p}.0", d, d)
        lin(f"{p}.1", d, d)
        lin(f"{p}.2", d // 8, d)
    lin("mask_decoder.iou_prediction_head.layers.0", d, d)
    lin("mask_decoder.iou_prediction_head.layers.1", d, d)
    lin("mask_decoder.iou_prediction_head.layers.2", cfg.mask_tokens, d)
    return sd


def _hf_model(sd, cfg: SAMConfig):
    from transformers import (
        SamConfig,
        SamMaskDecoderConfig,
        SamModel,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    d = cfg.prompt_dim
    vc = SamVisionConfig(
        hidden_size=cfg.encoder_dim,
        num_hidden_layers=cfg.encoder_depth,
        num_attention_heads=cfg.encoder_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        window_size=cfg.window_size,
        global_attn_indexes=list(cfg.global_attn_idx),
        output_channels=d,
        mlp_ratio=4.0,
        num_pos_feats=d // 2,
        hidden_act="gelu",
    )
    pc = SamPromptEncoderConfig(
        hidden_size=d,
        image_embedding_size=cfg.grid,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
    )
    mc = SamMaskDecoderConfig(
        hidden_size=d,
        num_attention_heads=cfg.decoder_heads,
        num_hidden_layers=cfg.decoder_depth,
        mlp_dim=8 * d,
        attention_downsample_rate=2,
        iou_head_depth=3,
        iou_head_hidden_dim=d,
        num_multimask_outputs=cfg.mask_tokens - 1,
        hidden_act="relu",
        # segment-anything's TwoWayTransformer uses torch-default LN eps 1e-5
        # (HF's default 1e-6 deviates from the original); our flax matches
        # the original
        layer_norm_eps=1e-5,
    )
    hf = SamModel(
        SamConfig(
            vision_config=vc.to_dict(),
            prompt_encoder_config=pc.to_dict(),
            mask_decoder_config=mc.to_dict(),
        )
    ).eval()

    m = {
        "shared_image_embedding.positional_embedding": sd[
            "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"
        ],
        "prompt_encoder.shared_embedding.positional_embedding": sd[
            "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"
        ],
        "vision_encoder.pos_embed": sd["image_encoder.pos_embed"],
        "vision_encoder.patch_embed.projection.weight": sd["image_encoder.patch_embed.proj.weight"],
        "vision_encoder.patch_embed.projection.bias": sd["image_encoder.patch_embed.proj.bias"],
        "vision_encoder.neck.conv1.weight": sd["image_encoder.neck.0.weight"],
        "vision_encoder.neck.layer_norm1.weight": sd["image_encoder.neck.1.weight"],
        "vision_encoder.neck.layer_norm1.bias": sd["image_encoder.neck.1.bias"],
        "vision_encoder.neck.conv2.weight": sd["image_encoder.neck.2.weight"],
        "vision_encoder.neck.layer_norm2.weight": sd["image_encoder.neck.3.weight"],
        "vision_encoder.neck.layer_norm2.bias": sd["image_encoder.neck.3.bias"],
    }
    for i in range(cfg.encoder_depth):
        s = f"image_encoder.blocks.{i}"
        t = f"vision_encoder.layers.{i}"
        m[f"{t}.layer_norm1.weight"] = sd[f"{s}.norm1.weight"]
        m[f"{t}.layer_norm1.bias"] = sd[f"{s}.norm1.bias"]
        m[f"{t}.layer_norm2.weight"] = sd[f"{s}.norm2.weight"]
        m[f"{t}.layer_norm2.bias"] = sd[f"{s}.norm2.bias"]
        for nm in ("attn.qkv", "attn.proj", "mlp.lin1", "mlp.lin2"):
            m[f"{t}.{nm}.weight"] = sd[f"{s}.{nm}.weight"]
            m[f"{t}.{nm}.bias"] = sd[f"{s}.{nm}.bias"]
        m[f"{t}.attn.rel_pos_h"] = sd[f"{s}.attn.rel_pos_h"]
        m[f"{t}.attn.rel_pos_w"] = sd[f"{s}.attn.rel_pos_w"]
    for i in range(4):
        m[f"prompt_encoder.point_embed.{i}.weight"] = sd[
            f"prompt_encoder.point_embeddings.{i}.weight"
        ]
    m["prompt_encoder.not_a_point_embed.weight"] = sd["prompt_encoder.not_a_point_embed.weight"]
    m["prompt_encoder.no_mask_embed.weight"] = sd["prompt_encoder.no_mask_embed.weight"]
    m["prompt_encoder.mask_embed.conv1.weight"] = sd["prompt_encoder.mask_downscaling.0.weight"]
    m["prompt_encoder.mask_embed.conv1.bias"] = sd["prompt_encoder.mask_downscaling.0.bias"]
    m["prompt_encoder.mask_embed.layer_norm1.weight"] = sd["prompt_encoder.mask_downscaling.1.weight"]
    m["prompt_encoder.mask_embed.layer_norm1.bias"] = sd["prompt_encoder.mask_downscaling.1.bias"]
    m["prompt_encoder.mask_embed.conv2.weight"] = sd["prompt_encoder.mask_downscaling.3.weight"]
    m["prompt_encoder.mask_embed.conv2.bias"] = sd["prompt_encoder.mask_downscaling.3.bias"]
    m["prompt_encoder.mask_embed.layer_norm2.weight"] = sd["prompt_encoder.mask_downscaling.4.weight"]
    m["prompt_encoder.mask_embed.layer_norm2.bias"] = sd["prompt_encoder.mask_downscaling.4.bias"]
    m["prompt_encoder.mask_embed.conv3.weight"] = sd["prompt_encoder.mask_downscaling.6.weight"]
    m["prompt_encoder.mask_embed.conv3.bias"] = sd["prompt_encoder.mask_downscaling.6.bias"]

    m["mask_decoder.iou_token.weight"] = sd["mask_decoder.iou_token.weight"]
    m["mask_decoder.mask_tokens.weight"] = sd["mask_decoder.mask_tokens.weight"]
    for i in range(cfg.decoder_depth):
        s = f"mask_decoder.transformer.layers.{i}"
        t = f"mask_decoder.transformer.layers.{i}"
        for a in ("self_attn", "cross_attn_token_to_image", "cross_attn_image_to_token"):
            for pp in ("q_proj", "k_proj", "v_proj", "out_proj"):
                m[f"{t}.{a}.{pp}.weight"] = sd[f"{s}.{a}.{pp}.weight"]
                m[f"{t}.{a}.{pp}.bias"] = sd[f"{s}.{a}.{pp}.bias"]
        for j in range(1, 5):
            m[f"{t}.layer_norm{j}.weight"] = sd[f"{s}.norm{j}.weight"]
            m[f"{t}.layer_norm{j}.bias"] = sd[f"{s}.norm{j}.bias"]
        m[f"{t}.mlp.lin1.weight"] = sd[f"{s}.mlp.lin1.weight"]
        m[f"{t}.mlp.lin1.bias"] = sd[f"{s}.mlp.lin1.bias"]
        m[f"{t}.mlp.lin2.weight"] = sd[f"{s}.mlp.lin2.weight"]
        m[f"{t}.mlp.lin2.bias"] = sd[f"{s}.mlp.lin2.bias"]
    for pp in ("q_proj", "k_proj", "v_proj", "out_proj"):
        m[f"mask_decoder.transformer.final_attn_token_to_image.{pp}.weight"] = sd[
            f"mask_decoder.transformer.final_attn_token_to_image.{pp}.weight"
        ]
        m[f"mask_decoder.transformer.final_attn_token_to_image.{pp}.bias"] = sd[
            f"mask_decoder.transformer.final_attn_token_to_image.{pp}.bias"
        ]
    m["mask_decoder.transformer.layer_norm_final_attn.weight"] = sd[
        "mask_decoder.transformer.norm_final_attn.weight"
    ]
    m["mask_decoder.transformer.layer_norm_final_attn.bias"] = sd[
        "mask_decoder.transformer.norm_final_attn.bias"
    ]
    m["mask_decoder.upscale_conv1.weight"] = sd["mask_decoder.output_upscaling.0.weight"]
    m["mask_decoder.upscale_conv1.bias"] = sd["mask_decoder.output_upscaling.0.bias"]
    m["mask_decoder.upscale_layer_norm.weight"] = sd["mask_decoder.output_upscaling.1.weight"]
    m["mask_decoder.upscale_layer_norm.bias"] = sd["mask_decoder.output_upscaling.1.bias"]
    m["mask_decoder.upscale_conv2.weight"] = sd["mask_decoder.output_upscaling.3.weight"]
    m["mask_decoder.upscale_conv2.bias"] = sd["mask_decoder.output_upscaling.3.bias"]
    for i in range(cfg.mask_tokens):
        s = f"mask_decoder.output_hypernetworks_mlps.{i}.layers"
        t = f"mask_decoder.output_hypernetworks_mlps.{i}"
        m[f"{t}.proj_in.weight"] = sd[f"{s}.0.weight"]
        m[f"{t}.proj_in.bias"] = sd[f"{s}.0.bias"]
        m[f"{t}.layers.0.weight"] = sd[f"{s}.1.weight"]
        m[f"{t}.layers.0.bias"] = sd[f"{s}.1.bias"]
        m[f"{t}.proj_out.weight"] = sd[f"{s}.2.weight"]
        m[f"{t}.proj_out.bias"] = sd[f"{s}.2.bias"]
    m["mask_decoder.iou_prediction_head.proj_in.weight"] = sd["mask_decoder.iou_prediction_head.layers.0.weight"]
    m["mask_decoder.iou_prediction_head.proj_in.bias"] = sd["mask_decoder.iou_prediction_head.layers.0.bias"]
    m["mask_decoder.iou_prediction_head.layers.0.weight"] = sd["mask_decoder.iou_prediction_head.layers.1.weight"]
    m["mask_decoder.iou_prediction_head.layers.0.bias"] = sd["mask_decoder.iou_prediction_head.layers.1.bias"]
    m["mask_decoder.iou_prediction_head.proj_out.weight"] = sd["mask_decoder.iou_prediction_head.layers.2.weight"]
    m["mask_decoder.iou_prediction_head.proj_out.bias"] = sd["mask_decoder.iou_prediction_head.layers.2.bias"]

    missing, unexpected = hf.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in m.items()}, strict=False
    )
    assert not unexpected, unexpected
    assert not missing, missing
    return hf


def test_sam_full_pipeline_matches_transformers():
    rng = np.random.default_rng(0)
    sd = _rand_sam_sd(rng, CFG)
    params = load_sam_state_dict(sd, CFG)
    hf = _hf_model(sd, CFG)

    img = rng.normal(0, 1, (1, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    pts_pix = rng.uniform(2, CFG.image_size - 2, (2, 3, 2)).astype(np.float32)
    labels = np.array([[1, 1, 0], [1, -1, -1]], np.float32)

    sam = SAM(CFG)
    emb = sam.apply(params, jnp.asarray(img), method=SAM.encode_image)
    masks, iou = sam.apply(
        params,
        emb[:1],
        jnp.asarray((pts_pix + 0.5) / CFG.image_size),
        jnp.asarray(labels),
        method=SAM.decode,
    )

    with torch.no_grad():
        out = hf(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
            input_points=torch.from_numpy(pts_pix[None]),
            input_labels=torch.from_numpy(labels[None].astype(np.int64)),
            multimask_output=True,
        )
        hf_emb = hf.vision_encoder(torch.from_numpy(img.transpose(0, 3, 1, 2)))[0]

    np.testing.assert_allclose(
        np.asarray(emb),
        hf_emb.numpy().transpose(0, 2, 3, 1),
        atol=2e-5,
        rtol=1e-4,
    )
    # HF multimask drops channel 0; ours keeps all 4
    np.testing.assert_allclose(
        np.asarray(masks[:, 1:4]),
        out.pred_masks[0].numpy(),
        atol=5e-5,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(iou[:, 1:4]), out.iou_scores[0].numpy(), atol=2e-5, rtol=1e-4
    )
