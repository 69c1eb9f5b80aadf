"""Full-tower CLIP parity vs an independent torch implementation.

One random state dict in the open_clip checkpoint layout is loaded into
BOTH our flax towers (via `load_openclip_state_dict`, the same converter
real laion2b weights go through) and HuggingFace transformers' CLIPModel
(an independent torch implementation of the architecture the reference
uses through open_clip, `preprocess.py:52-60`). Whole-tower outputs must
match to float tolerance — this pins every layer: patch conv, class token,
pre/post LN, all attention blocks, exact-GELU MLPs, projections, and the
text tower's causal mask + argmax-token pooling.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from gags_tpu.models.clip import (
    CLIPConfig,
    TextTower,
    VisionTower,
    load_openclip_state_dict,
)

CFG = CLIPConfig(
    embed_dim=16,
    image_size=32,
    patch_size=8,
    vision_width=32,
    vision_layers=2,
    vision_heads=2,
    vocab_size=64,
    context_length=12,
    text_width=24,
    text_heads=2,
    text_layers=2,
)


def _rand_openclip_sd(rng: np.random.Generator, cfg: CLIPConfig):
    """Random weights in open_clip's ViT state-dict layout."""

    def lin(d_out, d_in):
        return rng.normal(0, 0.04, (d_out, d_in)).astype(np.float32)

    sd = {}

    def add_block(prefix, w):
        sd[f"{prefix}.ln_1.weight"] = rng.normal(1, 0.05, (w,)).astype(np.float32)
        sd[f"{prefix}.ln_1.bias"] = rng.normal(0, 0.05, (w,)).astype(np.float32)
        sd[f"{prefix}.attn.in_proj_weight"] = lin(3 * w, w)
        sd[f"{prefix}.attn.in_proj_bias"] = rng.normal(0, 0.04, (3 * w,)).astype(np.float32)
        sd[f"{prefix}.attn.out_proj.weight"] = lin(w, w)
        sd[f"{prefix}.attn.out_proj.bias"] = rng.normal(0, 0.04, (w,)).astype(np.float32)
        sd[f"{prefix}.ln_2.weight"] = rng.normal(1, 0.05, (w,)).astype(np.float32)
        sd[f"{prefix}.ln_2.bias"] = rng.normal(0, 0.05, (w,)).astype(np.float32)
        sd[f"{prefix}.mlp.c_fc.weight"] = lin(4 * w, w)
        sd[f"{prefix}.mlp.c_fc.bias"] = rng.normal(0, 0.04, (4 * w,)).astype(np.float32)
        sd[f"{prefix}.mlp.c_proj.weight"] = lin(w, 4 * w)
        sd[f"{prefix}.mlp.c_proj.bias"] = rng.normal(0, 0.04, (w,)).astype(np.float32)

    w = cfg.vision_width
    sd["visual.conv1.weight"] = rng.normal(
        0, 0.04, (w, 3, cfg.patch_size, cfg.patch_size)
    ).astype(np.float32)
    sd["visual.class_embedding"] = rng.normal(0, 0.04, (w,)).astype(np.float32)
    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
    sd["visual.positional_embedding"] = rng.normal(0, 0.04, (n_tok, w)).astype(np.float32)
    sd["visual.ln_pre.weight"] = rng.normal(1, 0.05, (w,)).astype(np.float32)
    sd["visual.ln_pre.bias"] = rng.normal(0, 0.05, (w,)).astype(np.float32)
    sd["visual.ln_post.weight"] = rng.normal(1, 0.05, (w,)).astype(np.float32)
    sd["visual.ln_post.bias"] = rng.normal(0, 0.05, (w,)).astype(np.float32)
    sd["visual.proj"] = rng.normal(0, 0.04, (w, cfg.embed_dim)).astype(np.float32)
    for i in range(cfg.vision_layers):
        add_block(f"visual.transformer.resblocks.{i}", w)

    tw = cfg.text_width
    sd["token_embedding.weight"] = rng.normal(0, 0.02, (cfg.vocab_size, tw)).astype(np.float32)
    sd["positional_embedding"] = rng.normal(0, 0.01, (cfg.context_length, tw)).astype(np.float32)
    sd["ln_final.weight"] = rng.normal(1, 0.05, (tw,)).astype(np.float32)
    sd["ln_final.bias"] = rng.normal(0, 0.05, (tw,)).astype(np.float32)
    sd["text_projection"] = rng.normal(0, 0.04, (tw, cfg.embed_dim)).astype(np.float32)
    for i in range(cfg.text_layers):
        add_block(f"transformer.resblocks.{i}", tw)
    return sd


def _hf_vision(sd, cfg: CLIPConfig):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf = CLIPVisionModel(
        CLIPVisionConfig(
            hidden_size=cfg.vision_width,
            intermediate_size=4 * cfg.vision_width,
            num_hidden_layers=cfg.vision_layers,
            num_attention_heads=cfg.vision_heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            hidden_act="gelu",
            layer_norm_eps=1e-5,
            attention_dropout=0.0,
        )
    ).eval()
    w = cfg.vision_width
    m = {
        "vision_model.embeddings.patch_embedding.weight": sd["visual.conv1.weight"],
        "vision_model.embeddings.class_embedding": sd["visual.class_embedding"],
        "vision_model.embeddings.position_embedding.weight": sd["visual.positional_embedding"],
        "vision_model.pre_layrnorm.weight": sd["visual.ln_pre.weight"],
        "vision_model.pre_layrnorm.bias": sd["visual.ln_pre.bias"],
        "vision_model.post_layernorm.weight": sd["visual.ln_post.weight"],
        "vision_model.post_layernorm.bias": sd["visual.ln_post.bias"],
    }
    for i in range(cfg.vision_layers):
        s = f"visual.transformer.resblocks.{i}"
        d = f"vision_model.encoder.layers.{i}"
        qkv_w = sd[f"{s}.attn.in_proj_weight"]
        qkv_b = sd[f"{s}.attn.in_proj_bias"]
        for j, nme in enumerate(["q_proj", "k_proj", "v_proj"]):
            m[f"{d}.self_attn.{nme}.weight"] = qkv_w[j * w : (j + 1) * w]
            m[f"{d}.self_attn.{nme}.bias"] = qkv_b[j * w : (j + 1) * w]
        m[f"{d}.self_attn.out_proj.weight"] = sd[f"{s}.attn.out_proj.weight"]
        m[f"{d}.self_attn.out_proj.bias"] = sd[f"{s}.attn.out_proj.bias"]
        m[f"{d}.layer_norm1.weight"] = sd[f"{s}.ln_1.weight"]
        m[f"{d}.layer_norm1.bias"] = sd[f"{s}.ln_1.bias"]
        m[f"{d}.layer_norm2.weight"] = sd[f"{s}.ln_2.weight"]
        m[f"{d}.layer_norm2.bias"] = sd[f"{s}.ln_2.bias"]
        m[f"{d}.mlp.fc1.weight"] = sd[f"{s}.mlp.c_fc.weight"]
        m[f"{d}.mlp.fc1.bias"] = sd[f"{s}.mlp.c_fc.bias"]
        m[f"{d}.mlp.fc2.weight"] = sd[f"{s}.mlp.c_proj.weight"]
        m[f"{d}.mlp.fc2.bias"] = sd[f"{s}.mlp.c_proj.bias"]
    missing, unexpected = hf.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in m.items()}, strict=False
    )
    # position_ids buffers may be reported missing on some versions; nothing else
    assert all("position_ids" in k for k in missing), missing
    assert not unexpected, unexpected
    return hf


def _hf_text(sd, cfg: CLIPConfig):
    from transformers import CLIPTextConfig, CLIPTextModel

    hf = CLIPTextModel(
        CLIPTextConfig(
            hidden_size=cfg.text_width,
            intermediate_size=4 * cfg.text_width,
            num_hidden_layers=cfg.text_layers,
            num_attention_heads=cfg.text_heads,
            max_position_embeddings=cfg.context_length,
            vocab_size=cfg.vocab_size,
            hidden_act="gelu",
            layer_norm_eps=1e-5,
            attention_dropout=0.0,
            eos_token_id=cfg.vocab_size - 1,
        )
    ).eval()
    w = cfg.text_width
    m = {
        "text_model.embeddings.token_embedding.weight": sd["token_embedding.weight"],
        "text_model.embeddings.position_embedding.weight": sd["positional_embedding"],
        "text_model.final_layer_norm.weight": sd["ln_final.weight"],
        "text_model.final_layer_norm.bias": sd["ln_final.bias"],
    }
    for i in range(cfg.text_layers):
        s = f"transformer.resblocks.{i}"
        d = f"text_model.encoder.layers.{i}"
        qkv_w = sd[f"{s}.attn.in_proj_weight"]
        qkv_b = sd[f"{s}.attn.in_proj_bias"]
        for j, nme in enumerate(["q_proj", "k_proj", "v_proj"]):
            m[f"{d}.self_attn.{nme}.weight"] = qkv_w[j * w : (j + 1) * w]
            m[f"{d}.self_attn.{nme}.bias"] = qkv_b[j * w : (j + 1) * w]
        m[f"{d}.self_attn.out_proj.weight"] = sd[f"{s}.attn.out_proj.weight"]
        m[f"{d}.self_attn.out_proj.bias"] = sd[f"{s}.attn.out_proj.bias"]
        m[f"{d}.layer_norm1.weight"] = sd[f"{s}.ln_1.weight"]
        m[f"{d}.layer_norm1.bias"] = sd[f"{s}.ln_1.bias"]
        m[f"{d}.layer_norm2.weight"] = sd[f"{s}.ln_2.weight"]
        m[f"{d}.layer_norm2.bias"] = sd[f"{s}.ln_2.bias"]
        m[f"{d}.mlp.fc1.weight"] = sd[f"{s}.mlp.c_fc.weight"]
        m[f"{d}.mlp.fc1.bias"] = sd[f"{s}.mlp.c_fc.bias"]
        m[f"{d}.mlp.fc2.weight"] = sd[f"{s}.mlp.c_proj.weight"]
        m[f"{d}.mlp.fc2.bias"] = sd[f"{s}.mlp.c_proj.bias"]
    missing, unexpected = hf.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in m.items()}, strict=False
    )
    assert all("position_ids" in k for k in missing), missing
    assert not unexpected, unexpected
    return hf


def test_vision_tower_matches_transformers():
    rng = np.random.default_rng(0)
    sd = _rand_openclip_sd(rng, CFG)
    params = load_openclip_state_dict(sd, CFG)
    imgs = rng.normal(0, 1, (3, CFG.image_size, CFG.image_size, 3)).astype(np.float32)

    ours = VisionTower(CFG).apply(
        {"params": params["params"]["visual"]}, jnp.asarray(imgs)
    )

    hf = _hf_vision(sd, CFG)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
        pooled = out.pooler_output.numpy()  # ln_post(cls)
    ref = pooled @ sd["visual.proj"]
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_text_tower_matches_transformers():
    rng = np.random.default_rng(1)
    sd = _rand_openclip_sd(rng, CFG)
    params = load_openclip_state_dict(sd, CFG)
    toks = rng.integers(1, CFG.vocab_size - 1, (4, CFG.context_length))
    toks[:, 0] = 1
    toks[np.arange(4), rng.integers(3, CFG.context_length, 4)] = CFG.vocab_size - 1
    toks = toks.astype(np.int32)

    ours = TextTower(CFG).apply(
        {"params": params["params"]["text"]}, jnp.asarray(toks)
    )

    hf = _hf_text(sd, CFG)
    with torch.no_grad():
        out = hf.text_model(
            input_ids=torch.from_numpy(toks.astype(np.int64))
        ).last_hidden_state.numpy()
    eot = toks.argmax(axis=-1)
    ref = out[np.arange(4), eot] @ sd["text_projection"]
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)
