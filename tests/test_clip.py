"""CLIP tower tests on a tiny config + converter round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gags_tpu.models.clip import (
    CLIP,
    CLIPConfig,
    load_openclip_state_dict,
    preprocess_images,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = CLIPConfig.tiny()
    model = CLIP(cfg)
    imgs = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    toks = jnp.zeros((2, cfg.context_length), jnp.int32).at[:, 0].set(5).at[:, 3].set(63)
    params = model.init(jax.random.PRNGKey(0), imgs, toks)
    return cfg, model, params


def test_shapes(tiny):
    cfg, model, params = tiny
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(3, 32, 32, 3)), jnp.float32)
    toks = jnp.zeros((3, 12), jnp.int32).at[:, 2].set(63)
    img_emb, txt_emb = model.apply(params, imgs, toks)
    assert img_emb.shape == (3, cfg.embed_dim)
    assert txt_emb.shape == (3, cfg.embed_dim)
    assert np.isfinite(np.asarray(img_emb)).all()


def test_text_causality(tiny):
    """Changing tokens after the EOT position must not affect the pooled embed."""
    cfg, model, params = tiny
    toks1 = jnp.zeros((1, 12), jnp.int32).at[:, 0].set(1).at[:, 4].set(63)
    toks2 = toks1.at[:, 7].set(30)  # after the argmax(=EOT at 4)? id 30 < 63 ✓
    e1 = model.apply(params, method="encode_text", tokens=toks1)
    e2 = model.apply(params, method="encode_text", tokens=toks2)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


def test_text_earlier_tokens_do_matter(tiny):
    cfg, model, params = tiny
    toks1 = jnp.zeros((1, 12), jnp.int32).at[:, 0].set(1).at[:, 4].set(63)
    toks2 = toks1.at[:, 2].set(9)
    e1 = model.apply(params, method="encode_text", tokens=toks1)
    e2 = model.apply(params, method="encode_text", tokens=toks2)
    assert float(jnp.abs(e1 - e2).max()) > 1e-5


def test_preprocess_range():
    imgs = jnp.full((1, 64, 48, 3), 128, jnp.uint8)
    out = np.asarray(preprocess_images(imgs, 32))
    assert out.shape == (1, 32, 32, 3)
    # (0.502 - mean)/std
    expect = (128 / 255.0 - 0.48145466) / 0.26862954
    np.testing.assert_allclose(out[0, 16, 16, 0], expect, atol=1e-3)


def test_openclip_converter_matches_torch_mha(tiny):
    """Build a tiny torch-style state dict, convert, and check our MHA equals
    torch.nn.functional.multi_head_attention math on random input."""
    import torch

    cfg, model, params = tiny
    rng = np.random.default_rng(1)
    sd = {}

    def add_block(prefix, width):
        sd[f"{prefix}.ln_1.weight"] = rng.normal(1, 0.02, width).astype(np.float32)
        sd[f"{prefix}.ln_1.bias"] = rng.normal(0, 0.02, width).astype(np.float32)
        sd[f"{prefix}.attn.in_proj_weight"] = rng.normal(0, 0.1, (3 * width, width)).astype(np.float32)
        sd[f"{prefix}.attn.in_proj_bias"] = rng.normal(0, 0.1, 3 * width).astype(np.float32)
        sd[f"{prefix}.attn.out_proj.weight"] = rng.normal(0, 0.1, (width, width)).astype(np.float32)
        sd[f"{prefix}.attn.out_proj.bias"] = rng.normal(0, 0.1, width).astype(np.float32)
        sd[f"{prefix}.ln_2.weight"] = rng.normal(1, 0.02, width).astype(np.float32)
        sd[f"{prefix}.ln_2.bias"] = rng.normal(0, 0.02, width).astype(np.float32)
        sd[f"{prefix}.mlp.c_fc.weight"] = rng.normal(0, 0.1, (4 * width, width)).astype(np.float32)
        sd[f"{prefix}.mlp.c_fc.bias"] = rng.normal(0, 0.1, 4 * width).astype(np.float32)
        sd[f"{prefix}.mlp.c_proj.weight"] = rng.normal(0, 0.1, (width, 4 * width)).astype(np.float32)
        sd[f"{prefix}.mlp.c_proj.bias"] = rng.normal(0, 0.1, width).astype(np.float32)

    n_patch = cfg.image_size // cfg.patch_size
    sd["visual.conv1.weight"] = rng.normal(0, 0.05, (cfg.vision_width, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32)
    sd["visual.class_embedding"] = rng.normal(0, 0.02, cfg.vision_width).astype(np.float32)
    sd["visual.positional_embedding"] = rng.normal(0, 0.02, (n_patch * n_patch + 1, cfg.vision_width)).astype(np.float32)
    sd["visual.ln_pre.weight"] = np.ones(cfg.vision_width, np.float32)
    sd["visual.ln_pre.bias"] = np.zeros(cfg.vision_width, np.float32)
    sd["visual.ln_post.weight"] = np.ones(cfg.vision_width, np.float32)
    sd["visual.ln_post.bias"] = np.zeros(cfg.vision_width, np.float32)
    sd["visual.proj"] = rng.normal(0, 0.05, (cfg.vision_width, cfg.embed_dim)).astype(np.float32)
    for i in range(cfg.vision_layers):
        add_block(f"visual.transformer.resblocks.{i}", cfg.vision_width)
    sd["token_embedding.weight"] = rng.normal(0, 0.02, (cfg.vocab_size, cfg.text_width)).astype(np.float32)
    sd["positional_embedding"] = rng.normal(0, 0.01, (cfg.context_length, cfg.text_width)).astype(np.float32)
    sd["ln_final.weight"] = np.ones(cfg.text_width, np.float32)
    sd["ln_final.bias"] = np.zeros(cfg.text_width, np.float32)
    sd["text_projection"] = rng.normal(0, 0.05, (cfg.text_width, cfg.embed_dim)).astype(np.float32)
    for i in range(cfg.text_layers):
        add_block(f"transformer.resblocks.{i}", cfg.text_width)

    converted = load_openclip_state_dict(sd, cfg)

    # cross-check one attention block against torch's F.multi_head_attention_forward
    x = rng.normal(0, 1, (1, 5, cfg.text_width)).astype(np.float32)
    tx = torch.from_numpy(x).transpose(0, 1)  # (L, B, E)
    pref = "transformer.resblocks.0"
    tout, _ = torch.nn.functional.multi_head_attention_forward(
        tx, tx, tx,
        cfg.text_width, cfg.text_heads,
        torch.from_numpy(sd[f"{pref}.attn.in_proj_weight"]),
        torch.from_numpy(sd[f"{pref}.attn.in_proj_bias"]),
        None, None, False, 0.0,
        torch.from_numpy(sd[f"{pref}.attn.out_proj.weight"]),
        torch.from_numpy(sd[f"{pref}.attn.out_proj.bias"]),
    )
    from gags_tpu.models.clip import MHA

    mha = MHA(cfg.text_width, cfg.text_heads)
    blk = converted["params"]["text"]["block0"]["attn"]
    got = mha.apply({"params": blk}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got)[0], tout.transpose(0, 1).detach().numpy()[0], atol=2e-5
    )

    # full forward runs with converted params
    imgs = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    toks = jnp.zeros((1, 12), jnp.int32).at[:, 3].set(63)
    ie, te = model.apply(converted, imgs, toks)
    assert np.isfinite(np.asarray(ie)).all() and np.isfinite(np.asarray(te)).all()
