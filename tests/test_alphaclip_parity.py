"""Full-tower AlphaCLIP parity vs an independent torch implementation.

alpha_clip's visual tower is the open_clip ViT with ONE change: an extra
single-channel patch conv whose output is added to the RGB patch embedding
before the class token (reference `eval/alphaclip_encoder.py:8-78` wraps
the torch alpha_clip package). The torch replica here implements exactly
that forward; a random state dict in alpha_clip's key layout is converted
through `load_alphaclip_state_dict` and whole-tower outputs must match."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gags_tpu.models.clip import (  # noqa: E402
    CLIPConfig,
    VisionTowerAlpha,
    load_alphaclip_state_dict,
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


class _Block(tnn.Module):
    def __init__(self, w, heads):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(w)
        self.attn = tnn.MultiheadAttention(w, heads, batch_first=True)
        self.ln_2 = tnn.LayerNorm(w)
        self.c_fc = tnn.Linear(w, 4 * w)
        self.c_proj = tnn.Linear(4 * w, w)

    def forward(self, x):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False)
        x = x + a
        h = self.ln_2(x)
        x = x + self.c_proj(tnn.functional.gelu(self.c_fc(h)))
        return x


class _TorchAlphaVisual(tnn.Module):
    def __init__(self, c: CLIPConfig):
        super().__init__()
        self.c = c
        self.conv1 = tnn.Conv2d(3, c.vision_width, c.patch_size, c.patch_size, bias=False)
        self.conv1_alpha = tnn.Conv2d(1, c.vision_width, c.patch_size, c.patch_size, bias=False)
        n = (c.image_size // c.patch_size) ** 2
        self.class_embedding = tnn.Parameter(torch.randn(c.vision_width) * 0.02)
        self.positional_embedding = tnn.Parameter(torch.randn(n + 1, c.vision_width) * 0.02)
        self.ln_pre = tnn.LayerNorm(c.vision_width)
        self.blocks = tnn.ModuleList(
            [_Block(c.vision_width, c.vision_heads) for _ in range(c.vision_layers)]
        )
        self.ln_post = tnn.LayerNorm(c.vision_width)
        self.proj = tnn.Parameter(torch.randn(c.vision_width, c.embed_dim) * 0.02)

    def forward(self, img, alpha):
        x = self.conv1(img) + self.conv1_alpha(alpha)  # (B, W, g, g)
        b, w, g, _ = x.shape
        x = x.reshape(b, w, g * g).permute(0, 2, 1)
        cls = self.class_embedding[None, None, :].expand(b, 1, w)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.blocks:
            x = blk(x)
        return self.ln_post(x[:, 0]) @ self.proj


def test_alpha_vision_tower_matches_torch():
    torch.manual_seed(3)
    net = _TorchAlphaVisual(CFG)

    # state dict in alpha_clip / open_clip key layout
    sd = {
        "visual.conv1.weight": net.conv1.weight.detach(),
        "visual.conv1_alpha.weight": net.conv1_alpha.weight.detach(),
        "visual.class_embedding": net.class_embedding.detach(),
        "visual.positional_embedding": net.positional_embedding.detach(),
        "visual.ln_pre.weight": net.ln_pre.weight.detach(),
        "visual.ln_pre.bias": net.ln_pre.bias.detach(),
        "visual.ln_post.weight": net.ln_post.weight.detach(),
        "visual.ln_post.bias": net.ln_post.bias.detach(),
        "visual.proj": net.proj.detach(),
    }
    for i, blk in enumerate(net.blocks):
        p = f"visual.transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = blk.ln_1.weight.detach()
        sd[f"{p}.ln_1.bias"] = blk.ln_1.bias.detach()
        sd[f"{p}.attn.in_proj_weight"] = blk.attn.in_proj_weight.detach()
        sd[f"{p}.attn.in_proj_bias"] = blk.attn.in_proj_bias.detach()
        sd[f"{p}.attn.out_proj.weight"] = blk.attn.out_proj.weight.detach()
        sd[f"{p}.attn.out_proj.bias"] = blk.attn.out_proj.bias.detach()
        sd[f"{p}.ln_2.weight"] = blk.ln_2.weight.detach()
        sd[f"{p}.ln_2.bias"] = blk.ln_2.bias.detach()
        sd[f"{p}.mlp.c_fc.weight"] = blk.c_fc.weight.detach()
        sd[f"{p}.mlp.c_fc.bias"] = blk.c_fc.bias.detach()
        sd[f"{p}.mlp.c_proj.weight"] = blk.c_proj.weight.detach()
        sd[f"{p}.mlp.c_proj.bias"] = blk.c_proj.bias.detach()

    params = load_alphaclip_state_dict(sd, CFG)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    alpha = rng.uniform(0, 1, size=(2, CFG.image_size, CFG.image_size, 1)).astype(np.float32)

    with torch.no_grad():
        expect = net(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(alpha).permute(0, 3, 1, 2),
        ).numpy()

    tower = VisionTowerAlpha(CFG)
    got = np.asarray(
        jax.jit(tower.apply)(params, jnp.asarray(img), jnp.asarray(alpha))
    )
    np.testing.assert_allclose(got, expect, atol=2e-5, rtol=1e-4)


def test_alpha_encoder_region_focus():
    """AlphaClipEncoder API: the alpha mask changes the embedding, and
    relevancy plumbing works end to end with injected text embeddings."""
    import jax.numpy as jnp

    from gags_tpu.models.clip import TextTower, VisionTowerAlpha
    from gags_tpu.query.alpha_encoder import AlphaClipEncoder, mask_transform

    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, CFG.image_size, CFG.image_size, 3))
    al = jnp.zeros((1, CFG.image_size, CFG.image_size, 1))
    vparams = VisionTowerAlpha(CFG).init(rng, img, al)
    tparams = TextTower(CFG).init(rng, jnp.zeros((1, CFG.context_length), jnp.int32))

    enc = AlphaClipEncoder(CFG, vparams, tparams)
    a_full = np.asarray(mask_transform(np.ones((1, CFG.image_size, CFG.image_size, 1))))
    a_none = np.asarray(mask_transform(np.zeros((1, CFG.image_size, CFG.image_size, 1))))
    image = np.asarray(
        jax.random.normal(rng, (1, CFG.image_size, CFG.image_size, 3))
    )
    e1 = enc.encode_image(jnp.asarray(image), jnp.asarray(a_full))
    e2 = enc.encode_image(jnp.asarray(image), jnp.asarray(a_none))
    assert e1.shape == (1, CFG.embed_dim)
    assert float(jnp.abs(e1 - e2).max()) > 1e-3  # mask focuses the embedding
    np.testing.assert_allclose(float(jnp.linalg.norm(e1)), 1.0, rtol=1e-5)

    # relevancy with injected unit-norm text embeddings (no BPE vocab in env)
    d = CFG.embed_dim
    r = jax.random.normal(jax.random.PRNGKey(1), (3, d))
    enc.pos_embeds = r[:1] / jnp.linalg.norm(r[:1], axis=-1, keepdims=True)
    enc._neg_embeds = r[1:] / jnp.linalg.norm(r[1:], axis=-1, keepdims=True)
    rel = enc.get_relevancy(e1, 0)
    assert rel.shape == (1, 1) and 0.0 <= float(rel[0, 0]) <= 1.0
    sem = jnp.zeros((2, 4, 4, d))
    vol = enc.get_max_across(sem)
    assert vol.shape == (2, 1, 4, 4)
