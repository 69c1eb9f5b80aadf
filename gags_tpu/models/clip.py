"""CLIP (OpenCLIP-compatible) in flax — image + text towers.

TPU-native replacement for the reference's frozen OpenCLIP ViT-B-16
inference (`preprocess.py:30-112`, `eval/openclip_encoder.py`): batched,
bfloat16-friendly, jitted; mask-crop embedding in GAS runs as one big
batch per image instead of the reference's per-level python loops.

Weights: `load_openclip_state_dict()` converts an OpenCLIP torch checkpoint
(open_clip `ViT-B-16` layout, e.g. laion2b_s34b_b88k) into this module's
param tree. No weights ship with the repo (offline environment) — tests use
small random configs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12

    @staticmethod
    def vit_b_16() -> "CLIPConfig":
        return CLIPConfig()

    @staticmethod
    def vit_l_14_336() -> "CLIPConfig":
        """AlphaCLIP's tower (reference eval/alphaclip_encoder.py: ViT-L/14
        at 336px; OpenAI-CLIP text stack: width 768, 12 heads)."""
        return CLIPConfig(
            embed_dim=768,
            image_size=336,
            patch_size=14,
            vision_width=1024,
            vision_layers=24,
            vision_heads=16,
            text_width=768,
            text_heads=12,
            text_layers=12,
        )

    @staticmethod
    def tiny() -> "CLIPConfig":  # for tests
        return CLIPConfig(
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


class MHA(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b, n, _ = x.shape
        qkv = nn.Dense(3 * self.width, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.width // self.heads

        def split(t):
            return t.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        if mask is not None:
            att = att + mask
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.width)
        return nn.Dense(self.width, name="out_proj")(out)


class ResidualBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + MHA(self.width, self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1")(x), mask
        )
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.width, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, name="mlp_proj")(h)
        return x + h


class VisionTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) already CLIP-normalised. → (B, embed_dim)."""
        c = self.cfg
        n_patch = c.image_size // c.patch_size
        x = nn.Conv(
            c.vision_width,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            name="patch_embed",
        )(images)
        x = x.reshape(x.shape[0], n_patch * n_patch, c.vision_width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.vision_width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (x.shape[0], 1, c.vision_width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (n_patch * n_patch + 1, c.vision_width),
        )
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(c.vision_layers):
            x = ResidualBlock(c.vision_width, c.vision_heads, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (c.vision_width, c.embed_dim)
        )
        return x @ proj


class VisionTowerAlpha(nn.Module):
    """AlphaCLIP-style vision tower: an extra single-channel patch conv whose
    output is added to the RGB patch embedding, letting an alpha mask focus
    the embedding on a region (reference `eval/alphaclip_encoder.py:8-78`
    wraps the torch alpha_clip package; this is the same mechanism natively).
    """

    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
        """images (B, S, S, 3) CLIP-normalised; alpha (B, S, S, 1) in [0,1]."""
        c = self.cfg
        n_patch = c.image_size // c.patch_size
        x = nn.Conv(
            c.vision_width,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            name="patch_embed",
        )(images)
        a = nn.Conv(
            c.vision_width,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            name="alpha_embed",
        )(alpha)
        x = (x + a).reshape(x.shape[0], n_patch * n_patch, c.vision_width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.vision_width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (x.shape[0], 1, c.vision_width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (n_patch * n_patch + 1, c.vision_width),
        )
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(c.vision_layers):
            x = ResidualBlock(c.vision_width, c.vision_heads, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (c.vision_width, c.embed_dim)
        )
        return x @ proj


class TextTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens: (B, context_length) int32. → (B, embed_dim).

        Pools at the argmax token id (the EOT token has the highest id in
        the CLIP vocabulary)."""
        c = self.cfg
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (c.vocab_size, c.text_width),
        )
        x = emb[tokens]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.context_length, c.text_width),
        )
        x = x + pos[: x.shape[1]]
        n = x.shape[1]
        causal = jnp.triu(jnp.full((n, n), -jnp.inf, x.dtype), k=1)
        for i in range(c.text_layers):
            x = ResidualBlock(c.text_width, c.text_heads, name=f"block{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02), (c.text_width, c.embed_dim)
        )
        return pooled @ proj


class CLIP(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        self.visual = VisionTower(self.cfg)
        self.text = TextTower(self.cfg)

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        return self.encode_image(images), self.encode_text(tokens)


def preprocess_images(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(B, H, W, 3) uint8/float in [0,1] → resized + CLIP-normalised.

    Uses bilinear resize like torchvision Resize((224,224)) (antialias
    differences are negligible for the 224-crop path the reference uses).
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    images = jax.image.resize(
        images, (images.shape[0], size, size, images.shape[-1]), "bilinear"
    )
    return (images - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


# ---------------------------------------------------------------------------
# weight conversion from OpenCLIP torch checkpoints
# ---------------------------------------------------------------------------


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def load_openclip_state_dict(state: Dict[str, Any], cfg: CLIPConfig) -> Dict:
    """Convert an open_clip ViT state dict (torch tensors or numpy arrays)
    into this module's flax params. Keys follow open_clip's naming:
    visual.conv1.weight, visual.transformer.resblocks.N.*, transformer.resblocks.N.*,
    token_embedding.weight, text_projection, ...
    """
    from gags_tpu.models.sam_weights import _F32View

    sd = _F32View(state)

    def block(prefix_src: str, width: int) -> Dict:
        return {
            "ln_1": {
                "scale": sd[f"{prefix_src}.ln_1.weight"],
                "bias": sd[f"{prefix_src}.ln_1.bias"],
            },
            "attn": {
                "in_proj": {
                    "kernel": sd[f"{prefix_src}.attn.in_proj_weight"].T,
                    "bias": sd[f"{prefix_src}.attn.in_proj_bias"],
                },
                "out_proj": {
                    "kernel": sd[f"{prefix_src}.attn.out_proj.weight"].T,
                    "bias": sd[f"{prefix_src}.attn.out_proj.bias"],
                },
            },
            "ln_2": {
                "scale": sd[f"{prefix_src}.ln_2.weight"],
                "bias": sd[f"{prefix_src}.ln_2.bias"],
            },
            "mlp_fc": {
                "kernel": sd[f"{prefix_src}.mlp.c_fc.weight"].T,
                "bias": sd[f"{prefix_src}.mlp.c_fc.bias"],
            },
            "mlp_proj": {
                "kernel": sd[f"{prefix_src}.mlp.c_proj.weight"].T,
                "bias": sd[f"{prefix_src}.mlp.c_proj.bias"],
            },
        }

    visual: Dict[str, Any] = {
        # torch conv OIHW → flax HWIO
        "patch_embed": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {
            "scale": sd["visual.ln_pre.weight"],
            "bias": sd["visual.ln_pre.bias"],
        },
        "ln_post": {
            "scale": sd["visual.ln_post.weight"],
            "bias": sd["visual.ln_post.bias"],
        },
        "proj": sd["visual.proj"],
    }
    for i in range(cfg.vision_layers):
        visual[f"block{i}"] = block(f"visual.transformer.resblocks.{i}", cfg.vision_width)

    text: Dict[str, Any] = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {
            "scale": sd["ln_final.weight"],
            "bias": sd["ln_final.bias"],
        },
        "text_projection": sd["text_projection"],
    }
    for i in range(cfg.text_layers):
        text[f"block{i}"] = block(f"transformer.resblocks.{i}", cfg.text_width)

    return {"params": {"visual": visual, "text": text}}


def load_alphaclip_state_dict(state: Dict[str, Any], cfg: CLIPConfig) -> Dict:
    """AlphaCLIP visual state dict → VisionTowerAlpha flax params.

    alpha_clip checkpoints are open_clip-layout visual towers plus ONE extra
    key, `visual.conv1_alpha.weight` (a single-channel patch conv added to
    the RGB patch embedding) — reference `eval/alphaclip_encoder.py:8-78`.
    """
    dummy = _dummy_text_keys(cfg)

    class _VisualPlusDummyText:
        # text keys may be absent in alpha checkpoints; synthesise zeros so
        # the shared converter runs, then keep only the visual branch.
        # Reads of real visual keys pass through to `state` (tracked).
        def __getitem__(self, k):
            if k.startswith("visual.") and "conv1_alpha" not in k:
                return state[k]
            return dummy[k]

        def __contains__(self, k):
            if k.startswith("visual.") and "conv1_alpha" not in k:
                return k in state
            return k in dummy

    full = load_openclip_state_dict(_VisualPlusDummyText(), cfg)
    visual = full["params"]["visual"]
    visual["alpha_embed"] = {
        "kernel": _t(state["visual.conv1_alpha.weight"]).transpose(2, 3, 1, 0)
    }
    return {"params": visual}


def _dummy_text_keys(cfg: CLIPConfig) -> Dict[str, Any]:
    import numpy as _np

    keys = {
        "token_embedding.weight": _np.zeros((cfg.vocab_size, cfg.text_width), _np.float32),
        "positional_embedding": _np.zeros((cfg.context_length, cfg.text_width), _np.float32),
        "ln_final.weight": _np.ones((cfg.text_width,), _np.float32),
        "ln_final.bias": _np.zeros((cfg.text_width,), _np.float32),
        "text_projection": _np.zeros((cfg.text_width, cfg.embed_dim), _np.float32),
    }
    for i in range(cfg.text_layers):
        p = f"transformer.resblocks.{i}"
        w = cfg.text_width
        keys.update({
            f"{p}.ln_1.weight": _np.ones((w,), _np.float32),
            f"{p}.ln_1.bias": _np.zeros((w,), _np.float32),
            f"{p}.attn.in_proj_weight": _np.zeros((3 * w, w), _np.float32),
            f"{p}.attn.in_proj_bias": _np.zeros((3 * w,), _np.float32),
            f"{p}.attn.out_proj.weight": _np.zeros((w, w), _np.float32),
            f"{p}.attn.out_proj.bias": _np.zeros((w,), _np.float32),
            f"{p}.ln_2.weight": _np.ones((w,), _np.float32),
            f"{p}.ln_2.bias": _np.zeros((w,), _np.float32),
            f"{p}.mlp.c_fc.weight": _np.zeros((4 * w, w), _np.float32),
            f"{p}.mlp.c_fc.bias": _np.zeros((4 * w,), _np.float32),
            f"{p}.mlp.c_proj.weight": _np.zeros((w, 4 * w), _np.float32),
            f"{p}.mlp.c_proj.bias": _np.zeros((w,), _np.float32),
        })
    return keys


def load_openclip_checkpoint(path: str, cfg: Optional[CLIPConfig] = None):
    """Load an open_clip .pt/.bin checkpoint from disk (torch CPU)."""
    import torch

    cfg = cfg or CLIPConfig.vit_b_16()
    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    state = {k.replace("module.", ""): v for k, v in state.items()}
    return load_openclip_state_dict(state, cfg), cfg
