"""AlphaCLIP encoder: region-focused CLIP embeddings via an alpha mask.

Counterpart of the reference's `eval/alphaclip_encoder.py` (AlphaCLIPNetwork,
which wraps the torch `alpha_clip` package; unused by the shipped eval
scripts but part of the reference surface). The vision tower is
`models.clip.VisionTowerAlpha` — the open_clip ViT plus a single-channel
patch conv on the mask — and the relevancy math is shared with the OpenCLIP
path (`query.relevancy`, the exact sigmoid reduction of the reference's
pairwise softmax).

Weights are user-supplied (`alpha_clip` checkpoints; none ship in this
offline environment): construct via `AlphaClipEncoder.from_checkpoint`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gags_tpu.models.clip import (
    CLIPConfig,
    TextTower,
    VisionTowerAlpha,
    load_alphaclip_state_dict,
)
from gags_tpu.query.relevancy import DEFAULT_NEGATIVES, max_across_levels, relevancy

# alpha_clip mask transform: ToTensor -> resize -> Normalize(0.5, 0.26)
_MASK_MEAN = 0.5
_MASK_STD = 0.26


def mask_transform(alpha: np.ndarray) -> np.ndarray:
    """[0,1] mask → the normalised alpha channel alpha_clip feeds its conv."""
    return (alpha.astype(np.float32) - _MASK_MEAN) / _MASK_STD


class AlphaClipEncoder:
    """Reference-API encoder: set_positives / encode_image / get_max_across."""

    def __init__(self, cfg: CLIPConfig, visual_params, text_params, tokenizer=None):
        self.cfg = cfg
        self.visual = VisionTowerAlpha(cfg)
        self.text = TextTower(cfg)
        self.visual_params = visual_params
        self.text_params = text_params
        self.tokenizer = tokenizer
        self._encode_img = jax.jit(self.visual.apply)
        self._encode_txt = jax.jit(self.text.apply)
        self._neg_embeds: Optional[jnp.ndarray] = None
        self.pos_embeds: Optional[jnp.ndarray] = None

    @property
    def neg_embeds(self) -> jnp.ndarray:
        # lazy: tokenizer construction needs the BPE vocab (GAGS_CLIP_BPE)
        if self._neg_embeds is None:
            self._neg_embeds = self.encode_text(list(DEFAULT_NEGATIVES))
        return self._neg_embeds

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Optional[CLIPConfig] = None, tokenizer=None):
        import torch

        cfg = cfg or CLIPConfig.vit_b_16()
        state = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        visual = load_alphaclip_state_dict(state, cfg)
        from gags_tpu.models.clip import load_openclip_state_dict

        text = {"params": load_openclip_state_dict(state, cfg)["params"]["text"]}
        return cls(cfg, visual, text, tokenizer)

    def encode_text(self, texts: Sequence[str]) -> jnp.ndarray:
        if self.tokenizer is None:
            from gags_tpu.models.tokenizer import ClipTokenizer

            self.tokenizer = ClipTokenizer()
        tokens = np.asarray(self.tokenizer(list(texts)))
        cl = self.cfg.context_length
        if tokens.shape[1] > cl:
            tokens = tokens[:, :cl]
        elif tokens.shape[1] < cl:
            tokens = np.pad(tokens, ((0, 0), (0, cl - tokens.shape[1])))
        emb = self._encode_txt(self.text_params, jnp.asarray(tokens))
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def set_positives(self, texts: Sequence[str]) -> None:
        self.pos_embeds = self.encode_text(texts)

    def encode_image(self, images: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
        """images (B,S,S,3) CLIP-normalised; alpha (B,S,S,1) mask_transform'd."""
        emb = self._encode_img(self.visual_params, images, alpha)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def get_relevancy(self, embeds: jnp.ndarray, positive_id: int) -> jnp.ndarray:
        assert self.pos_embeds is not None, "call set_positives first"
        return relevancy(
            embeds, self.pos_embeds[positive_id : positive_id + 1], self.neg_embeds
        )

    def get_max_across(self, sem_map: jnp.ndarray) -> jnp.ndarray:
        assert self.pos_embeds is not None, "call set_positives first"
        return max_across_levels(sem_map, self.pos_embeds, self.neg_embeds)
