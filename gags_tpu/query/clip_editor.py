"""CLIPEditor: CLIP text/image encoder with stochastic image augmentation.

Counterpart of the reference's `utils/clip_utils.py:9-58` (an OpenAI-CLIP
ViT-B/32 wrapper used for edit guidance): `encode_image(..., stochastic=k)`
scores k augmented views (random horizontal flip, colour jitter 0.1,
random rotation up to 20 deg bilinear, 3-tap Gaussian blur with sigma ~
U[0.01, 2], resize to the tower's input resolution) — averaging the
resulting normalised embeddings is the usual way to robustify CLIP guidance
for scene-editing losses. Augmentations are pure JAX (jit/vmap-able) with
an explicit PRNG key instead of torchvision's global RNG.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from gags_tpu.models.clip import CLIP, CLIPConfig, CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


def _rotate_bilinear(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate (H, W, C) about its centre by `angle` radians, bilinear,
    zero-filled corners (torchvision RandomRotation semantics)."""
    h, w = img.shape[0], img.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    sx = cx + (xx - cx) * ca - (yy - cy) * sa
    sy = cy + (xx - cx) * sa + (yy - cy) * ca
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def at(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                jnp.clip(xi, 0, w - 1).astype(jnp.int32)]
        return jnp.where(inside[..., None], v, 0.0)

    out = (
        at(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
        + at(y0, x0 + 1) * (fx * (1 - fy))[..., None]
        + at(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
        + at(y0 + 1, x0 + 1) * (fx * fy)[..., None]
    )
    return out


def _gaussian_blur3(img: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """3-tap separable Gaussian blur with reflect padding (kernel_size=3)."""
    x = jnp.exp(-0.5 / jnp.maximum(sigma, 1e-6) ** 2)
    k = jnp.stack([x, jnp.ones(()), x])
    k = k / jnp.sum(k)
    pad_h = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode="reflect")
    img = (
        pad_h[:-2] * k[0] + pad_h[1:-1] * k[1] + pad_h[2:] * k[2]
    )
    pad_w = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="reflect")
    return pad_w[:, :-2] * k[0] + pad_w[:, 1:-1] * k[1] + pad_w[:, 2:] * k[2]


def augment_image(
    img: jnp.ndarray,  # (H, W, 3) float in [0, 1]
    key: jax.Array,
    out_size: int,
    jitter: float = 0.1,
    max_rot_deg: float = 20.0,
) -> jnp.ndarray:
    """One stochastic view: flip/jitter/rotate/blur/resize (un-normalised)."""
    k_flip, k_b, k_c, k_s, k_rot, k_blur = jax.random.split(key, 6)
    img = jnp.where(jax.random.bernoulli(k_flip), img[:, ::-1], img)
    # colour jitter: brightness/contrast/saturation factors ~ U[1-j, 1+j]
    fb = jax.random.uniform(k_b, minval=1 - jitter, maxval=1 + jitter)
    fc = jax.random.uniform(k_c, minval=1 - jitter, maxval=1 + jitter)
    fs = jax.random.uniform(k_s, minval=1 - jitter, maxval=1 + jitter)
    img = jnp.clip(img * fb, 0.0, 1.0)
    img = jnp.clip((img - img.mean()) * fc + img.mean(), 0.0, 1.0)
    grey = img.mean(axis=-1, keepdims=True)
    img = jnp.clip(grey + (img - grey) * fs, 0.0, 1.0)
    ang = jax.random.uniform(
        k_rot, minval=-max_rot_deg, maxval=max_rot_deg
    ) * (jnp.pi / 180.0)
    img = _rotate_bilinear(img, ang)
    sigma = jax.random.uniform(k_blur, minval=0.01, maxval=2.0)
    img = _gaussian_blur3(img, sigma)
    return jax.image.resize(img, (out_size, out_size, 3), "cubic")


class CLIPEditor:
    """CLIP encoder with augmentation-averaged image embeddings.

    Holds a (converted) CLIP tower; `encode_text` matches the reference's
    normalised text features; `encode_image(..., stochastic=k, key=...)`
    returns the k normalised per-view embeddings (callers average or score
    them individually, like the reference's edit-guidance loop).
    """

    def __init__(self, cfg: CLIPConfig, params, tokenizer=None):
        self.cfg = cfg
        self.model = CLIP(cfg)
        self.params = params
        self.tokenizer = tokenizer
        # params passed per call: closing over them would bake the whole
        # tower into the jaxpr as constants and freeze later param updates
        self._enc_img = jax.jit(
            lambda p, imgs: self.model.apply(p, imgs, method="encode_image")
        )
        self._enc_txt = jax.jit(
            lambda p, toks: self.model.apply(p, toks, method="encode_text")
        )

    def encode_text(self, texts: Sequence[str]) -> jnp.ndarray:
        assert self.tokenizer is not None, "tokenizer required for raw text"
        toks = jnp.asarray([self.tokenizer(t) for t in texts])
        emb = self._enc_txt(self.params, toks)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_image(
        self,
        image: jnp.ndarray,  # (H, W, 3) float in [0, 1]
        stochastic: int = 0,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Returns (max(stochastic, 1), D) normalised embeddings."""
        size = self.cfg.image_size
        if stochastic:
            assert key is not None, "stochastic augmentation needs a PRNG key"
            keys = jax.random.split(key, stochastic)
            views = jax.vmap(
                lambda k: augment_image(image, k, size)
            )(keys)
        else:
            views = jax.image.resize(image, (size, size, 3), "cubic")[None]
        views = (views - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        emb = self._enc_img(self.params, views)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
