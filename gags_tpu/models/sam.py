"""Segment-Anything (SAM) in flax — image encoder, prompt encoder, mask
decoder.

TPU-native replacement for the reference's forked PyTorch SAM ViT-H
(`preprocess.py:8,554`, `.gitmodules:5-7`): point prompts are processed in
large static batches under jit instead of the reference's 64-point python
loop, and the three per-prompt mask outputs (subpart/part/whole) feed the
granularity bucketing in `gags_tpu.gas.generator`.

Weights: `load_sam_state_dict()` converts a standard `sam_vit_*.pth` torch
checkpoint. Tests use `SAMConfig.tiny()`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    image_size: int = 1024
    patch_size: int = 16
    encoder_dim: int = 1280          # ViT-H
    encoder_depth: int = 32
    encoder_heads: int = 16
    window_size: int = 14
    global_attn_idx: Tuple[int, ...] = (7, 15, 23, 31)
    prompt_dim: int = 256
    decoder_heads: int = 8
    decoder_depth: int = 2
    mask_tokens: int = 4             # 1 "whole" + 3 multimask outputs

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def vit_h() -> "SAMConfig":
        return SAMConfig()

    @staticmethod
    def vit_l() -> "SAMConfig":
        return SAMConfig(
            encoder_dim=1024, encoder_depth=24, encoder_heads=16,
            global_attn_idx=(5, 11, 17, 23),
        )

    @staticmethod
    def vit_b() -> "SAMConfig":
        return SAMConfig(
            encoder_dim=768, encoder_depth=12, encoder_heads=12,
            global_attn_idx=(2, 5, 8, 11),
        )

    @staticmethod
    def tiny() -> "SAMConfig":
        return SAMConfig(
            image_size=64, patch_size=8, encoder_dim=32, encoder_depth=2,
            encoder_heads=2, window_size=4, global_attn_idx=(1,),
            prompt_dim=16, decoder_heads=2, decoder_depth=2,
        )


def _rel_pos_bias(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """(q, k) decomposed relative position table lookup (SAM convention)."""
    max_rel = 2 * max(q_size, k_size) - 1
    # rel_pos is (L, head_dim); interpolate if needed (we assume L == max_rel)
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]  # (q, k, head_dim)


def _blocked_rel_attention(q, k, v, rh, rw, h, w, row_block):
    """Flash-style attention with SAM's decomposed rel-pos bias, blocked
    over ROWS of the token grid — nothing (HW, HW)-shaped is materialised.

    q/k/v: (B, n_heads, H*W, hd) pre-scaled q; rh: (h, h, hd); rw:
    (w, w, hd). Blocks are `row_block` grid rows (row_block*w tokens), so a
    block's bias decomposes exactly: bias_h needs only the (rb, rb, hd)
    slice of rh between the query and key row ranges, and bias_w the full
    (w, w, hd) rw. Online softmax (running max/denominator) over key
    blocks — the memory-bound fix for the 4096-token global blocks, which
    at ViT-H scale cost (B, 16, 4096, 4096) f32 = 1 GB per materialised
    intermediate and OOM'd bf16 batch-4 on one v5e.
    """
    b, n, hw, hd = q.shape
    nb = h // row_block
    qb = row_block * w
    q6 = q.reshape(b, n, nb, row_block, w, hd)
    k6 = k.reshape(b, n, nb, row_block, w, hd)
    v6 = v.reshape(b, n, nb, row_block * w, hd)

    def one_q_block(qi):
        q_blk = q6[:, :, qi]  # (b, n, rb, w, hd)
        rh_q = jax.lax.dynamic_slice(
            rh, (qi * row_block, 0, 0), (row_block, h, hd)
        )  # (rb, h, hd)
        bias_w = jnp.einsum("bnqwc,wkc->bnqwk", q_blk, rw)  # (b,n,rb,w,w)

        def k_step(carry, kj):
            m, l, acc = carry
            k_blk = jax.lax.dynamic_index_in_dim(k6, kj, 2, keepdims=False)
            v_blk = jax.lax.dynamic_index_in_dim(v6, kj, 2, keepdims=False)
            s = jnp.einsum("bnqwc,bnkvc->bnqwkv", q_blk, k_blk)
            rh_qk = jax.lax.dynamic_slice(
                rh_q, (0, kj * row_block, 0), (row_block, row_block, hd)
            )
            bias_h = jnp.einsum("bnqwc,qkc->bnqwk", q_blk, rh_qk)
            s = s + bias_h[..., :, None] + bias_w[..., None, :]
            s = s.reshape(b, n, qb, qb)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.einsum("bnqk,bnkc->bnqc", p, v_blk)
            return (m_new, l, acc), None

        init = (
            jnp.full((b, n, qb, 1), -jnp.inf, q.dtype),
            jnp.zeros((b, n, qb, 1), q.dtype),
            jnp.zeros((b, n, qb, hd), q.dtype),
        )
        (m, l, acc), _ = jax.lax.scan(
            k_step, init, jnp.arange(nb, dtype=jnp.int32)
        )
        return acc / l

    out = jnp.concatenate([one_q_block(qi) for qi in range(nb)], axis=2)
    return out  # (b, n, hw, hd)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    use_rel_pos: bool = True
    input_hw: Tuple[int, int] = (14, 14)
    # grids with at least this many tokens use the blocked (flash-style)
    # path — i.e. the global-attention blocks at ViT scale (64x64 = 4096)
    blocked_min_tokens: int = 2048

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C) — one attention over the full H*W grid."""
        b, h, w, c = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x).reshape(b, h * w, 3, self.heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # (B,hds,HW,hd)
        scale = 1.0 / jnp.sqrt(hd).astype(x.dtype)
        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * h - 1, hd)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * w - 1, hd)
            )
            rh = _rel_pos_bias(h, h, rel_h)  # (h, h, hd)
            rw = _rel_pos_bias(w, w, rel_w)  # (w, w, hd)
        if (
            self.use_rel_pos
            and h * w >= self.blocked_min_tokens
            and h % 8 == 0
        ):
            # scale folded into K so the rel-pos biases see UNSCALED q
            # (segment-anything's add_decomposed_rel_pos convention)
            out = _blocked_rel_attention(q, k * scale, v, rh, rw, h, w, 8)
            out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
            return nn.Dense(self.dim, name="proj")(out)
        att = (q @ k.transpose(0, 1, 3, 2)) * scale
        if self.use_rel_pos:
            qr = q.reshape(b, self.heads, h, w, hd)
            bias_h = jnp.einsum("bnhwc,hkc->bnhwk", qr, rh)  # (B,hds,h,w,h)
            bias_w = jnp.einsum("bnhwc,wkc->bnhwk", qr, rw)  # (B,hds,h,w,w)
            att = att.reshape(b, self.heads, h, w, h, w)
            att = att + bias_h[..., :, None] + bias_w[..., None, :]
            att = att.reshape(b, self.heads, h * w, h * w)
        att = jax.nn.softmax(att, axis=-1)
        out = (att @ v).transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


def _window_partition(x, win):
    b, h, w, c = x.shape
    ph = (win - h % win) % win
    pw = (win - w % win) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)
    return x, (hp, wp)


def _window_unpartition(x, win, padded_hw, hw):
    hp, wp = padded_hw
    h, w = hw
    b = x.shape[0] // (hp // win * wp // win)
    x = x.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class EncoderBlock(nn.Module):
    cfg: SAMConfig
    window: int  # 0 = global attention

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
        if self.window > 0:
            hw = (h.shape[1], h.shape[2])
            h, padded = _window_partition(h, self.window)
            h = WindowAttention(c.encoder_dim, c.encoder_heads, name="attn")(h)
            h = _window_unpartition(h, self.window, padded, hw)
        else:
            h = WindowAttention(c.encoder_dim, c.encoder_heads, name="attn")(h)
        x = shortcut + h
        h = nn.LayerNorm(epsilon=1e-6, name="ln_2")(x)
        h = nn.Dense(4 * c.encoder_dim, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.encoder_dim, name="mlp_fc2")(h)
        return x + h


class ImageEncoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, S, S, 3) SAM-normalised → (B, grid, grid, 256)."""
        c = self.cfg
        x = nn.Conv(
            c.encoder_dim, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), name="patch_embed",
        )(images)
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, c.grid, c.grid, c.encoder_dim)
        )
        x = x + pos
        for i in range(c.encoder_depth):
            win = 0 if i in c.global_attn_idx else c.window_size
            x = EncoderBlock(c, win, name=f"block{i}")(x)
        # neck: 1x1 conv → LN → 3x3 conv → LN, to prompt_dim channels
        x = nn.Conv(c.prompt_dim, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(c.prompt_dim, (3, 3), padding=1, use_bias=False, name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x


class LayerNorm2d(nn.Module):
    """Channel-wise LN over the last axis (SAM's LayerNorm2d, eps 1e-6)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + self.eps) * w + b


class PromptEncoder(nn.Module):
    cfg: SAMConfig

    def setup(self):
        d = self.cfg.prompt_dim
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, d // 2)
        )
        self.point_embed_pos = self.param(
            "point_embed_pos", nn.initializers.normal(1.0), (d,)
        )
        self.point_embed_neg = self.param(
            "point_embed_neg", nn.initializers.normal(1.0), (d,)
        )
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0), (d,)
        )
        self.no_mask = self.param("no_mask", nn.initializers.normal(1.0), (d,))

    def pe_encode(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords normalised to [0,1]^2, (..., 2) → (..., prompt_dim)."""
        x = 2.0 * coords - 1.0
        # coordinate-critical K=2 matmul: TPU's default bf16 pass would
        # jitter point positions by ~0.4% of the image — pin true f32
        x = jnp.matmul(x, self.pe_gaussian, precision=jax.lax.Precision.HIGHEST)
        x = 2.0 * jnp.pi * x
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)

    def dense_pe(self, grid: int) -> jnp.ndarray:
        ys = (jnp.arange(grid) + 0.5) / grid
        xs = (jnp.arange(grid) + 0.5) / grid
        coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)  # (g, g, 2)
        return self.pe_encode(coords)

    def __call__(self, points: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """points (B, P, 2) in [0,1]; labels (B, P) in {-1 pad, 0 neg, 1 pos}.
        Returns sparse prompt embeddings (B, P+1, d) (with the implicit
        padding point SAM appends when no box is given)."""
        b, p, _ = points.shape
        pts = jnp.concatenate([points, jnp.zeros((b, 1, 2))], axis=1)
        lbl = jnp.concatenate([labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
        emb = self.pe_encode(pts)
        emb = jnp.where((lbl == -1)[..., None], self.not_a_point, emb)
        emb = jnp.where((lbl == 0)[..., None], emb + self.point_embed_neg, emb)
        emb = jnp.where((lbl == 1)[..., None], emb + self.point_embed_pos, emb)
        return emb


class TwoWayAttention(nn.Module):
    dim: int
    heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample
        hd = d // self.heads

        def split(t, proj):
            t = proj(t)
            return t.reshape(t.shape[0], t.shape[1], self.heads, hd).transpose(0, 2, 1, 3)

        qq = split(q, nn.Dense(d, name="q_proj"))
        kk = split(k, nn.Dense(d, name="k_proj"))
        vv = split(v, nn.Dense(d, name="v_proj"))
        att = jax.nn.softmax((qq @ kk.transpose(0, 1, 3, 2)) / jnp.sqrt(hd), -1)
        out = (att @ vv).transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], d)
        return nn.Dense(self.dim, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    cfg: SAMConfig
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        c = self.cfg
        if self.skip_first_pe:
            # first layer REPLACES queries (no residual) — segment-anything's
            # TwoWayAttentionBlock skip_first_layer_pe branch
            queries = TwoWayAttention(c.prompt_dim, c.decoder_heads, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            attn_out = TwoWayAttention(c.prompt_dim, c.decoder_heads, name="self_attn")(
                q, q, queries
            )
            queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, name="ln1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = TwoWayAttention(
            c.prompt_dim, c.decoder_heads, 2, name="cross_t2i"
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="ln2")(queries + attn_out)

        h = nn.Dense(8 * c.prompt_dim, name="mlp_fc1")(queries)
        h = nn.relu(h)
        h = nn.Dense(c.prompt_dim, name="mlp_fc2")(h)
        queries = nn.LayerNorm(epsilon=1e-5, name="ln3")(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = TwoWayAttention(
            c.prompt_dim, c.decoder_heads, 2, name="cross_i2t"
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="ln4")(keys + attn_out)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse_prompts):
        """image_embed (B, g, g, d); image_pe (g, g, d); sparse (B, P, d).

        Returns (masks (B, 4, 4g, 4g) low-res logits, iou_pred (B, 4)).
        Mask channel order = [whole-score slot, sub-part, part, whole]
        (SAM's output_tokens; multimask channels are 1..3).
        """
        c = self.cfg
        b, g, _, d = image_embed.shape
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, d))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (c.mask_tokens, d)
        )
        tokens = jnp.concatenate([iou_token, mask_tokens], 0)  # (5, d)
        tokens = jnp.broadcast_to(tokens, (b, *tokens.shape))
        tokens = jnp.concatenate([tokens, sparse_prompts], axis=1)  # (B, 5+P, d)

        src = image_embed.reshape(b, g * g, d)
        pe = image_pe.reshape(1, g * g, d)
        pe = jnp.broadcast_to(pe, src.shape)

        q, k = tokens, src
        for i in range(c.decoder_depth):
            q, k = TwoWayBlock(c, skip_first_pe=(i == 0), name=f"block{i}")(
                q, k, tokens, pe
            )
        # final token-to-image attention
        attn = TwoWayAttention(c.prompt_dim, c.decoder_heads, 2, name="final_t2i")(
            q + tokens, k + pe, k
        )
        q = nn.LayerNorm(epsilon=1e-5, name="ln_final")(q + attn)

        iou_out = q[:, 0]
        mask_out = q[:, 1 : 1 + c.mask_tokens]  # (B, 4, d)

        # upscale image features 4x
        up = k.reshape(b, g, g, d)
        up = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2), name="up1")(up)
        up = LayerNorm2d(name="up_ln")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2), name="up2")(up)
        up = nn.gelu(up, approximate=False)  # (B, 4g, 4g, d/8)

        # hypernetwork MLPs per mask token
        hyper = []
        for i in range(c.mask_tokens):
            h = mask_out[:, i]
            for j in range(2):
                h = nn.relu(nn.Dense(d, name=f"hyper{i}_fc{j}")(h))
            hyper.append(nn.Dense(d // 8, name=f"hyper{i}_out")(h))
        hyper = jnp.stack(hyper, 1)  # (B, 4, d/8)

        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, up)

        iou_head = iou_out
        for j in range(2):
            iou_head = nn.relu(nn.Dense(d, name=f"iou_fc{j}")(iou_head))
        iou_pred = nn.Dense(c.mask_tokens, name="iou_out")(iou_head)
        return masks, iou_pred


class SAM(nn.Module):
    cfg: SAMConfig

    def setup(self):
        self.image_encoder = ImageEncoder(self.cfg)
        self.prompt_encoder = PromptEncoder(self.cfg)
        self.mask_decoder = MaskDecoder(self.cfg)

    def encode_image(self, images):
        return self.image_encoder(images)

    def decode(self, image_embed, points, labels):
        """image_embed (1, g, g, d) for one image; points (B, P, 2) in [0,1].

        Returns (masks (B, 4, 4g, 4g), iou_pred (B, 4)).
        """
        sparse = self.prompt_encoder(points, labels)
        pe = self.prompt_encoder.dense_pe(image_embed.shape[1])
        # the no-mask dense prompt embedding is always added when no mask
        # prompt is given (segment-anything's dense_embeddings path)
        embed = image_embed + self.prompt_encoder.no_mask
        embed = jnp.broadcast_to(embed, (points.shape[0], *image_embed.shape[1:]))
        return self.mask_decoder(embed, pe, sparse)

    def __call__(self, images, points, labels):
        emb = self.encode_image(images)
        return self.decode(emb[:1], points, labels)


SAM_IMAGE_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_IMAGE_STD = np.array([58.395, 57.12, 57.375], np.float32)


def resize_geometry(h: int, w: int, size: int = 1024) -> Tuple[int, int]:
    """(nh, nw) of ResizeLongestSide — the pure geometry part of
    preprocess_sam_image, for callers holding a precomputed embedding."""
    scale = size / max(h, w)
    return int(round(h * scale)), int(round(w * scale))


def preprocess_sam_image(img: np.ndarray, size: int = 1024) -> Tuple[np.ndarray, Tuple[int, int]]:
    """uint8 (H, W, 3) → (1, size, size, 3) normalised, long side = size,
    zero-padded bottom/right (SAM's ResizeLongestSide + pad)."""
    h, w = img.shape[:2]
    nh, nw = resize_geometry(h, w, size)
    from PIL import Image as PILImage

    resized = np.asarray(
        PILImage.fromarray(img).resize((nw, nh), PILImage.BILINEAR), np.float32
    )
    resized = (resized - SAM_IMAGE_MEAN) / SAM_IMAGE_STD
    out = np.zeros((size, size, 3), np.float32)
    out[:nh, :nw] = resized
    return out[None], (nh, nw)
