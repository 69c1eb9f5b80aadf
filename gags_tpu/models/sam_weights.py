"""Convert a torch `sam_vit_*.pth` checkpoint into gags_tpu SAM params.

Key mapping follows the public segment-anything checkpoint layout. No
weights ship with this repo (offline build environment); call
`load_sam_checkpoint(path)` with a user-supplied file.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from gags_tpu.models.sam import SAMConfig


def _t(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


class _F32View:
    """Lazy float32 view over a torch/numpy state dict: converts values on
    key access instead of copying the whole dict upfront (the real ViT-H
    file is ~2.4 GB), and keeps key reads visible to wrapping mappings
    (ckpt_inventory.TrackingDict key-coverage tests)."""

    def __init__(self, state):
        self._state = state

    def __getitem__(self, k):
        return _t(self._state[k])

    def __contains__(self, k):
        return k in self._state


def load_sam_state_dict(sd: Dict[str, Any], cfg: SAMConfig) -> Dict:
    sd = _F32View(sd)

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def ln2d(prefix):
        return {"weight": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    enc: Dict[str, Any] = {
        "patch_embed": {
            "kernel": sd["image_encoder.patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd["image_encoder.patch_embed.proj.bias"],
        },
        "pos_embed": sd["image_encoder.pos_embed"],
        "neck_conv1": {
            "kernel": sd["image_encoder.neck.0.weight"].transpose(2, 3, 1, 0)
        },
        "neck_ln1": ln2d("image_encoder.neck.1"),
        "neck_conv2": {
            "kernel": sd["image_encoder.neck.2.weight"].transpose(2, 3, 1, 0)
        },
        "neck_ln2": ln2d("image_encoder.neck.3"),
    }
    for i in range(cfg.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        attn = {
            "qkv": dense(f"{p}.attn.qkv"),
            "proj": dense(f"{p}.attn.proj"),
        }
        if f"{p}.attn.rel_pos_h" in sd:
            attn["rel_pos_h"] = sd[f"{p}.attn.rel_pos_h"]
            attn["rel_pos_w"] = sd[f"{p}.attn.rel_pos_w"]
        enc[f"block{i}"] = {
            "ln_1": ln(f"{p}.norm1"),
            "attn": attn,
            "ln_2": ln(f"{p}.norm2"),
            "mlp_fc1": dense(f"{p}.mlp.lin1"),
            "mlp_fc2": dense(f"{p}.mlp.lin2"),
        }

    prm = {
        "pe_gaussian": sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
        "point_embed_neg": sd["prompt_encoder.point_embeddings.0.weight"][0],
        "point_embed_pos": sd["prompt_encoder.point_embeddings.1.weight"][0],
        "not_a_point": sd["prompt_encoder.not_a_point_embed.weight"][0],
        "no_mask": sd["prompt_encoder.no_mask_embed.weight"][0],
    }

    def two_way_attn(prefix):
        return {
            "q_proj": dense(f"{prefix}.q_proj"),
            "k_proj": dense(f"{prefix}.k_proj"),
            "v_proj": dense(f"{prefix}.v_proj"),
            "out_proj": dense(f"{prefix}.out_proj"),
        }

    decd: Dict[str, Any] = {
        "iou_token": sd["mask_decoder.iou_token.weight"],
        "mask_tokens": sd["mask_decoder.mask_tokens.weight"],
        "final_t2i": two_way_attn("mask_decoder.transformer.final_attn_token_to_image"),
        "ln_final": ln("mask_decoder.transformer.norm_final_attn"),
        # torch ConvTranspose2d == flax ConvTranspose with the kernel
        # spatially FLIPPED (flax does not flip; torch's adjoint does)
        "up1": {
            "kernel": np.ascontiguousarray(
                sd["mask_decoder.output_upscaling.0.weight"][:, :, ::-1, ::-1]
            ).transpose(2, 3, 0, 1),
            "bias": sd["mask_decoder.output_upscaling.0.bias"],
        },
        "up_ln": ln2d("mask_decoder.output_upscaling.1"),
        "up2": {
            "kernel": np.ascontiguousarray(
                sd["mask_decoder.output_upscaling.3.weight"][:, :, ::-1, ::-1]
            ).transpose(2, 3, 0, 1),
            "bias": sd["mask_decoder.output_upscaling.3.bias"],
        },
    }
    for i in range(cfg.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        decd[f"block{i}"] = {
            "self_attn": two_way_attn(f"{p}.self_attn"),
            "ln1": ln(f"{p}.norm1"),
            "cross_t2i": two_way_attn(f"{p}.cross_attn_token_to_image"),
            "ln2": ln(f"{p}.norm2"),
            "mlp_fc1": dense(f"{p}.mlp.lin1"),
            "mlp_fc2": dense(f"{p}.mlp.lin2"),
            "ln3": ln(f"{p}.norm3"),
            "cross_i2t": two_way_attn(f"{p}.cross_attn_image_to_token"),
            "ln4": ln(f"{p}.norm4"),
        }
    for i in range(cfg.mask_tokens):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}.layers"
        decd[f"hyper{i}_fc0"] = dense(f"{p}.0")
        decd[f"hyper{i}_fc1"] = dense(f"{p}.1")
        decd[f"hyper{i}_out"] = dense(f"{p}.2")
    p = "mask_decoder.iou_prediction_head.layers"
    decd["iou_fc0"] = dense(f"{p}.0")
    decd["iou_fc1"] = dense(f"{p}.1")
    decd["iou_out"] = dense(f"{p}.2")

    return {
        "params": {
            "image_encoder": enc,
            "prompt_encoder": prm,
            "mask_decoder": decd,
        }
    }


def load_sam_checkpoint(path: str, cfg: SAMConfig | None = None):
    import torch

    cfg = cfg or SAMConfig.vit_h()
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return load_sam_state_dict(sd, cfg), cfg
