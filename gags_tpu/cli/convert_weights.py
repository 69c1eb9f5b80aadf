"""Real-checkpoint converter self-check.

Given the actual upstream files the reference pipeline loads
(`sam_vit_h_4b8939.pth` — preprocess.py:526; OpenCLIP ViT-B-16
laion2b_s34b_b88k / AlphaCLIP ViT-L/14@336 — preprocess.py:52-60,
eval/alphaclip_encoder.py), this tool:

  1. diffs the file's key/shape inventory against the expected real layout
     (`models/ckpt_inventory.py`) — catches upstream layout surprises;
  2. runs the converter and shape-diffs the result against the flax
     model's own init tree — catches naming/transpose drift;
  3. optionally (--forward) runs one forward pass and, when the
     HF-transformers reference replicas are importable, compares outputs
     against torch on the SAME real weights.

Usage:
  python -m gags_tpu.cli.convert_weights --sam ckpts/sam_vit_h_4b8939.pth \
      --openclip ckpts/open_clip_pytorch_model.bin [--forward]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _inventory_diff(name, sd_shapes, expected):
    missing = sorted(set(expected) - set(sd_shapes))
    extra = sorted(set(sd_shapes) - set(expected))
    mismatched = sorted(
        k for k in set(expected) & set(sd_shapes)
        if tuple(expected[k]) != tuple(sd_shapes[k])
    )
    ok = not (missing or mismatched)
    print(f"[{name}] inventory: {len(sd_shapes)} keys; "
          f"missing={len(missing)} extra={len(extra)} mismatched={len(mismatched)}")
    for k in missing[:5]:
        print(f"  missing from file: {k} {tuple(expected[k])}")
    for k in mismatched[:5]:
        print(f"  shape mismatch: {k} file={sd_shapes[k]} expected={tuple(expected[k])}")
    for k in extra[:5]:
        print(f"  extra in file (unused): {k} {sd_shapes[k]}")
    return ok


def _tree_shape_check(name, conv, model_init_shapes):
    from gags_tpu.models import ckpt_inventory as inv
    import jax

    got = {
        jax.tree_util.keystr(k): tuple(np.shape(v))
        for k, v in jax.tree_util.tree_flatten_with_path(conv)[0]
    }
    problems = inv.diff_shapes(got, model_init_shapes)
    if problems:
        print(f"[{name}] converted-tree check FAILED:")
        for p in problems[:10]:
            print("  " + p)
        return False
    print(f"[{name}] converted tree matches model init ({len(got)} leaves)")
    return True


def _model_shapes(model, *args):
    import jax

    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    return {
        jax.tree_util.keystr(k): tuple(v.shape)
        for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]
    }


def check_sam(path: str, forward: bool) -> bool:
    import jax.numpy as jnp
    import torch

    from gags_tpu.models import ckpt_inventory as inv
    from gags_tpu.models.sam import SAM, SAMConfig
    from gags_tpu.models.sam_weights import load_sam_state_dict

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    shapes = {k: tuple(v.shape) for k, v in sd.items()}
    dim = shapes.get("image_encoder.patch_embed.proj.weight", (0,))[0]
    cfg = {768: SAMConfig.vit_b, 1024: SAMConfig.vit_l, 1280: SAMConfig.vit_h}[dim]()
    print(f"[sam] detected encoder_dim={dim}")
    ok = _inventory_diff("sam", shapes, inv.sam_inventory(cfg))

    conv = load_sam_state_dict(sd, cfg)
    import jax

    img = jax.ShapeDtypeStruct((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    pts = jax.ShapeDtypeStruct((2, 1, 2), jnp.float32)
    lbl = jax.ShapeDtypeStruct((2, 1), jnp.int32)
    model = SAM(cfg)
    ok &= _tree_shape_check("sam", conv, _model_shapes(model, img, pts, lbl))

    if forward and ok:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, cfg.image_size, cfg.image_size, 3)).astype(np.float32))
        emb = model.apply(jax.tree.map(jnp.asarray, conv), x, method="encode_image")
        print(f"[sam] forward ok: image embedding {emb.shape}, "
              f"|emb| mean {float(jnp.abs(emb).mean()):.4f}")
        try:
            import os

            repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            if repo_root not in sys.path:
                sys.path.insert(0, repo_root)
            from tests.test_sam_tower_parity import _hf_model  # type: ignore

            hf = _hf_model({k: np.asarray(v, np.float32) for k, v in sd.items()}, cfg)
            with torch.no_grad():
                ref = hf.vision_encoder(
                    torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
                )[0].numpy().transpose(0, 2, 3, 1)
            err = float(np.max(np.abs(np.asarray(emb) - ref)))
            print(f"[sam] encoder vs HF-transformers on real weights: max|diff|={err:.2e}")
            ok &= err < 5e-3
        except Exception as e:  # replica optional — report and move on
            print(f"[sam] torch comparison skipped: {type(e).__name__}: {e}")
    return ok


def check_openclip(path: str, forward: bool) -> bool:
    import jax
    import jax.numpy as jnp
    import torch

    from gags_tpu.models import ckpt_inventory as inv
    from gags_tpu.models.clip import CLIP, CLIPConfig, load_openclip_state_dict

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    state = {k.replace("module.", ""): v for k, v in state.items()}
    cfg = CLIPConfig.vit_b_16()
    shapes = {k: tuple(v.shape) for k, v in state.items()}
    ok = _inventory_diff("openclip", shapes, inv.openclip_inventory(cfg))

    conv = load_openclip_state_dict(state, cfg)
    model = CLIP(cfg)
    imgs = jax.ShapeDtypeStruct((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    toks = jax.ShapeDtypeStruct((1, cfg.context_length), jnp.int32)
    ok &= _tree_shape_check("openclip", conv, _model_shapes(model, imgs, toks))

    if forward and ok:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, cfg.image_size, cfg.image_size, 3)).astype(np.float32))
        emb = model.apply(jax.tree.map(jnp.asarray, conv), x, method="encode_image")
        print(f"[openclip] forward ok: {emb.shape}, norm {float(jnp.linalg.norm(emb)):.4f}")
    return ok


def check_alphaclip(path: str, forward: bool) -> bool:
    import jax
    import jax.numpy as jnp
    import torch

    from gags_tpu.models import ckpt_inventory as inv
    from gags_tpu.models.clip import (
        CLIPConfig, VisionTowerAlpha, load_alphaclip_state_dict,
    )

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    state = {k.replace("module.", ""): v for k, v in state.items()}
    cfg = CLIPConfig.vit_l_14_336()
    shapes = {
        k: tuple(v.shape) for k, v in state.items() if k.startswith("visual.")
    }
    ok = _inventory_diff("alphaclip", shapes, inv.alphaclip_visual_inventory(cfg))

    conv = load_alphaclip_state_dict(state, cfg)
    model = VisionTowerAlpha(cfg)
    imgs = jax.ShapeDtypeStruct((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    alph = jax.ShapeDtypeStruct((1, cfg.image_size, cfg.image_size, 1), jnp.float32)
    ok &= _tree_shape_check("alphaclip", conv, _model_shapes(model, imgs, alph))

    if forward and ok:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, cfg.image_size, cfg.image_size, 3)).astype(np.float32))
        a = jnp.ones((1, cfg.image_size, cfg.image_size, 1), jnp.float32)
        emb = model.apply(jax.tree.map(jnp.asarray, conv), x, a)
        print(f"[alphaclip] forward ok: {emb.shape}")
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sam", help="path to sam_vit_{b,l,h}*.pth")
    ap.add_argument("--openclip", help="path to open_clip ViT-B-16 checkpoint")
    ap.add_argument("--alphaclip", help="path to alpha_clip ViT-L/14@336 checkpoint")
    ap.add_argument("--forward", action="store_true",
                    help="also run a forward pass (and torch comparison when available)")
    args = ap.parse_args(argv)

    if not (args.sam or args.openclip or args.alphaclip):
        ap.error("supply at least one of --sam/--openclip/--alphaclip")
    ok = True
    if args.sam:
        ok &= check_sam(args.sam, args.forward)
    if args.openclip:
        ok &= check_openclip(args.openclip, args.forward)
    if args.alphaclip:
        ok &= check_alphaclip(args.alphaclip, args.forward)
    print("ALL OK" if ok else "FAILURES — see above")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
