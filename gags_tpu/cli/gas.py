"""GAS stage C CLI: SAM masks + CLIP mask embeddings → language features.

Counterpart of the reference `preprocess.py` main (`--mindepth_mode` path,
GAS.sh:45-49): per image, build depth-adaptive point prompts from the
rendered depth + min-depth samples, run the 4-granularity automatic mask
generator, NMS-filter, CLIP-embed every mask crop in one batch, and write
`language_features/<img>_{f,s}.npy`.

Requires user-supplied checkpoints (offline build has none):
  --sam_ckpt sam_vit_h_4b8939.pth   --clip_ckpt ViT-B-16 open_clip .pt

  python -m gags_tpu.cli.gas -s <scene> -m <model_dir> --iteration 30000 \
      --sam_ckpt ... --clip_ckpt ...
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from gags_tpu.gas import masks as gm
from gags_tpu.gas.generator import AutomaticMaskGenerator, GeneratorConfig
from gags_tpu.gas.prompts import build_all_layer_mindepth_point_grids
from gags_tpu.scene.dataset import detect_and_load


def load_image_1080p(path: str) -> np.ndarray:
    """Load + downscale so the long side is <= 1080 px landscape-equivalent
    (reference preprocess.py:564-582 caps at 1080p)."""
    img = Image.open(path).convert("RGB")
    w, h = img.size
    if h > 1080:
        scale = 1080 / h
        img = img.resize((int(round(w * scale)), 1080), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("--sam_ckpt", required=True)
    p.add_argument("--clip_ckpt", required=True)
    p.add_argument("--sam_arch", default="vit_h", choices=["vit_h", "vit_l", "vit_b"])
    p.add_argument("--points_per_batch", type=int, default=256)
    p.add_argument("--seed", type=int, default=42)
    # encoder throughput knobs (r4 battery: bf16 batch-4 = 106 ms/img vs
    # 154 single-image f32 on one v5e). Defaults preserve f32 parity.
    p.add_argument("--encoder_batch", type=int, default=1,
                   help="images per ViT-encoder batch (4 = measured sweet "
                        "spot with --bf16; the AMG loop stays per-image)")
    p.add_argument("--bf16", action="store_true",
                   help="cast SAM+CLIP params to bfloat16 (mask/embed "
                        "numerics shift ~1e-2; thresholded masks are "
                        "insensitive at that scale)")
    args = p.parse_args()

    from gags_tpu.models.sam import SAM, SAMConfig
    from gags_tpu.models.sam_weights import load_sam_checkpoint
    from gags_tpu.models.clip import CLIP, load_openclip_checkpoint, preprocess_images

    sam_cfg = getattr(SAMConfig, args.sam_arch)()
    sam_params, sam_cfg = load_sam_checkpoint(args.sam_ckpt, sam_cfg)
    sam = SAM(sam_cfg)

    def _cast_bf16(tree):
        import jax.numpy as _jnp

        return jax.tree.map(
            lambda a: a.astype(_jnp.bfloat16)
            if getattr(a, "dtype", None) == _jnp.float32 else a,
            tree,
        )

    if args.bf16:
        sam_params = _cast_bf16(sam_params)
    gen = AutomaticMaskGenerator(
        sam, sam_params, sam_cfg,
        GeneratorConfig(points_per_batch=args.points_per_batch),
    )

    clip_params, clip_cfg = load_openclip_checkpoint(args.clip_ckpt)
    if args.bf16:
        clip_params = _cast_bf16(clip_params)
    clip = CLIP(clip_cfg)
    embed_crops = jax.jit(
        lambda imgs: clip.apply(clip_params, method="encode_image", images=imgs)
    )

    info = detect_and_load(args.source_path, foundation_model="none")
    depth_dir = os.path.join(args.model_path, "train", f"ours_{args.iteration}", "depth")
    sample_dir = os.path.join(args.source_path, "depths_sample")
    out_dir = os.path.join(args.source_path, "language_features")
    os.makedirs(out_dir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    from gags_tpu.gas.data_utils import resize_map

    cams = list(info.train_cameras)
    eb = max(1, args.encoder_batch)
    for g0 in range(0, len(cams), eb):
        group = cams[g0 : g0 + eb]
        work = []
        for ci in group:
            name = os.path.splitext(ci.name)[0]
            image = load_image_1080p(ci.image_path)
            h, w = image.shape[:2]
            depth = np.load(os.path.join(depth_dir, name + "_depth.npy"))
            sample = np.load(
                os.path.join(sample_dir, name + "_depth_sample.npy")
            )
            # depth maps may be at a different res than the (<=1080p) image
            depth = resize_map(depth, (h, w))
            sample = resize_map(sample, (h, w), nearest=True)

            grids = build_all_layer_mindepth_point_grids(
                n_per_side=8, n_layers=0, scale_per_layer=1,
                nsample_min_distance=4, depth_map=depth,
                depth_sample=sample, rng=rng,
            )
            work.append((name, image, grids))
        # one batched ViT-encoder pass per group (pad_to keeps a single
        # compilation across the dataset's final partial group)
        im_embeds = (
            gen.encode_images([wk[1] for wk in work], pad_to=eb)
            if eb > 1 else [None] * len(work)
        )
        yield_items = [
            (name, image, grids, emb)
            for (name, image, grids), emb in zip(work, im_embeds)
        ]
        _process_group(yield_items, gen, embed_crops, clip_cfg, out_dir)


def _process_group(items, gen, embed_crops, clip_cfg, out_dir):
    from gags_tpu.models.clip import preprocess_images

    for name, image, grids, im_embed in items:
        h, w = image.shape[:2]
        levels = gen.generate(image, grids[0], embed=im_embed)
        levels = [
            gm.filter_masks(lvl, iou_thr=0.8, score_thr=0.7, inner_thr=0.5)
            for lvl in levels
        ]
        names = ["default", "s", "m", "l"]
        embeds, segs = {}, {}
        for lname, lvl in zip(names, levels):
            if not lvl:
                continue
            crops = gm.extract_mask_crops(lvl, image)  # (M, 224, 224, 3)
            e = np.asarray(
                embed_crops(preprocess_images(jnp.asarray(crops), clip_cfg.image_size))
            )
            e = e / np.linalg.norm(e, axis=-1, keepdims=True)
            embeds[lname] = e.astype(np.float16)
            segs[lname] = gm.masks_to_seg_map(lvl, (h, w))
        if not embeds:
            print(f"{name}: no masks survived, skipping")
            continue
        img_embed, seg_maps = gm.pack_granularities(embeds, segs)
        np.save(os.path.join(out_dir, name + "_f.npy"), img_embed)
        np.save(os.path.join(out_dir, name + "_s.npy"), seg_maps.astype(np.float32))
        print(f"{name}: {img_embed.shape[0]} masks")


if __name__ == "__main__":
    main()
