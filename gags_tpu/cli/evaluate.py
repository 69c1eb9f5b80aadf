"""IoU / localization eval CLI — counterpart of `evaluate_iou_loc.py`.

Requires: a trained model dir (PLY with semantic features + decoder
checkpoint), the scene, a labelme GT folder, and CLIP text embeddings. In
this offline environment CLIP text embeddings can alternatively be supplied
precomputed via --text_embeds (npz with 'labels', 'pos', 'neg').

Usage:
  python -m gags_tpu.cli.evaluate -m <model_dir> -s <scene_dir> \
      --gt_json <label_folder> --iteration 30000 --mask_thresh 0.4 \
      [--text_embeds embeds.npz | --clip_ckpt open_clip.pt --bpe vocab.gz]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.gad.train import GadConfig, create_train_state
from gags_tpu.gad.checkpoints import latest_checkpoint_step, load_checkpoint
from gags_tpu.query.eval_iou import (
    eval_frame_iou,
    eval_frame_localization,
    load_lerf_gt,
)
from gags_tpu.query.relevancy import DEFAULT_NEGATIVES
from gags_tpu.scene.dataset import detect_and_load, camera_from_info
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.render import render


def load_text_embeds(args, labels):
    if args.text_embeds:
        data = np.load(args.text_embeds, allow_pickle=True)
        stored = [str(l) for l in data["labels"]]
        idx = [stored.index(l) for l in labels]
        return data["pos"][idx], data["neg"]
    # encode with the JAX CLIP text tower from a user-supplied checkpoint
    from gags_tpu.models.clip import CLIP, load_openclip_checkpoint
    from gags_tpu.models.tokenizer import ClipTokenizer

    params, cfg = load_openclip_checkpoint(args.clip_ckpt)
    tok = ClipTokenizer(args.bpe)
    model = CLIP(cfg)
    enc = jax.jit(lambda t: model.apply(params, method="encode_text", tokens=t))
    pos = np.asarray(enc(jnp.asarray(tok(labels))))
    neg = np.asarray(enc(jnp.asarray(tok(list(DEFAULT_NEGATIVES)))))
    pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
    neg /= np.linalg.norm(neg, axis=-1, keepdims=True)
    return pos, neg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("--gt_json", required=True)
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("--mask_thresh", type=float, default=0.4)
    p.add_argument("--text_embeds", default="")
    p.add_argument("--clip_ckpt", default="")
    p.add_argument("--bpe", default="")
    args = p.parse_args()

    gt_ann, (gh, gw), _ = load_lerf_gt(args.gt_json)
    info = detect_and_load(args.source_path, foundation_model="none")

    ply = os.path.join(
        args.model_path, "point_cloud", f"iteration_{args.iteration}", "point_cloud.ply"
    )
    scene = GaussianScene.from_ply(ply)
    assert scene.semantic_features is not None, "PLY has no semantic features"

    import dataclasses as _dc
    from gags_tpu.splat.rasterizer import auto_config

    cfg = GadConfig.load(args.model_path, feature_dim=scene.semantic_features.shape[1])
    cfg = _dc.replace(cfg, raster=auto_config(
        # forward-only: the unaligned inference binning skips the SAT/dummy
        # passes and the gradient ReductionLayout (~3 ms/frame) entirely
        **{k: v for k, v in _dc.asdict(cfg.raster).items()
           if k not in ("interpret", "aligned")},
        aligned=False,
    ))
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    step = latest_checkpoint_step(args.model_path) or args.iteration
    state = load_checkpoint(args.model_path, step, state)
    dec = statics["decoder"]

    ious, loc_hits, loc_total = [], 0, 0
    results = {}
    for frame_idx, ann in sorted(gt_ann.items(), key=lambda kv: int(kv[0])):
        cam_info = info.train_cameras[int(frame_idx)]
        cam = camera_from_info(cam_info, resolution=-1)
        # render 16-dim features at GT label resolution (reference 252-260)
        import dataclasses as _dc

        cam = cam.resized(gw, gh)
        out = render(
            cam,
            means=scene.means,
            quats=scene.quats,
            scales=scene.scales,
            opacities=scene.opacities,
            semantic_features=state.features,
            feature_mode=True,
            bg_color=jnp.zeros((3,)),
            config=cfg.raster,
        )
        from gags_tpu.query.grounding import decode_map_rows

        decoded = decode_map_rows(dec.apply, state.decoder_params, out.render)

        labels = list(ann.keys())
        pos, neg = load_text_embeds(args, labels)
        frame_ious = eval_frame_iou(
            decoded, pos, neg, ann, labels, thresh=args.mask_thresh
        )
        hits = eval_frame_localization(decoded, pos, neg, ann, labels)
        ious.extend(frame_ious)
        loc_hits += hits
        loc_total += len(labels)
        results[frame_idx] = dict(labels=labels, ious=frame_ious, loc_hits=hits)
        print(f"frame {frame_idx}: mIoU {np.mean(frame_ious):.4f} loc {hits}/{len(labels)}")

    summary = dict(
        miou=float(np.mean(ious)) if ious else 0.0,
        loc_acc=loc_hits / max(loc_total, 1),
        frames=results,
    )
    out_path = os.path.join(args.model_path, f"iou_loc_{args.iteration}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"mIoU: {summary['miou']:.4f}  localization acc: {summary['loc_acc']:.4f}")


if __name__ == "__main__":
    main()
