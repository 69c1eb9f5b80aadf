"""Text-query relevancy CLI — counterpart of `compute_relvancy.py`.

Modes:
  --image_mode: per training/novel view, render features → decode → per
    prompt heat maps + thresholded mask composites (reference
    lerf_compute_relvancy, lines 146-271). With --video, renders along a
    B-spline interpolated camera path.
  --pcd_mode: per-Gaussian relevancy → thresholded, neighbour-smoothed 3D
    selection exported as a recoloured PLY (reference pcd_relvancy, lines
    273-394 — the interactive Open3D window is replaced by PLY export,
    viewable in any point-cloud viewer).

Text embeddings: --text_embeds npz (labels/pos/neg) or a CLIP checkpoint.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from gags_tpu.gad.train import GadConfig, create_train_state
from gags_tpu.gad.checkpoints import latest_checkpoint_step, load_checkpoint
from gags_tpu.query.relevancy import heatmap_to_mask, max_across_levels, majority_smooth
from gags_tpu.query.grounding import (
    decode_features_chunked,
    decode_map_rows,
    point_relevancy,
    select_gaussians,
)
from gags_tpu.scene.dataset import detect_and_load, camera_from_info
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.scene.ply import write_points3d_ply
from gags_tpu.splat.render import render
from gags_tpu.utils.campath import interpolate_path, novel_camera
from gags_tpu.utils.colormaps import turbo


def _save(path, img):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def load_text_embeds(args):
    data = np.load(args.text_embeds, allow_pickle=True)
    return [str(l) for l in data["labels"]], data["pos"], data["neg"]


def image_mode(args, scene, state, statics, info, raster_cfg=None):
    labels, pos, neg = load_text_embeds(args)
    dec = statics["decoder"]
    cams = [camera_from_info(ci, args.resolution) for ci in info.train_cameras]
    if args.video:
        viewmats = np.stack([np.asarray(c.viewmat) for c in cams])
        path = interpolate_path(np.linalg.inv(viewmats), args.video_frames)
        cams = [novel_camera(vm, cams[0], f"novel_{i:04d}") for i, vm in enumerate(path)]

    from gags_tpu.splat.rasterizer import auto_config

    cfg_r = raster_cfg if raster_cfg is not None else auto_config(aligned=False)
    if raster_cfg is None and not getattr(args, "autotune", False) and cams:
        # reuse a persisted tuned winner by default (relevancy is feature
        # rendering → the lossy bf16 contract is acceptable: golden e2e
        # shows relevancy IoU unchanged under blend_bf16)
        from gags_tpu.splat.autotune import load_persisted

        tuned = load_persisted(
            cams[0].width, cams[0].height, int(scene.means.shape[0]),
            int(state.features.shape[1]), allow_bf16=True,
        )
        if tuned is not None:
            import dataclasses as _dc

            if tuned.image_chw:  # decode_map_rows consumes HWC
                tuned = _dc.replace(tuned, image_chw=False)
            cfg_r = tuned
            print("# relevancy: persisted tuned config reused", flush=True)
    if getattr(args, "autotune", False) and cams:
        from gags_tpu.splat.autotune import autotune_config

        cfg_r = autotune_config(
            scene.means, scene.quats, scene.scales, scene.opacities,
            state.features, cams[0].viewmat, cams[0].K,
            cams[0].width, cams[0].height,
            base=cfg_r, allow_soa=True, verbose=True,
        )
    if cfg_r.soa_geom:
        from gags_tpu.splat.rasterizer import soa_geometry

        m_t, q_t, s_t = soa_geometry(scene.means, scene.quats, scene.scales)
        geo = dict(means=m_t, quats=q_t, scales=s_t)
    else:
        geo = dict(means=scene.means, quats=scene.quats, scales=scene.scales)

    out_dir = os.path.join(args.model_path, "relevancy")
    video_frames = {label: [] for label in labels} if args.video else None
    pos_j, neg_j = jnp.asarray(pos), jnp.asarray(neg)

    def dispatch(cam):
        """Enqueue one camera's render→decode→relevancy (async), so the
        per-label host work of frame i overlaps device work of i+1."""
        out = render(
            cam,
            **geo,
            opacities=scene.opacities, semantic_features=state.features,
            feature_mode=True, bg_color=jnp.zeros((3,)),
            config=cfg_r,
        )
        decoded = decode_map_rows(dec.apply, state.decoder_params, out.render)
        return cam, max_across_levels(decoded[None], pos_j, neg_j)[0]

    def consume(cam, rel):
        for k, label in enumerate(labels):
            mask, vm = heatmap_to_mask(rel[k], args.thresh)
            mask = np.asarray(majority_smooth(mask))
            heat = turbo(np.asarray(vm))
            _save(os.path.join(out_dir, "heatmap", label, cam.name + ".png"), heat)
            comp = heat * mask[..., None] + 0.3 * heat * (1 - mask[..., None])
            _save(os.path.join(out_dir, "mask", label, cam.name + ".png"),
                  np.asarray(mask, np.float32)[..., None].repeat(3, -1))
            _save(os.path.join(out_dir, "composited", label, cam.name + ".png"), comp)
            if video_frames is not None:
                video_frames[label].append(np.asarray(comp))

    pending = None
    for cam in cams:
        nxt = dispatch(cam)
        if pending is not None:
            consume(*pending)
        pending = nxt
    if pending is not None:
        consume(*pending)
    if video_frames is not None:
        from gags_tpu.utils.video import write_video

        for label, frames in video_frames.items():
            out = os.path.join(out_dir, "video", f"{label}.mp4")
            if write_video(out, frames, fps=30):
                print(f"wrote {out} ({len(frames)} frames)")


def pcd_mode(args, scene, state, statics):
    labels, pos, neg = load_text_embeds(args)
    dec = statics["decoder"]
    decoded = decode_features_chunked(dec.apply, state.decoder_params, state.features)
    rel = point_relevancy(decoded, jnp.asarray(pos), jnp.asarray(neg))
    from gags_tpu.core.sh import sh_to_rgb

    base_rgb = np.asarray(sh_to_rgb(scene.sh[:, 0, :]))
    xyz = np.asarray(scene.means)
    for k, label in enumerate(labels):
        mask = np.asarray(
            select_gaussians(rel, k, args.thresh, scene.means, smooth=not args.no_smooth)
        )
        rgb = base_rgb * 0.25
        rgb[mask] = [1.0, 0.1, 0.1]
        out = os.path.join(args.model_path, "relevancy_pcd", f"{label}.ply")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        write_points3d_ply(out, xyz, np.clip(rgb, 0, 1))
        print(f"{label}: {int(mask.sum())} gaussians selected → {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("--text_embeds", required=True)
    p.add_argument("--thresh", type=float, default=0.5)
    p.add_argument("--image_mode", action="store_true")
    p.add_argument("--pcd_mode", action="store_true")
    p.add_argument("--video", action="store_true")
    p.add_argument("--video_frames", type=int, default=150)
    p.add_argument("--no_smooth", action="store_true")
    p.add_argument("-r", "--resolution", type=int, default=2)
    p.add_argument("--autotune", action="store_true",
                   help="drain-time the parity-guarded kernel variants on "
                        "the first camera and sweep with the fastest")
    args = p.parse_args()

    ply = os.path.join(
        args.model_path, "point_cloud", f"iteration_{args.iteration}", "point_cloud.ply"
    )
    scene = GaussianScene.from_ply(ply)
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

    if args.pcd_mode:
        pcd_mode(args, scene, state, statics)
    else:
        info = detect_and_load(args.source_path, foundation_model="none")
        image_mode(args, scene, state, statics, info, raster_cfg=cfg.raster)


if __name__ == "__main__":
    main()
