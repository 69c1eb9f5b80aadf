"""Scene editing CLI: apply an edit_*.yaml config to a trained scene.

  python -m gags_tpu.cli.edit -m <model_dir> --config configs/edit_color.yaml \
      --text_embeds objects.npz [--iteration 30000] [-o edited.ply]

objects.npz must hold 'labels' + 'pos' embeddings covering cfg.objects (use
gags_tpu.cli.encode_text to create it from a CLIP checkpoint).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.gad.train import GadConfig, create_train_state
from gags_tpu.gad.checkpoints import latest_checkpoint_step, load_checkpoint
from gags_tpu.query.edit import EditConfig, apply_edit, parse_color_func, select_by_text
from gags_tpu.query.grounding import decode_features_chunked
from gags_tpu.scene.gaussian_data import GaussianScene


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--text_embeds", required=True)
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("-o", "--output", default="")
    args = p.parse_args()

    cfg = EditConfig.from_yaml(args.config)
    ply = os.path.join(
        args.model_path, "point_cloud", f"iteration_{args.iteration}", "point_cloud.ply"
    )
    scene = GaussianScene.from_ply(ply)
    import dataclasses as _dc
    from gags_tpu.splat.rasterizer import auto_config

    gcfg = GadConfig.load(args.model_path, feature_dim=scene.semantic_features.shape[1])
    gcfg = _dc.replace(gcfg, raster=auto_config(
        # forward-only: the unaligned inference binning skips the SAT/dummy
        # passes and the gradient ReductionLayout (~3 ms/frame) entirely
        **{k: v for k, v in _dc.asdict(gcfg.raster).items()
           if k not in ("interpret", "aligned")},
        aligned=False,
    ))
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), gcfg)
    step = latest_checkpoint_step(args.model_path) or args.iteration
    state = load_checkpoint(args.model_path, step, state)

    data = np.load(args.text_embeds, allow_pickle=True)
    labels = [str(l) for l in data["labels"]]
    embeds = jnp.asarray(data["pos"][[labels.index(o) for o in cfg.objects]])

    decoded = decode_features_chunked(
        statics["decoder"].apply, state.decoder_params, state.features
    )
    target_ids = [cfg.objects.index(t) for t in cfg.targets]
    mask = select_by_text(decoded, embeds, target_ids, cfg.threshold)
    print(f"selected {int(mask.sum())}/{scene.num_gaussians} gaussians for {cfg.targets}")

    color_fn = parse_color_func(cfg.color_func) if cfg.operation == "color_func" else None
    edited = apply_edit(scene, mask, cfg.operation, color_fn)

    out = args.output or os.path.join(
        args.model_path, "edits", f"{cfg.operation}_{'_'.join(cfg.targets)}.ply"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    edited.save_ply(out)
    print(f"wrote {out} ({edited.num_gaussians} gaussians)")


if __name__ == "__main__":
    main()
