"""Rendering CLI — counterpart of the reference `render.py`.

Modes:
  * RGB (optionally "RGB+ED": saves <name>_depth.npy + a turbo depth png,
    reference render.py:124-145), rendered at full GT resolution;
  * --feature_mode: renders 16-dim maps, saves PCA visualisation + scale
    map; --feature_npy dumps the raw feature maps (render.py:121-122,147-175).

Usage:
  python -m gags_tpu.cli.render -m <model_dir> -s <scene_dir> \
      --iteration 30000 [--feature_mode] [--feature_npy] [--render_mode RGB+ED] \
      [--skip_train] [--skip_test]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from gags_tpu.scene.dataset import detect_and_load, camera_from_info
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.render import render
from gags_tpu.splat.rasterizer import auto_config
from gags_tpu.utils.colormaps import apply_depth_colormap, apply_pca_colormap


def _save_png(path: str, img: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def render_set(
    model_dir: str,
    split: str,
    iteration: int,
    cam_infos,
    scene: GaussianScene,
    feature_mode: bool,
    feature_npy: bool,
    render_mode: str,
    resolution: int,
    scale_params=None,
    scale_decoder=None,
    autotune: bool = False,
):
    base = os.path.join(model_dir, split, f"ours_{iteration}")
    renders_dir = os.path.join(base, "renders")
    pca_proj = None
    bg = jnp.zeros((3,), jnp.float32)
    # forward-only rendering: unaligned inference binning + streaming kernel
    cfg = auto_config(aligned=False)
    if not autotune and cam_infos:
        # a persisted tuned winner (from a prior --autotune run or the
        # bench battery) beats the base config with zero extra compiles —
        # use it by default so a bare render gets the measured-fast path
        from gags_tpu.splat.autotune import load_persisted

        cam0 = camera_from_info(cam_infos[0], resolution)
        c = (scene.semantic_features.shape[1]
             if feature_mode and scene.semantic_features is not None else 3)
        tuned = load_persisted(
            cam0.width, cam0.height, int(scene.means.shape[0]), int(c)
        )
        if tuned is not None:
            import dataclasses as _dc

            # strip layouts this CLI only supports on some paths
            if tuned.soa_geom and not (feature_mode and render_mode == "RGB"):
                tuned = _dc.replace(tuned, soa_geom=False)
            if tuned.image_chw:
                tuned = _dc.replace(tuned, image_chw=False)
            if tuned.blend_bf16 and not feature_mode:
                # RGB eval output stays bit-faithful f32
                tuned = _dc.replace(tuned, blend_bf16=False)
            cfg = tuned
            print("# render: persisted tuned config reused", flush=True)
    if autotune and cam_infos:
        # pick the fastest parity-guarded kernel variant for THIS scene /
        # resolution on the running device (exact variants only — RGB and
        # saved feature maps stay bit-faithful)
        from gags_tpu.splat.autotune import autotune_config

        cam0 = camera_from_info(cam_infos[0], resolution)
        colors = (
            scene.semantic_features
            if feature_mode and scene.semantic_features is not None
            else jnp.asarray(
                np.random.default_rng(0).uniform(
                    0, 1, (scene.means.shape[0], 3)
                ).astype(np.float32)
            )
        )
        cfg = autotune_config(
            scene.means, scene.quats, scene.scales, scene.opacities, colors,
            cam0.viewmat, cam0.K, cam0.width, cam0.height,
            base=auto_config(aligned=False, fast_color_rows=feature_mode),
            # SoA only where render() supports it (feature RGB, no ED);
            # a winning config obliges the transposed-scene call below
            allow_soa=feature_mode and render_mode == "RGB",
            verbose=True,
        )
    # geometry actually passed to render(): one-time lane-major copies
    # when the autotuner picked soa_geom (bit-identical results)
    if cfg.soa_geom:
        from gags_tpu.splat.rasterizer import soa_geometry

        m_t, q_t, s_t = soa_geometry(scene.means, scene.quats, scene.scales)
        geo = dict(means=m_t, quats=q_t, scales=s_t)
    else:
        geo = dict(means=scene.means, quats=scene.quats, scales=scene.scales)

    def dispatch(info):
        """Enqueue one camera's render (async — JAX dispatch returns
        immediately), so host-side PNG/PCA/npy work on frame i overlaps
        device rendering of frame i+1."""
        cam = camera_from_info(info, resolution)
        name = os.path.splitext(info.name)[0]
        if feature_mode:
            out = render(
                cam,
                **geo,
                opacities=scene.opacities,
                semantic_features=scene.semantic_features,
                feature_mode=True,
                bg_color=jnp.zeros((3,)),
                config=cfg,
            )
        else:
            out = render(
                cam,
                **geo,
                opacities=scene.opacities,
                sh=scene.sh,
                sh_degree=scene.max_sh_degree,
                feature_mode=False,
                render_mode=render_mode,
                bg_color=bg,
                config=cfg,
            )
        return name, out

    def consume(name, out):
        nonlocal pca_proj
        if feature_mode:
            fmap = np.asarray(out.render)
            if feature_npy:
                npy_dir = os.path.join(base, "saved_feature")
                os.makedirs(npy_dir, exist_ok=True)
                # reference saves (C, H, W)
                np.save(os.path.join(npy_dir, name + "_fmap_CxHxW.npy"),
                        fmap.transpose(2, 0, 1))
            rgb, pca_proj = apply_pca_colormap(fmap, pca_proj)
            _save_png(os.path.join(base, "feature_pca", name + ".png"), rgb)
            if scale_decoder is not None:
                smap = np.asarray(scale_decoder.apply(scale_params, jnp.asarray(fmap)))
                _save_png(os.path.join(base, "scale_map", name + ".png"), smap)
        else:
            img = np.asarray(out.render)
            if render_mode == "RGB+ED":
                depth = img[..., 3]
                img = img[..., :3]
                np.save(_ensure(os.path.join(base, "depth", name + "_depth.npy")), depth)
                _save_png(os.path.join(base, "depth", name + "_depth.png"),
                          apply_depth_colormap(depth))
            _save_png(os.path.join(renders_dir, name + ".png"), img)

    pending = None
    for info in cam_infos:
        nxt = dispatch(info)
        if pending is not None:
            consume(*pending)
        pending = nxt
    if pending is not None:
        consume(*pending)


def _ensure(path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("--feature_mode", action="store_true")
    p.add_argument("--feature_npy", action="store_true")
    p.add_argument("--render_mode", default="RGB", choices=["RGB", "RGB+ED"])
    p.add_argument("-r", "--resolution", type=int, default=-1)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--eval", dest="eval_split", action="store_true")
    p.add_argument(
        "--autotune", action="store_true",
        help="drain-time the exact kernel variants on-device and render "
             "with the fastest (see gags_tpu.splat.autotune)",
    )
    args = p.parse_args()

    assert not (args.feature_mode and args.render_mode == "RGB+ED"), (
        "feature mode and expected-depth are mutually exclusive (reference "
        "render.py:208)"
    )

    info = detect_and_load(args.source_path, eval_split=args.eval_split,
                           foundation_model="none")
    ply = os.path.join(
        args.model_path, "point_cloud", f"iteration_{args.iteration}", "point_cloud.ply"
    )
    scene = GaussianScene.from_ply(ply)

    # feature mode: load the trained scale decoder (if a checkpoint exists)
    # so scale maps get saved alongside the PCA visualisation
    scale_decoder = scale_params = None
    if args.feature_mode and scene.semantic_features is not None:
        from gags_tpu.gad.checkpoints import latest_checkpoint_step, load_checkpoint
        from gags_tpu.gad.train import GadConfig, create_train_state

        step = latest_checkpoint_step(args.model_path)
        if step is not None:
            cfg = GadConfig.load(
                args.model_path, feature_dim=scene.semantic_features.shape[1]
            )
            state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
            state = load_checkpoint(args.model_path, step, state)
            scale_decoder = statics["scale_decoder"]
            scale_params = state.scale_params

    if not args.skip_train:
        render_set(args.model_path, "train", args.iteration, info.train_cameras,
                   scene, args.feature_mode, args.feature_npy, args.render_mode,
                   args.resolution, scale_params, scale_decoder, args.autotune)
    if not args.skip_test and info.test_cameras:
        render_set(args.model_path, "test", args.iteration, info.test_cameras,
                   scene, args.feature_mode, args.feature_npy, args.render_mode,
                   args.resolution, scale_params, scale_decoder, args.autotune)


if __name__ == "__main__":
    main()
