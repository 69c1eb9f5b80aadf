"""RGB 3DGS pretraining CLI — makes the full GAGS pipeline self-contained
(the reference points users at external gsplat for this stage).

  python -m gags_tpu.cli.train_rgb -s <scene_dir> -m <model_dir> \
      [--iterations 30000] [-r -1]

Outputs reference-layout PLY snapshots (point_cloud/iteration_N) that feed
straight into GAS/GAD.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from gags_tpu.rgb.train import (
    RgbConfig,
    create_rgb_state,
    densify_step,
    expon_lr,
    make_rgb_step,
    reset_opacity_step,
    to_scene,
)
from gags_tpu.scene.dataset import detect_and_load, camera_from_info
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.scene.ply import read_points3d_ply
from gags_tpu.splat.rasterizer import auto_config
from gags_tpu.utils.logging import EmaProgress, MetricsWriter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-r", "--resolution", type=int, default=-1)
    p.add_argument("--iterations", type=int, default=30000)
    p.add_argument("--save_iterations", default="7000,30000")
    p.add_argument("--capacity_factor", type=int, default=4)
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.makedirs(args.model_path, exist_ok=True)
    info = detect_and_load(args.source_path, foundation_model="none")
    xyz, rgb, _ = read_points3d_ply(info.points_path)
    print(f"{len(xyz)} seed points, {len(info.train_cameras)} cameras, "
          f"scene radius {info.radius:.2f}")

    seed_scene = GaussianScene.from_point_cloud(
        xyz, rgb, max_sh_degree=args.sh_degree, feature_dim=0
    )
    cfg = RgbConfig(
        capacity_factor=args.capacity_factor,
        sh_degree=args.sh_degree,
        raster=auto_config(geometry_grads=True),
    )
    state = create_rgb_state(seed_scene, cfg, seed=args.seed)

    cams, images = [], []
    for ci in info.train_cameras:
        cam = camera_from_info(ci, args.resolution)
        img = Image.open(ci.image_path).convert("RGB").resize((cam.width, cam.height))
        cams.append(cam)
        images.append(np.asarray(img, np.float32) / 255.0)
    w, h = cams[0].width, cams[0].height
    step = make_rgb_step(cfg, w, h, spatial_scale=info.radius)

    rng = np.random.default_rng(args.seed)
    save_at = {int(s) for s in args.save_iterations.split(",") if s}
    save_at.add(args.iterations)
    metrics_w = MetricsWriter(args.model_path)
    progress = EmaProgress(args.iterations)
    order = []

    for it in range(1, args.iterations + 1):
        if not order:
            order = list(rng.permutation(len(cams)))
        idx = order.pop()
        batch = dict(
            viewmat=cams[idx].viewmat, K=cams[idx].K,
            image=jnp.asarray(images[idx]),
        )
        sh_deg = min(it // 1000, args.sh_degree)
        lr = expon_lr(
            jnp.float32(it), cfg.position_lr_init * info.radius,
            cfg.position_lr_final * info.radius,
            cfg.position_lr_delay_mult, cfg.position_lr_max_steps,
        )
        state, m = step(state, batch, lr, sh_deg)

        if cfg.densify_from_iter < it < cfg.densify_until_iter:
            if it % cfg.densification_interval == 0:
                state = densify_step(
                    state, cfg.densify_grad_threshold, cfg.percent_dense,
                    info.radius, cfg.min_opacity,
                )
            if it % cfg.opacity_reset_interval == 0:
                state = reset_opacity_step(state)

        if it % 10 == 0:
            progress.update(it, float(m["loss"]))
        if it % 500 == 0:
            metrics_w.write(it, dict(loss=float(m["loss"]), n_alive=int(m["n_alive"])))
        if it in save_at:
            scene = to_scene(state, args.sh_degree)
            out = os.path.join(
                args.model_path, "point_cloud", f"iteration_{it}", "point_cloud.ply"
            )
            scene.save_ply(out)
            print(f"\n[iter {it}] saved {scene.num_gaussians} gaussians → {out}")
    metrics_w.close()


if __name__ == "__main__":
    main()
