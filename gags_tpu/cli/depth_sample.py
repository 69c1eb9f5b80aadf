"""GAS stage B CLI: per-image min-depth samples — counterpart of `depth_SAM.py`.

Reads the depth maps produced by the render CLI (`--render_mode RGB+ED`),
projects every Gaussian into every camera with occlusion testing, takes the
per-point minimum depth over cameras and splats it back into per-image
`depths_sample/<img>_depth_sample.npy` maps.

  python -m gags_tpu.cli.depth_sample -s <scene> -m <model_dir> \
      --iteration 30000 [-r -1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.gas.depth_sampler import min_depth_over_cameras, splat_depth_samples
from gags_tpu.scene.dataset import detect_and_load, camera_from_info
from gags_tpu.scene.gaussian_data import GaussianScene


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("-r", "--resolution", type=int, default=-1)
    p.add_argument("--vis_thres", type=float, default=0.25)
    args = p.parse_args()

    info = detect_and_load(args.source_path, foundation_model="none")
    ply = os.path.join(
        args.model_path, "point_cloud", f"iteration_{args.iteration}", "point_cloud.ply"
    )
    scene = GaussianScene.from_ply(ply)
    depth_dir = os.path.join(args.model_path, "train", f"ours_{args.iteration}", "depth")
    out_dir = os.path.join(args.source_path, "depths_sample")
    os.makedirs(out_dir, exist_ok=True)

    cams, depths = [], []
    for ci in info.train_cameras:
        name = os.path.splitext(ci.name)[0]
        dpath = os.path.join(depth_dir, name + "_depth.npy")
        if not os.path.exists(dpath):
            raise FileNotFoundError(
                f"{dpath} missing — run the render CLI with --render_mode RGB+ED first"
            )
        d = np.load(dpath)
        cam = camera_from_info(ci, args.resolution)
        if d.shape != (cam.height, cam.width):
            raise ValueError(f"{name}: depth {d.shape} vs camera {cam.height, cam.width}")
        cams.append(cam)
        depths.append(d)

    viewmats = jnp.stack([c.viewmat for c in cams])
    Ks = jnp.stack([c.K for c in cams])
    dmaps = jnp.asarray(np.stack(depths))

    mind, vis, uv = min_depth_over_cameras(
        scene.means, viewmats, Ks, dmaps, vis_thres=args.vis_thres
    )
    splat = jax.jit(
        splat_depth_samples, static_argnames=("height", "width")
    )
    for i, (ci, cam) in enumerate(zip(info.train_cameras, cams)):
        m = splat(mind, vis[:, i], uv[:, i], height=cam.height, width=cam.width)
        name = os.path.splitext(ci.name)[0]
        np.save(os.path.join(out_dir, name + "_depth_sample.npy"), np.asarray(m))
    print(f"wrote {len(cams)} depth-sample maps to {out_dir}")


if __name__ == "__main__":
    main()
