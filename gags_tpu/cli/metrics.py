"""Image-quality metrics CLI — counterpart of the reference `metrics.py`.

Walks `<model>/test/ours_<iter>/{renders,gt}`, computes PSNR / SSIM (and
LPIPS when VGG16+linear-head checkpoints are supplied), writes
results.json + per_view.json in the reference's format.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from gags_tpu.utils.metrics import psnr, ssim


def _load(path):
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def evaluate_dir(method_dir: str, lpips_fn=None):
    renders_dir = os.path.join(method_dir, "renders")
    gt_dir = os.path.join(method_dir, "gt")
    names = sorted(os.listdir(renders_dir))
    psnr_f = jax.jit(psnr)
    ssim_f = jax.jit(ssim)
    per_view = {"PSNR": {}, "SSIM": {}, "LPIPS": {}}
    for name in names:
        r = jnp.asarray(_load(os.path.join(renders_dir, name)))
        g = jnp.asarray(_load(os.path.join(gt_dir, name)))
        per_view["PSNR"][name] = float(psnr_f(r, g))
        per_view["SSIM"][name] = float(ssim_f(r, g))
        if lpips_fn is not None:
            per_view["LPIPS"][name] = float(lpips_fn(r, g))
    summary = {
        k: float(np.mean(list(v.values()))) for k, v in per_view.items() if v
    }
    return summary, per_view


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_paths", nargs="+", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--vgg_ckpt", default="", help="backbone features ckpt")
    p.add_argument("--lpips_lin_ckpt", default="")
    p.add_argument("--lpips_net", default="vgg", choices=["vgg", "alex", "squeeze"])
    args = p.parse_args()

    lpips_fn = None
    if args.vgg_ckpt and args.lpips_lin_ckpt:
        from gags_tpu.utils.lpips import lpips_from_checkpoints

        model, params = lpips_from_checkpoints(
            args.vgg_ckpt, args.lpips_lin_ckpt, net_type=args.lpips_net
        )
        lpips_fn = jax.jit(lambda a, b: model.apply(params, a, b))

    for model_dir in args.model_paths:
        results, per_view_all = {}, {}
        split_dir = os.path.join(model_dir, args.split)
        for method in sorted(os.listdir(split_dir)):
            method_dir = os.path.join(split_dir, method)
            if not os.path.isdir(os.path.join(method_dir, "renders")):
                continue
            summary, per_view = evaluate_dir(method_dir, lpips_fn)
            results[method] = summary
            per_view_all[method] = per_view
            print(f"{model_dir} {method}: " + "  ".join(
                f"{k} {v:.4f}" for k, v in summary.items()
            ))
        with open(os.path.join(model_dir, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
        with open(os.path.join(model_dir, "per_view.json"), "w") as f:
            json.dump(per_view_all, f, indent=2)


if __name__ == "__main__":
    main()
