"""Bisect TPU-vs-oracle mismatch in the blend kernel."""

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.reference import rasterize_reference
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.synthetic import make_scene, make_camera

W = H = 128


def run(n, seed=0, tag=""):
    scene = make_scene(n, seed=seed)
    cam = make_camera(W, H)
    means = jnp.asarray(scene["means"])
    quats = jnp.asarray(scene["quats"])
    scales = jnp.asarray(scene["scales"])
    op = jnp.asarray(scene["opacities"])
    col = jnp.asarray(scene["features"][:, :16])

    res = jax.jit(
        lambda m_, q_, s_, o_, c: rasterize(
            m_, q_, s_, o_, c, cam.viewmat, cam.K, W, H,
            config=RasterizeConfig(),
        ).image
    )(means, quats, scales, op, col)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K, W, H)
        ref_img, _ = rasterize_reference(
            proj.means2d, proj.conics, proj.depths, proj.radii, op, col, W, H
        )
    err = np.abs(np.asarray(res) - np.asarray(ref_img))
    print(f"{tag} n={n}: max err {err.max():.3e} mean {err.mean():.3e}  "
          f"bad pixels(>1e-3): {(err.max(-1) > 1e-3).sum()}/{W*H}")
    if err.max() > 1e-3:
        # where are the bad pixels?
        bad = np.argwhere(err.max(-1) > 1e-3)
        print("  bad pixel rows span:", bad[:, 0].min(), bad[:, 0].max(),
              "cols:", bad[:, 1].min(), bad[:, 1].max(), "count", len(bad))
        yy, xx = bad[0]
        print("  sample pixel", yy, xx, "pallas", np.asarray(res)[yy, xx, :3],
              "ref", np.asarray(ref_img)[yy, xx, :3])
    return err.max()


if __name__ == "__main__":
    print(jax.devices())
    run(100, tag="tiny")       # ~1 chunk per tile
    run(2000, tag="small")     # a few chunks
    run(20000, tag="med")      # many chunks, saturation
