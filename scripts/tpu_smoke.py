"""Smoke-test the Pallas rasterizer on the real TPU chip.

Run: python scripts/tpu_smoke.py [n_gaussians] [width] [height]
Compares a small render against the pure-JAX oracle and times the kernel.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.reference import rasterize_reference
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.synthetic import make_scene, make_camera


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    print("devices:", jax.devices())

    scene = make_scene(n, seed=0)
    cam = make_camera(w, h)
    means = jnp.asarray(scene["means"])
    quats = jnp.asarray(scene["quats"])
    scales = jnp.asarray(scene["scales"])
    op = jnp.asarray(scene["opacities"])
    col = jnp.asarray(scene["features"][:, :16])

    cfg = RasterizeConfig()

    @jax.jit
    def run_(m_, q_, s_, o_, c):
        res = rasterize(m_, q_, s_, o_, c, cam.viewmat, cam.K, w, h, config=cfg)
        return res.image, res.alpha, res.overflow

    def run(c):
        return run_(means, quats, scales, op, c)

    t0 = time.time()
    img, alpha, ovf = run(col)
    img.block_until_ready()
    print(f"first call (compile+run): {time.time()-t0:.1f}s  overflow={int(ovf)}")

    t0 = time.time()
    iters = 20
    for _ in range(iters):
        img, alpha, ovf = run(col)
    img.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"steady state: {dt*1000:.2f} ms/frame = {1/dt:.1f} FPS  ({n} gaussians, {w}x{h}, C=16)")

    if n <= 30000 and w * h <= 256 * 256:
        proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K, w, h)
        ref_img, ref_alpha = jax.jit(
            lambda: rasterize_reference(
                proj.means2d, proj.conics, proj.depths, proj.radii, op, col, w, h
            )
        )()
        err = float(jnp.max(jnp.abs(img - ref_img)))
        aerr = float(jnp.max(jnp.abs(alpha - ref_alpha)))
        print(f"max abs err vs oracle: img {err:.2e}  alpha {aerr:.2e}")
        assert err < 1e-3 and aerr < 1e-3, "MISMATCH"
        print("PARITY OK")

    # gradient timing
    tgt = jnp.zeros((h, w, 16))

    @jax.jit
    def grad_step_(m_, q_, s_, o_, c):
        def loss(cc):
            res = rasterize(
                m_, q_, s_, o_, cc, cam.viewmat, cam.K, w, h, config=cfg
            )
            return jnp.mean(jnp.abs(res.image - tgt))

        return jax.grad(loss)(c)

    def grad_step(c):
        return grad_step_(means, quats, scales, op, c)

    t0 = time.time()
    g = grad_step(col)
    g.block_until_ready()
    print(f"grad first call: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        g = grad_step(col)
    g.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"grad steady state: {dt*1000:.2f} ms/step")


if __name__ == "__main__":
    main()
