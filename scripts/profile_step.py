"""Capture a jax.profiler trace of the rasterizer fwd/bwd for offline study.

Usage: python scripts/profile_step.py [outdir]
Writes a TensorBoard-compatible trace under outdir/plugins/profile/...;
round-2 starting point for kernel-level timing (the per-chunk cost split
between VPU alpha math, MXU scans and DMA stalls is still unmeasured —
see NOTES.md).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.synthetic import make_scene, make_camera

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gags_trace"
N, W, H = 300_000, 640, 360
raw = make_scene(N, seed=0, extent=3.0)
m, q, s, o = (jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities"))
c = jnp.asarray(raw["features"])
cam = make_camera(W, H)
cfg = RasterizeConfig()

fwd = jax.jit(lambda cc: rasterize(m, q, s, o, cc, cam.viewmat, cam.K, W, H, config=cfg).image)
grad = jax.jit(jax.grad(lambda cc: jnp.sum(fwd(cc) ** 2)))
fwd(c).block_until_ready()
grad(c).block_until_ready()

with jax.profiler.trace(out):
    for _ in range(3):
        img = fwd(c)
        g = grad(c)
    jax.block_until_ready((img, g))
print(f"trace written to {out}")
