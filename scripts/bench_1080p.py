"""1080p / 1M-Gaussian inference benchmark (BASELINE config 4), drain-timed.

Round-2: 161 ms (6.2 FPS) via the two-key wide sort. Round-3 changes that
land here: u32 single-key sort + Pallas expand kernel (2040 tiles x 2^20
fits uint32), streaming fast kernel, bf16 colour rows, anisotropic bbox
rects, opacity-aware extents + ellipse-tile cull, optional blend_bf16.

Geometry is passed as jit ARGS (never closed over: XLA would
constant-fold projection/binning and the probe would lie — NOTES.md).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.synthetic import make_scene, make_camera
from gags_tpu.utils.timing import device_time_drain

N, W, H = 1_000_000, 1920, 1080
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (
    jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities")
)
feats = jnp.asarray(raw["features"])
cam = make_camera(W, H)
bg = jnp.zeros((16,), jnp.float32)
# r4 battery: bf=2 overflowed by 661646 (valid ~2.66M) and every
# kernel_relayout leg lost — fractional budgets (2.7/2.8 hold the valid
# set with margin) + fused_keys on the now-default no-cull base instead.
VARIANTS = [
    dict(budget_factor=3, fast_color_rows=True),
    dict(budget_factor=2.7, fast_color_rows=True, blend_bf16=True,
         fused_keys=True),
    dict(budget_factor=2.7, fast_color_rows=True, blend_bf16=True,
         fused_keys=True, image_chw=True),
    # chunk 256: at ~2.66M valid instances the per-chunk fixed cost
    # (~0.56 us) is ~11 ms/frame — halving the chunk count is the
    # largest single 1080p lever after the r4 blend diet
    dict(budget_factor=2.7, fast_color_rows=True, blend_bf16=True,
         fused_keys=True, image_chw=True, chunk=256),
    dict(budget_factor=2.7, fast_color_rows=True, blend_bf16=True,
         fused_keys=True, image_chw=True, chunk=256, p_block=128),
]
for v in VARIANTS:
    cfg = RasterizeConfig(tile_h=32, tile_w=32, aligned=False, **v)

    @jax.jit
    def render(m, q, s, o, f):
        return rasterize(m, q, s, o, f, cam.viewmat, cam.K,
                         W, H, background=bg, config=cfg).image

    res = rasterize(means, quats, scales, opac, feats, cam.viewmat, cam.K,
                    W, H, background=bg, config=cfg)
    ovf = int(res.overflow)
    if ovf:
        print(f"1080p/1M {v}: OVERFLOW {ovf}, skipping", flush=True)
        continue
    dt = device_time_drain(
        lambda f: render(means, quats, scales, opac, f), feats, k=10, warmup=2
    )
    print(f"1080p/1M {v}: {dt*1e3:7.2f} ms ({1/dt:5.2f} FPS) overflow={ovf}",
          flush=True)
