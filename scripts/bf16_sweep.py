"""Drain-timed sweep: blend precision x tile shape at the bench config.

Measures the full-frame render (project+bin+gather+blend) for the
inference fast path at 720p/250k/C16 across {f32, blend_bf16} and tile
shapes, plus the isolated blend stage for the winner. One TPU client at
a time — run serially, nothing else touching the chip.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.synthetic import make_scene, make_camera
from gags_tpu.utils.timing import device_time_drain

N, W, H = 250_000, 1280, 720

print(jax.devices(), flush=True)
raw = make_scene(N, seed=0, extent=3.0)
m, q, s, o = (jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities"))
c = jnp.asarray(raw["features"])
cam = make_camera(W, H)
bg = jnp.zeros((c.shape[1],), jnp.float32)

SHAPES = [
    # (tile_h, tile_w, p_block): p_block < tile pixels tests whether
    # slab-sized temps let Mosaic keep the alpha chain in vregs
    (32, 32, 1024), (32, 32, 256), (32, 32, 128), (32, 32, 64),
    (16, 32, 512), (16, 32, 128), (16, 16, 256),
]
for (th, tw, pb) in SHAPES:
    for bf16 in (False, True):
        cfg = RasterizeConfig(
            tile_h=th, tile_w=tw, chunk=128, aligned=False, p_block=pb,
            fast_color_rows=True, budget_factor=3, blend_bf16=bf16,
        )

        @jax.jit
        def render(mm, qq, ss, oo, ff):
            return rasterize(
                mm, qq, ss, oo, ff, cam.viewmat, cam.K, W, H,
                background=bg, config=cfg,
            ).image

        res = rasterize(
            m, q, s, o, c, cam.viewmat, cam.K, W, H, background=bg, config=cfg
        )
        ovf = int(res.overflow)
        if ovf:
            print(f"tile {th}x{tw} bf16={bf16}: OVERFLOW {ovf}, skipping", flush=True)
            continue
        dt = device_time_drain(
            lambda ff: render(m, q, s, o, ff), c, k=30, warmup=3
        )
        print(
            f"tile {th}x{tw} pb={pb:4d} bf16={int(bf16)}: {dt*1e3:7.2f} ms/frame "
            f"= {1/dt:6.2f} FPS",
            flush=True,
        )
