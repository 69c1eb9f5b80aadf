"""Small-tile pair-shedding sweep at 720p/250k/C16 (inference fast path).

The blend is pair-count bound past the slab fix (stage_drain r4: blend
~16 ms of the 21.6 ms bf16 frame at 32x32). Pairs per splat scale as
(2r+th)(2r+tw): 16x16 sheds ~0.56x of 32x32's pairs but needs a larger
instance budget (more tile duplicates) — battery-1's bf16_sweep leg
overflowed at budget_factor 3 and was skipped, so the shape was never
fairly measured. This sweep gives each shape the budget it needs and
rides fused_keys (the duplicate streams grow, so the fused expand+key
kernel matters more here). Overflow != 0 legs are reported, not timed.

One TPU client at a time.
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

# (tile_h, tile_w, p_block, budget_factor, fused_keys)
LEGS = [
    (32, 32, 256, 2.2, False),  # current tuned baseline shape
    (32, 32, 256, 2.2, True),
    (16, 16, 256, 3.5, True),
    (16, 16, 256, 4.0, True),
    (16, 16, 256, 4.5, True),
    (16, 16, 128, 4.0, True),
    (8, 32, 256, 4.0, True),
    (16, 32, 512, 2.8, True),
]
for th, tw, pb, bf, fk in LEGS:
    cfg = RasterizeConfig(
        tile_h=th, tile_w=tw, chunk=128, aligned=False, p_block=pb,
        fast_color_rows=True, budget_factor=bf, blend_bf16=True,
        fused_keys=fk,
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
    tag = f"tile {th:2d}x{tw:2d} pb={pb:4d} bf={bf} fkeys={int(fk)}"
    if ovf:
        print(f"{tag}: OVERFLOW {ovf}, skipping", flush=True)
        continue
    dt = device_time_drain(lambda ff: render(m, q, s, o, ff), c, k=30, warmup=3)
    print(f"{tag}: {dt*1e3:7.2f} ms/frame = {1/dt:6.2f} FPS", flush=True)
