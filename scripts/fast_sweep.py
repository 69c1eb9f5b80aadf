"""Full-frame inference FPS sweep over fast-kernel knobs (drain-timed)."""
import sys

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.synthetic import make_scene, make_camera
from gags_tpu.utils.timing import device_time_drain

N, W, H = 250_000, 1280, 720
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (
    jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities")
)
feats = jnp.asarray(raw["features"])
cam = make_camera(W, H)
bg = jnp.zeros((16,), jnp.float32)

VARIANTS = [
    dict(chunk=128, p_block=256),
    dict(chunk=256, p_block=256),
    dict(chunk=256, p_block=512),
    dict(chunk=256, p_block=1024),
    dict(chunk=256, p_block=256, fast_color_rows=True),
    dict(chunk=256, p_block=256, fast_color_rows=True, budget_factor=3),
    dict(chunk=512, p_block=256, fast_color_rows=True, budget_factor=3),
]

for v in VARIANTS:
    cfg = RasterizeConfig(tile_h=32, tile_w=32, aligned=False, **v)

    @jax.jit
    def render(f):
        return rasterize(means, quats, scales, opac, f, cam.viewmat, cam.K,
                         W, H, background=bg, config=cfg).image

    try:
        dt = device_time_drain(render, feats, k=20, warmup=2)
        print(f"{v}: {dt*1e3:7.3f} ms  ({1/dt:5.1f} FPS)", flush=True)
    except Exception as e:
        print(f"{v}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
