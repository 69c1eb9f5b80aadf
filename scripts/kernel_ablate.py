"""Blend-kernel ablation: tri-matmul precision / early exit / transcendentals.

Run with GAGS_TRI_MODE / GAGS_NO_EARLY_EXIT / GAGS_FAKE_EXP env knobs
(pallas_kernel.py reads them at import). FAKE_EXP breaks numerics — it
exists only to bound the transcendental cost.
"""
import sys, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.utils.timing import device_time
from gags_tpu.splat import tiles, pallas_kernel as pk
from gags_tpu.splat.rasterizer import RasterizeConfig, _geom_table, order_ext
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.utils.synthetic import make_scene, make_camera

N, W, H = 250_000, 1280, 720
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities"))
feats = jnp.asarray(raw["features"])
cam = make_camera(W, H)
cfg = RasterizeConfig()
tiles_x, tiles_y = 10, 90
proj = jax.jit(lambda m, q, s: project_gaussians(m, q, s, cam.viewmat, cam.K, W, H))(means, quats, scales)
geom = _geom_table(proj, opac)
b = tiles.bin_gaussians(proj.means2d, proj.radii, proj.depths, W, H, 128, 8, cfg.instance_budget(N), 128)
inst = jnp.concatenate(
    [geom, jnp.concatenate([feats, jnp.zeros((1, 16))], 0)], axis=1
)[order_ext(b.order)][b.inst_gid].T
blend = jax.jit(lambda d, s, t: pk.tile_blend_forward(
    d, s, t, tiles_x=tiles_x, tiles_y=tiles_y, tile_h=8, tile_w=128, chunk=128))
t = device_time(blend, inst, b.tile_starts, b.tile_counts)
out = blend(inst, b.tile_starts, b.tile_counts)
gout = jnp.ones((tiles_x * tiles_y, 1024, 16), jnp.float32)
bwd = jax.jit(lambda g, s, c, go: pk.tile_blend_backward(
    g, s, c, go, tiles_x=tiles_x, tiles_y=tiles_y, tile_h=8, tile_w=128, chunk=128))
tb = device_time(bwd, inst[:8], b.tile_starts, b.tile_counts, gout)
tag = (f"TRI={os.environ.get('GAGS_TRI_MODE', 'highest')} "
       f"NEE={os.environ.get('GAGS_NO_EARLY_EXIT', '0')} "
       f"FAKE={os.environ.get('GAGS_FAKE_EXP', '0')}")
print(f"{tag}: blend={t*1e3:5.1f} bwd={tb*1e3:5.1f} ms  checksum={float(jnp.sum(out)):.3f}", flush=True)
