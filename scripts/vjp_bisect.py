import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import (RasterizeConfig, prepare_binning, rasterize_binned,
                                       _blend, _geom_table, _tiles_to_image)
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.utils.synthetic import make_scene, make_camera

N, W, H = 300_000, 640, 360
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (jnp.asarray(raw[k]) for k in ("means","quats","scales","opacities"))
feats = jnp.zeros((N,16))
cam = make_camera(W, H)
import os
cfg = RasterizeConfig(
    tile_w=int(os.environ.get("TW", 128)),
    tile_h=int(os.environ.get("TH", 8)),
    budget_factor=int(os.environ.get("BF", 4)),
    chunk=int(os.environ.get("CHUNK", 128)),
)
b = prepare_binning(means, quats, scales, cam.viewmat, cam.K, W, H, cfg, opacities=opac)
proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K, W, H)
geom = _geom_table(proj, opac)
tiles_x, tiles_y = -(-W//cfg.tile_w), -(-H//cfg.tile_h)
print("valid", int(b.num_valid), flush=True)

def t(name, f, *a):
    o=f(*a); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(10): o=f(*a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.1f} ms", flush=True)

from gags_tpu.splat.rasterizer import order_ext
perm = order_ext(b.order)
blend_fwd = jax.jit(lambda c, g: _blend(c[b.order], g[perm], b.inst_gid, b.tile_starts, b.tile_counts, (tiles_x,tiles_y), cfg)[0])
t("blend fwd only", blend_fwd, feats, geom)
blend_grad = jax.jit(lambda c, g: jax.grad(lambda cc: jnp.sum(_blend(cc[b.order], g[perm], b.inst_gid, b.tile_starts, b.tile_counts, (tiles_x,tiles_y), cfg)[0]))(c))
t("blend fwd+grad", blend_grad, feats, geom)
full_grad = jax.jit(lambda c, g4: jax.grad(lambda cc: jnp.sum(rasterize_binned(
    g4["means"],g4["quats"],g4["scales"],g4["opacities"],cc,cam.viewmat,cam.K,
    b.inst_gid,b.tile_starts,b.tile_counts,W,H,config=cfg,order=b.order)[0]))(c))
geom4 = dict(means=means,quats=quats,scales=scales,opacities=opac)
t("full fwd+grad", full_grad, feats, geom4)
