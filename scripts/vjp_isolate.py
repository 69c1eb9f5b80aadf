import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import RasterizeConfig, prepare_binning, _blend, _geom_table
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.utils.synthetic import make_scene, make_camera

N, W, H = 300_000, 640, 360
raw = make_scene(N, seed=0, extent=3.0)
m, q, s, o = (jnp.asarray(raw[k]) for k in ("means","quats","scales","opacities"))
feats = jnp.zeros((N,16))
cam = make_camera(W, H)
cfg = RasterizeConfig()
b = prepare_binning(m, q, s, cam.viewmat, cam.K, W, H, cfg, opacities=o)
proj = project_gaussians(m, q, s, cam.viewmat, cam.K, W, H)
geom = _geom_table(proj, o)
tx, ty = -(-W//cfg.tile_w), -(-H//cfg.tile_h)

def t(name, f, *a):
    out = f(*a); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(10): out=f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.1f} ms", flush=True)
    return out

from gags_tpu.splat.rasterizer import order_ext
perm = order_ext(b.order)
fwd = jax.jit(lambda c, g: _blend(c[b.order], g[perm], b.inst_gid, b.tile_starts, b.tile_counts, (tx,ty), cfg))
img, alpha = t("fwd", fwd, feats, geom)

# isolated backward: vjp closure jitted
_, vjp = jax.vjp(lambda c: _blend(c[b.order], geom[perm], b.inst_gid, b.tile_starts, b.tile_counts, (tx,ty), cfg), feats)
gout = (jnp.ones_like(img), jnp.zeros_like(alpha))
bwd = jax.jit(lambda g: vjp(g))
t("bwd alone", bwd, gout)
