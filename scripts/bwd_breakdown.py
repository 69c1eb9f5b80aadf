import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.splat import pallas_kernel as pk
from gags_tpu.splat.rasterizer import RasterizeConfig, _geom_table, prepare_binning
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.utils.synthetic import make_scene, make_camera

N, W, H = 300_000, 640, 360
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (jnp.asarray(raw[k]) for k in ("means","quats","scales","opacities"))
feats = jnp.asarray(np.zeros((N,16), np.float32))
cam = make_camera(W, H)
cfg = RasterizeConfig()
b = prepare_binning(means, quats, scales, cam.viewmat, cam.K, W, H, cfg, opacities=opac)
proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K, W, H)
geom = _geom_table(proj, opac)
tiles_x, tiles_y = -(-W//cfg.tile_w), -(-H//cfg.tile_h)
P = cfg.tile_h*cfg.tile_w
gout = jnp.ones((tiles_x*tiles_y, P, 16), jnp.float32)

def t(name, f, *a):
    o=f(*a); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(10): o=f(*a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.1f} ms", flush=True)
    return o

from gags_tpu.splat.rasterizer import order_ext
perm = order_ext(b.order)
regather = jax.jit(lambda g, i: g[perm][i].T)
gi = t("geom re-gather", regather, geom, b.inst_gid)

bwd = jax.jit(lambda g, s, c, go: pk.tile_blend_backward(g, s, c, go,
    tiles_x=tiles_x, tiles_y=tiles_y, tile_h=cfg.tile_h, tile_w=cfg.tile_w, chunk=cfg.chunk))
gr = t("bwd kernel", bwd, gi, b.tile_starts, b.tile_counts, gout)

seg = jax.jit(lambda g, i: jax.ops.segment_sum(g, i, num_segments=N+1)[:N])
t("segment_sum", seg, gr, b.inst_gid)

# sorted-segment-sum alternative
perm = jnp.argsort(b.inst_gid)
ids_sorted = b.inst_gid[perm]
seg2 = jax.jit(lambda g, p, i: jax.ops.segment_sum(g[p], i, num_segments=N+1, indices_are_sorted=True)[:N])
t("permute+sorted segsum", seg2, gr, perm, ids_sorted)
