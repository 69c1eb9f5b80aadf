"""Per-op breakdown of bin_gaussians + the instance gather on TPU.

Round-2 finding: lax.sort itself is ~0.2 ms for 1.2M keys — the 38 ms
bin stage must be dominated by other ops. This isolates each.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.splat import tiles
from gags_tpu.splat.rasterizer import RasterizeConfig, _geom_table
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.utils.synthetic import make_scene, make_camera

N, W, H = 250_000, 1280, 720
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (jnp.asarray(raw[k]) for k in ("means","quats","scales","opacities"))
feats = jnp.asarray(raw["features"])
cam = make_camera(W, H)
cfg = RasterizeConfig()
proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K, W, H)

tiles_x, tiles_y = -(-W//cfg.tile_w), -(-H//cfg.tile_h)
num_tiles = tiles_x * tiles_y
budget = cfg.instance_budget(N)
chunk = cfg.chunk
m_real = ((budget + chunk - 1)//chunk)*chunk
m_out = m_real + num_tiles*chunk

def t(name, f, *a, iters=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms", flush=True)
    return o

m2, radii, depths = proj.means2d, proj.radii, proj.depths

rects = t("1 tile_rects     ", jax.jit(lambda m, r: tiles.tile_rects(m, r, cfg.tile_w, cfg.tile_h, tiles_x, tiles_y)), m2, radii)
x0, y0, w, _h, counts = rects

offs = t("2 cumsum counts N ", jax.jit(lambda c: (jnp.cumsum(c)-c).astype(jnp.int32)), counts)

marker = t("3 scatter marker M", jax.jit(lambda o: jnp.zeros((m_real+1,), jnp.int32).at[jnp.minimum(o, m_real)].add(1)), offs)

gid = t("4 cumsum marker M ", jax.jit(lambda mk: jnp.clip(jnp.cumsum(mk[:m_real])-1, 0, N-1)), marker)

base = t("5 cummax M        ", jax.jit(lambda mk: jax.lax.cummax(jnp.where(mk[:m_real] > 0, jnp.arange(m_real, dtype=jnp.int32), 0))), marker)

order = t("6 argsort depths N", jax.jit(lambda d: jnp.argsort(d)), depths)
rank = t("7 rank scatter N  ", jax.jit(lambda o: jnp.zeros((N,), jnp.int32).at[o].set(jnp.arange(N, dtype=jnp.int32))), order)

table = jnp.stack([x0, y0, jnp.maximum(w,1), rank], axis=1)
g = t("8 gather (M,4)    ", jax.jit(lambda tb, i: tb[i]), table, gid)

def expand(g, base):
    idx = jnp.arange(m_real, dtype=jnp.int32)
    slot = idx - base
    dy = slot // g[:, 2]
    dx = slot - dy*g[:, 2]
    tile = (g[:, 1]+dy)*tiles_x + (g[:, 0]+dx)
    return tile
tile = t("9 expand arith M  ", jax.jit(expand), g, base)

num_valid = jnp.minimum(offs[-1]+counts[-1], m_real)
valid = jnp.arange(m_real, dtype=jnp.int32) < num_valid

cnt = t("10 segment_sum M->T", jax.jit(lambda v, tl: jax.ops.segment_sum(v.astype(jnp.int32), jnp.where(v, tl, 0), num_segments=num_tiles)), valid, tile)

def keys_fn(valid, tile, g, gid):
    key_real = jnp.where(valid, tile*(N+1)+g[:, 3], tiles.INT32_MAX)
    gid_real = jnp.where(valid, gid, N).astype(jnp.int32)
    return key_real, gid_real
kr, gr = t("11 keys M         ", jax.jit(keys_fn), valid, tile, g, gid)

def dummy_fn(cnt):
    padded = ((cnt+chunk-1)//chunk)*chunk
    padded = jnp.where(cnt > 0, padded, 0)
    di = jnp.arange(num_tiles*chunk, dtype=jnp.int32)
    dt = di//chunk
    dw = di - dt*chunk
    ok = dw < (padded-cnt)[dt]
    return jnp.where(ok, dt*(N+1)+N, tiles.INT32_MAX), jnp.full((num_tiles*chunk,), N, jnp.int32)
kd, gd = t("12 dummies T*chunk", jax.jit(dummy_fn), cnt)

ks = t("13 concat+sort M   ", jax.jit(lambda a, b, c, d: jax.lax.sort((jnp.concatenate([a, c]), jnp.concatenate([b, d])), num_keys=1)), kr, gr, kd, gd)

whole = t("TOTAL bin_gaussians", jax.jit(lambda m, r, d: tiles.bin_gaussians(m, r, d, W, H, cfg.tile_w, cfg.tile_h, budget, chunk)), m2, radii, depths)

# ---- instance gather stage pieces -------------------------------------
geom = _geom_table(proj, opac)
inst_gid = whole.inst_gid
cp = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]))], 0)
tbl = t("G1 table concat    ", jax.jit(lambda ge, c: jnp.concatenate([ge, c], axis=1)), geom, cp)
gt = t("G2 gather (M,24)   ", jax.jit(lambda tb, i: tb[i]), tbl, inst_gid)
t("G3 transpose to (24,M)", jax.jit(lambda x: x.T), gt)
t("G2+G3 fused        ", jax.jit(lambda tb, i: tb[i].T), tbl, inst_gid)
t("G gather cols (24,M)", jax.jit(lambda tb, i: tb.T[:, i]), tbl, inst_gid)
