"""Per-op breakdown of the CURRENT (depth-rank) bin_gaussians on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gags_tpu.splat import tiles
from gags_tpu.splat.rasterizer import RasterizeConfig
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.utils.synthetic import make_scene, make_camera

N, W, H = 250_000, 1280, 720
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales = (jnp.asarray(raw[k]) for k in ("means", "quats", "scales"))
cam = make_camera(W, H)
cfg = RasterizeConfig()
proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K, W, H)

tiles_x, tiles_y = -(-W // cfg.tile_w), -(-H // cfg.tile_h)
num_tiles = tiles_x * tiles_y
chunk = cfg.chunk
budget = cfg.instance_budget(N)
m_real = ((budget + chunk - 1) // chunk) * chunk


def t(name, f, *a, iters=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms", flush=True)
    return o


m2, radii, depths = proj.means2d, proj.radii, proj.depths

rects = t("1 tile_rects        ", jax.jit(lambda m, r: tiles.tile_rects(m, r, cfg.tile_w, cfg.tile_h, tiles_x, tiles_y)), m2, radii)
x0, y0, w, h, counts = rects

order = t("2 argsort depths N  ", jax.jit(lambda d: jnp.argsort(d)), depths)


def permute(x0, y0, w, h, counts, order):
    packed = x0 | (y0 << 10) | (jnp.maximum(w, 1) << 20)
    return jnp.stack([packed, counts, x0 + w, y0 + h], axis=1)[order]


tblp = t("3 permute (N,4)     ", jax.jit(permute), x0, y0, w, h, counts, order)


def cumsum_cut(tblp):
    counts_p = tblp[:, 1]
    inc = jnp.cumsum(counts_p).astype(jnp.int32)
    offsets = inc - counts_p
    g_cut = jnp.searchsorted(inc, m_real, side="right").astype(jnp.int32)
    num_valid = jnp.where(g_cut > 0, inc[jnp.clip(g_cut - 1, 0, N - 1)], 0)
    return inc, offsets, g_cut, num_valid


inc, offsets, g_cut, num_valid = t("4 cumsum+cut N      ", jax.jit(cumsum_cut), tblp)


def sat_counts(tblp, g_cut):
    kept = (jnp.arange(N, dtype=jnp.int32) < g_cut) & (tblp[:, 1] > 0)
    gx0 = tblp[:, 0] & 1023
    gy0 = (tblp[:, 0] >> 10) & 1023
    gx1, gy1 = tblp[:, 2], tblp[:, 3]
    gw = tiles_x + 1
    ncells = (tiles_y + 1) * gw
    oob = jnp.int32(ncells)
    pos = jnp.concatenate([jnp.where(kept, gy0 * gw + gx0, oob), jnp.where(kept, gy1 * gw + gx1, oob)])
    neg = jnp.concatenate([jnp.where(kept, gy0 * gw + gx1, oob), jnp.where(kept, gy1 * gw + gx0, oob)])
    (pos_s,) = jax.lax.sort((pos,), num_keys=1)
    (neg_s,) = jax.lax.sort((neg,), num_keys=1)
    bounds = jnp.arange(ncells + 1, dtype=jnp.int32)
    hp = jnp.searchsorted(pos_s, bounds, side="left")
    hn = jnp.searchsorted(neg_s, bounds, side="left")
    grid = (hp[1:] - hp[:-1]) - (hn[1:] - hn[:-1])
    grid = grid.reshape(tiles_y + 1, gw)
    counts_t = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[:tiles_y, :tiles_x]
    return counts_t.reshape(num_tiles)


counts_t = t("5 SAT tile counts   ", jax.jit(sat_counts), tblp, g_cut)


def spread_all(tblp, offsets, num_valid):
    idx = jnp.arange(m_real, dtype=jnp.int32)
    rank = jnp.arange(N, dtype=jnp.int32)
    oidx = jnp.minimum(offsets, m_real)

    def spread(field):
        d = jnp.diff(field, prepend=jnp.zeros((1,), jnp.int32))
        acc = jnp.zeros((m_real + 1,), jnp.int32).at[oidx].add(d, indices_are_sorted=True)
        return jnp.cumsum(acc[:m_real])

    gid = jnp.clip(spread(rank), 0, N - 1)
    slot = idx - spread(offsets)
    pk = spread(tblp[:, 0])
    return gid, slot, pk


gid, slot, pk = t("6 spread x3 (M)     ", jax.jit(spread_all), tblp, offsets, num_valid)


def keyize(gid, slot, pk, num_valid, counts_t):
    idx = jnp.arange(m_real, dtype=jnp.int32)
    px0 = pk & 1023
    py0 = (pk >> 10) & 1023
    pw = (pk >> 20) & 1023
    dy = slot // pw
    dx = slot - dy * pw
    tile = (py0 + dy) * tiles_x + (px0 + dx)
    valid = idx < num_valid
    key_real = jnp.where(valid, tile * (N + 1) + gid, tiles.INT32_MAX)

    padded = ((counts_t + chunk - 1) // chunk) * chunk
    padded = jnp.where(counts_t > 0, padded, 0)
    dummy_idx = jnp.arange(num_tiles * chunk, dtype=jnp.int32)
    d_tile = dummy_idx // chunk
    d_within = dummy_idx - d_tile * chunk
    pad_needed = padded - counts_t
    d_ok = d_within < pad_needed[d_tile]
    key_dummy = jnp.where(d_ok, d_tile * (N + 1) + N, tiles.INT32_MAX)
    return jnp.concatenate([key_real, key_dummy])


keys = t("7 keys+dummies (M)  ", jax.jit(keyize), gid, slot, pk, num_valid, counts_t)

sk = t("8 lax.sort keys     ", jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0]), keys)

t("9 mod recover (M)   ", jax.jit(lambda s: jnp.minimum(s % (N + 1), N).astype(jnp.int32)), sk)

full = jax.jit(lambda m, r, d: tiles.bin_gaussians(m, r, d, W, H, cfg.tile_w, cfg.tile_h, budget, chunk))
t("full bin_gaussians  ", full, m2, radii, depths)
