"""Prefix-bisect bin_gaussians composition cost on TPU."""
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
INT32_MAX = tiles.INT32_MAX


from gags_tpu.utils.timing import report


def t(name, f, *a):
    report(name, f, *a, k1=5, k2=25)


def body(means2d, radii, depths, stop):
    n = N
    x0, y0, w, h, counts = tiles.tile_rects(means2d, radii, cfg.tile_w, cfg.tile_h, tiles_x, tiles_y)
    order = jnp.argsort(depths)
    packed = x0 | (y0 << 10) | (jnp.maximum(w, 1) << 20)
    tblp = jnp.stack([packed, counts, x0 + w, y0 + h], axis=1)[order]
    packed_p, counts_p = tblp[:, 0], tblp[:, 1]
    inc = jnp.cumsum(counts_p).astype(jnp.int32)
    offsets = inc - counts_p
    total = inc[n - 1]
    g_cut = jnp.searchsorted(inc, m_real, side="right").astype(jnp.int32)
    num_valid = jnp.where(g_cut > 0, inc[jnp.clip(g_cut - 1, 0, n - 1)], 0)
    if stop == "A":
        return num_valid, tblp
    kept = (jnp.arange(n, dtype=jnp.int32) < g_cut) & (counts_p > 0)
    gx0 = tblp[:, 0] & 1023
    gy0 = (tblp[:, 0] >> 10) & 1023
    gx1 = tblp[:, 2]
    gy1 = tblp[:, 3]
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
    counts_t = counts_t.reshape(num_tiles)
    padded_counts = ((counts_t + chunk - 1) // chunk) * chunk
    padded_counts = jnp.where(counts_t > 0, padded_counts, 0)
    tile_starts = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)
    if stop == "B":
        return tile_starts, counts_t
    idx = jnp.arange(m_real, dtype=jnp.int32)
    rank = jnp.arange(n, dtype=jnp.int32)
    oidx = jnp.minimum(offsets, m_real)

    def spread(field):
        d = jnp.diff(field, prepend=jnp.zeros((1,), jnp.int32))
        acc = jnp.zeros((m_real + 1,), jnp.int32).at[oidx].add(d, indices_are_sorted=True)
        return jnp.cumsum(acc[:m_real])

    gid = jnp.clip(spread(rank), 0, n - 1)
    slot = idx - spread(offsets)
    pk = spread(packed_p)
    px0 = pk & 1023
    py0 = (pk >> 10) & 1023
    pw = (pk >> 20) & 1023
    dy = slot // pw
    dx = slot - dy * pw
    tile = (py0 + dy) * tiles_x + (px0 + dx)
    valid = idx < num_valid
    if stop == "C":
        return tile, gid, valid
    key_real = jnp.where(valid, tile * (n + 1) + gid, INT32_MAX)
    dummy_idx = jnp.arange(num_tiles * chunk, dtype=jnp.int32)
    d_tile = dummy_idx // chunk
    d_within = dummy_idx - d_tile * chunk
    pad_needed = padded_counts - counts_t
    d_ok = d_within < pad_needed[d_tile]
    key_dummy = jnp.where(d_ok, d_tile * (n + 1) + n, INT32_MAX)
    keys = jnp.concatenate([key_real, key_dummy])
    if stop == "D":
        return keys, tile_starts
    (sorted_keys,) = jax.lax.sort((keys,), num_keys=1)
    if stop == "E":
        return sorted_keys, tile_starts
    inst_rank = jnp.minimum(sorted_keys % (n + 1), n).astype(jnp.int32)
    return inst_rank, tile_starts, counts_t, num_valid, order


for stop in ["A", "B", "C", "D", "E", "F"]:
    t(f"prefix {stop}", jax.jit(lambda m, r, d, s=stop: body(m, r, d, s)), proj.means2d, proj.radii, proj.depths)
