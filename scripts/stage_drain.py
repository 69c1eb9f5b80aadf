"""Drain-timed stage breakdown of one inference frame at 720p/250k/C16.

Each stage is jitted standalone and timed with device_time_drain (enqueue K,
one readback) — the same method bench.py uses, so numbers decompose the
bench FPS honestly. Usage: python scripts/stage_drain.py [tile_h tile_w]
"""
import sys

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import (
    RasterizeConfig, rasterize, _geom_table, order_ext,
)
from gags_tpu.splat import tiles
from gags_tpu.splat import pallas_kernel as pk
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.tiles import fast_gather_rows
from gags_tpu.utils.synthetic import make_scene, make_camera
from gags_tpu.utils.timing import device_time_drain

th = int(sys.argv[1]) if len(sys.argv) > 1 else 32
tw = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N, W, H = 250_000, 1280, 720
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (
    jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities")
)
feats = jnp.asarray(raw["features"])
cam = make_camera(W, H)
cfg = RasterizeConfig(tile_h=th, tile_w=tw, aligned=False,
                      fast_color_rows=True, budget_factor=3)
bg = jnp.zeros((16,), jnp.float32)
tiles_x, tiles_y = -(-W // tw), -(-H // th)
budget = cfg.instance_budget(N)


def stage(name, fn, arg, k=20):
    dt = device_time_drain(fn, arg, k=k, warmup=2)
    print(f"{name:28s} {dt*1000:7.3f} ms", flush=True)
    return dt


# full frame
@jax.jit
def full(f):
    return rasterize(means, quats, scales, opac, f, cam.viewmat, cam.K,
                     W, H, background=bg, config=cfg).image

t_full = stage("full rasterize", full, feats)

# projection only
@jax.jit
def proj_only(m):
    p = project_gaussians(m, quats, scales, cam.viewmat, cam.K, W, H)
    return p.means2d, p.radii, p.depths, p.conics

t_proj = stage("project", proj_only, means)

# project + bin
@jax.jit
def proj_bin(m):
    p = project_gaussians(m, quats, scales, cam.viewmat, cam.K, W, H)
    b = tiles.bin_gaussians(p.means2d, p.radii, p.depths, W, H, tw, th,
                            budget=budget, chunk=cfg.chunk, aligned=False)
    return b.inst_gid, b.tile_starts

t_pb = stage("project+bin", proj_bin, means)

# precompute binning for blend-only stages
p = project_gaussians(means, quats, scales, cam.viewmat, cam.K, W, H)
b = tiles.bin_gaussians(p.means2d, p.radii, p.depths, W, H, tw, th,
                        budget=budget, chunk=cfg.chunk, aligned=False)
geom, _ = _geom_table(p, opac)
perm = order_ext(b.order)
geom_r = geom[perm]
inst_gid = jax.block_until_ready(b.inst_gid)
print(f"  [M={inst_gid.shape[0]} valid={int(b.num_valid)} tiles={tiles_x*tiles_y}]")

# gather + blend (per-frame work given a cached binning)
@jax.jit
def gather_blend(f):
    fp = jnp.concatenate([f, jnp.zeros((1, 16))], 0)[perm]
    table = jnp.concatenate([geom_r, fp], axis=1)
    inst = fast_gather_rows(table, inst_gid).T
    return pk.tile_blend_forward(
        inst, b.tile_starts, b.tile_counts, bg,
        tiles_x=tiles_x, tiles_y=tiles_y, tile_h=th, tile_w=tw,
        chunk=cfg.chunk, aligned=False)

t_gb = stage("gather+blend", gather_blend, feats)

# blend only (pre-gathered instance data)
@jax.jit
def make_inst(f):
    fp = jnp.concatenate([f, jnp.zeros((1, 16))], 0)[perm]
    table = jnp.concatenate([geom_r, fp], axis=1)
    return fast_gather_rows(table, inst_gid).T

inst_data = jax.block_until_ready(make_inst(feats))

@jax.jit
def blend_only(inst):
    return pk.tile_blend_forward(
        inst, b.tile_starts, b.tile_counts, bg,
        tiles_x=tiles_x, tiles_y=tiles_y, tile_h=th, tile_w=tw,
        chunk=cfg.chunk, aligned=False)

t_bl = stage("blend only", blend_only, inst_data)

print(f"\nderived: bin = {1000*(t_pb - t_proj):.3f} ms, "
      f"gather = {1000*(t_gb - t_bl):.3f} ms, "
      f"tail (tiles->img etc) = {1000*(t_full - t_pb - t_gb):.3f} ms")
print(f"fps(full) = {1.0/t_full:.1f}")
