"""Sweep blend tile shapes on TPU with slope timing: bin/gather/blend/full."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gags_tpu.splat import tiles
from gags_tpu.splat import pallas_kernel as pk
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize, _geom_table, order_ext
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.utils.synthetic import make_scene, make_camera
from gags_tpu.utils.timing import device_time

N, W, H = 250_000, 1280, 720
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities"))
feats = jnp.asarray(raw["features"])
cam = make_camera(W, H)

shapes = [(8, 128, 4), (8, 64, 5), (8, 32, 6), (16, 32, 5), (16, 64, 4), (32, 32, 4)]
for th, tw, bf in shapes:
    cfg = RasterizeConfig(tile_h=th, tile_w=tw, budget_factor=bf)
    tiles_x, tiles_y = -(-W // tw), -(-H // th)
    budget = cfg.instance_budget(N)

    proj = project_gaussians(means, quats, scales, cam.viewmat, cam.K, W, H)
    bin_fn = jax.jit(lambda m2, r, d: tiles.bin_gaussians(
        m2, r, d, W, H, tw, th, budget, cfg.chunk))
    binned = bin_fn(proj.means2d, proj.radii, proj.depths)
    jax.block_until_ready(binned)
    ov = int(binned.overflow)
    m = binned.inst_gid.shape[0]
    dt_bin = device_time(bin_fn, proj.means2d, proj.radii, proj.depths, k1=3, k2=13)

    def gather(p, b, o, f):
        geom = _geom_table(p, o)
        cp = jnp.concatenate([f, jnp.zeros((1, f.shape[1]))], 0)
        table = jnp.concatenate([geom, cp], axis=1)[order_ext(b.order)]
        return table[b.inst_gid].T

    g_fn = jax.jit(gather)
    inst = g_fn(proj, binned, opac, feats)
    jax.block_until_ready(inst)
    dt_gather = device_time(g_fn, proj, binned, opac, feats, k1=3, k2=13)

    blend_fn = jax.jit(lambda d, s, t: pk.tile_blend_forward(
        d, s, t, tiles_x=tiles_x, tiles_y=tiles_y, tile_h=th, tile_w=tw, chunk=cfg.chunk))
    out = blend_fn(inst, binned.tile_starts, binned.tile_counts)
    jax.block_until_ready(out)
    dt_blend = device_time(blend_fn, inst, binned.tile_starts, binned.tile_counts, k1=3, k2=13)

    full_fn = jax.jit(lambda mm, q, s, o, f: rasterize(
        mm, q, s, o, f, cam.viewmat, cam.K, W, H, config=cfg).image)
    img = full_fn(means, quats, scales, opac, feats)
    jax.block_until_ready(img)
    dt_full = device_time(full_fn, means, quats, scales, opac, feats, k1=3, k2=13)

    print(f"tile {th}x{tw} bf={bf}: M={m} ov={ov} bin={dt_bin*1e3:.1f} "
          f"gather={dt_gather*1e3:.1f} blend={dt_blend*1e3:.1f} full={dt_full*1e3:.1f} ms",
          flush=True)
