"""Chunk-size sweep for the inference blend (drain-timed)."""
import sys

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gags_tpu.splat import tiles, pallas_kernel as pk
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.rasterizer import RasterizeConfig, _geom_table, order_ext
from gags_tpu.splat.tiles import fast_gather_rows
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

for th, tw, chunk in [(32, 32, 128), (32, 32, 256), (32, 32, 512),
                      (16, 32, 256), (16, 32, 512), (32, 64, 256)]:
    cfg = RasterizeConfig(tile_h=th, tile_w=tw, aligned=False, chunk=chunk,
                          budget_factor=8)
    tiles_x, tiles_y = -(-W // tw), -(-H // th)
    p = project_gaussians(means, quats, scales, cam.viewmat, cam.K, W, H)
    b = tiles.bin_gaussians(p.means2d, p.radii, p.depths, W, H, tw, th,
                            budget=cfg.instance_budget(N), chunk=chunk,
                            aligned=False)
    geom = _geom_table(p, opac)
    perm = order_ext(b.order)
    table = jnp.concatenate(
        [geom[perm], jnp.concatenate([feats, jnp.zeros((1, 16))], 0)[perm]], 1)
    inst = jax.block_until_ready(fast_gather_rows(table, b.inst_gid).T)

    @jax.jit
    def f(x):
        return pk.tile_blend_forward(
            x, b.tile_starts, b.tile_counts, bg,
            tiles_x=tiles_x, tiles_y=tiles_y, tile_h=th, tile_w=tw,
            chunk=chunk, aligned=False)

    dt = device_time_drain(f, inst, k=20, warmup=2)
    print(f"tile {th}x{tw} chunk {chunk}: {dt*1e3:7.3f} ms "
          f"(valid={int(b.num_valid)})", flush=True)
