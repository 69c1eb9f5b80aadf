"""Ablate blend-kernel cost drivers at 720p/250k/C16 (drain-timed).

Measures: baseline blend, FAKE_EXP (no transcendentals), NO_EARLY_EXIT,
gather with/without the (M,48)->(48,M) transpose, raw sort cost, and a
16x16-tile variant. Each variant re-imports the kernel module with the env
knob set (knobs are read at import time).
"""
import importlib
import os
import sys

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gags_tpu.splat import tiles
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


def setup(th, tw, budget_factor=4):
    cfg = RasterizeConfig(tile_h=th, tile_w=tw, aligned=False,
                          budget_factor=budget_factor)
    tiles_x, tiles_y = -(-W // tw), -(-H // th)
    p = project_gaussians(means, quats, scales, cam.viewmat, cam.K, W, H)
    b = tiles.bin_gaussians(p.means2d, p.radii, p.depths, W, H, tw, th,
                            budget=cfg.instance_budget(N), chunk=cfg.chunk,
                            aligned=False)
    geom = _geom_table(p, opac)
    perm = order_ext(b.order)
    table = jnp.concatenate(
        [geom[perm],
         jnp.concatenate([feats, jnp.zeros((1, 16))], 0)[perm]], axis=1)
    inst = jax.block_until_ready(fast_gather_rows(table, b.inst_gid).T)
    print(f"  tiles {th}x{tw}: M={b.inst_gid.shape[0]} valid={int(b.num_valid)} "
          f"overflow={int(b.overflow)}", flush=True)
    return cfg, b, table, inst, tiles_x, tiles_y


def blend_time(pk, cfg, b, inst, tiles_x, tiles_y):
    @jax.jit
    def f(x):
        return pk.tile_blend_forward(
            x, b.tile_starts, b.tile_counts, bg,
            tiles_x=tiles_x, tiles_y=tiles_y, tile_h=cfg.tile_h,
            tile_w=cfg.tile_w, chunk=cfg.chunk, aligned=False)
    return device_time_drain(f, inst, k=20, warmup=2)


def reload_pk(**env):
    for k in ("GAGS_FAKE_EXP", "GAGS_NO_EARLY_EXIT", "GAGS_TRI_MODE",
              "GAGS_SERIAL_DMA"):
        os.environ.pop(k, None)
    os.environ.update(env)
    import gags_tpu.splat.pallas_kernel as pk
    return importlib.reload(pk)


cfg, b, table, inst, tx, ty = setup(32, 32)

pk = reload_pk()
print(f"blend 32x32 baseline      {blend_time(pk, cfg, b, inst, tx, ty)*1e3:7.3f} ms", flush=True)
pk = reload_pk(GAGS_FAKE_EXP="1")
print(f"blend 32x32 FAKE_EXP      {blend_time(pk, cfg, b, inst, tx, ty)*1e3:7.3f} ms", flush=True)
pk = reload_pk(GAGS_NO_EARLY_EXIT="1")
print(f"blend 32x32 NO_EARLY_EXIT {blend_time(pk, cfg, b, inst, tx, ty)*1e3:7.3f} ms", flush=True)
pk = reload_pk(GAGS_TRI_MODE="default")
print(f"blend 32x32 TRI default   {blend_time(pk, cfg, b, inst, tx, ty)*1e3:7.3f} ms", flush=True)
pk = reload_pk()

# gather ablation
gid = b.inst_gid
t_g = device_time_drain(jax.jit(lambda t: fast_gather_rows(t, gid).T), table, k=20, warmup=2)
t_gnt = device_time_drain(jax.jit(lambda t: fast_gather_rows(t, gid)), table, k=20, warmup=2)
print(f"gather+transpose          {t_g*1e3:7.3f} ms", flush=True)
print(f"gather only (no .T)       {t_gnt*1e3:7.3f} ms", flush=True)

# sort ablation
m = gid.shape[0]
keys = jax.block_until_ready(
    jax.random.randint(jax.random.PRNGKey(0), (m,), 0, 2**30, dtype=jnp.int32))
t_s = device_time_drain(
    jax.jit(lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)[0]),
    keys, k=20, warmup=2)
print(f"lax.sort {m} i32 keys     {t_s*1e3:7.3f} ms", flush=True)

# 16x16 variant
cfg2, b2, table2, inst2, tx2, ty2 = setup(16, 16, budget_factor=8)
print(f"blend 16x16 baseline      {blend_time(pk, cfg2, b2, inst2, tx2, ty2)*1e3:7.3f} ms", flush=True)
cfg3, b3, table3, inst3, tx3, ty3 = setup(16, 32, budget_factor=6)
print(f"blend 16x32 baseline      {blend_time(pk, cfg3, b3, inst3, tx3, ty3)*1e3:7.3f} ms", flush=True)
