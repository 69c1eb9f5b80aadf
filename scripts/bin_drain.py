"""Drain-timed unaligned-binning breakdown: classic vs fused_keys.

Times the full bin under each variant plus the separable pieces
(expand_gid, expand_keys, the (M,)-row u16 gather it replaces, a
matched-size single-key sort) so the fused-vs-classic decision and the
kernels' VPU costs are readable directly. One TPU client at a time.

Usage: python scripts/bin_drain.py [N] [W H]
"""
import sys

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from gags_tpu.splat import tiles
from gags_tpu.splat import pallas_kernel as pk
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.rasterizer import RasterizeConfig, _cull_rows
from gags_tpu.utils.synthetic import make_scene, make_camera
from gags_tpu.utils.timing import device_time_drain

args = [int(a) for a in sys.argv[1:]]
N = args[0] if args else 250_000
W, H = (args[1], args[2]) if len(args) > 2 else (1280, 720)
TW = TH = 32

print(jax.devices(), flush=True)
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (
    jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities")
)
cam = make_camera(W, H)
cfg = RasterizeConfig(tile_h=TH, tile_w=TW, aligned=False, budget_factor=3)
proj = project_gaussians(
    means, quats, scales, cam.viewmat, cam.K, W, H, opacities=opac
)
cull = _cull_rows(proj, opac)
budget = cfg.instance_budget(N)


def stage(name, fn, arg, k=20):
    dt = device_time_drain(fn, arg, k=k, warmup=2)
    print(f"{name:32s} {dt*1000:7.3f} ms", flush=True)
    return dt


# r4 fix: the first battery passed cull_rows to BOTH legs, so "fused=1"
# timed the 14.8 ms cull kernel, not the fusion (tile_cull defaults OFF
# since r4) — time the production no-cull base, plus one cull leg for
# the record.
for fused, use_cull in ((False, False), (True, False), (True, True)):
    @jax.jit
    def binf(m2, rx, ry, d, cr, _f=fused):
        return tiles.bin_gaussians(
            m2, rx, d, W, H, TW, TH, budget=budget, chunk=cfg.chunk,
            aligned=False, radii_y=ry, cull_rows=cr, fused_keys=_f,
        ).inst_gid

    cr_arg = cull if use_cull else None
    stage(f"bin_gaussians fused={int(fused)} cull={int(use_cull)}",
          lambda m2: binf(m2, proj.radii_x, proj.radii_y, proj.depths,
                          cr_arg),
          proj.means2d)

# --- separable pieces at matched sizes -----------------------------------
m_real = ((budget + 127) // 128) * 128
kk = pk.EXPAND_K
nc = -(-m_real // kk)
rng = np.random.default_rng(0)
# synthetic monotone offsets with ~N owners over m_real slots
counts = np.maximum(rng.poisson(m_real / N, N), 0)
inc = np.cumsum(counts)
offsets = jnp.asarray(np.concatenate([[0], inc[:-1]]).astype(np.int32))
inc_j = jnp.asarray(inc.astype(np.int32))
g_lo_sb = jnp.searchsorted(
    inc_j, jnp.arange(nc * (kk // pk.KEYS_SB), dtype=jnp.int32) * pk.KEYS_SB,
    side="right",
).astype(jnp.int32)

n_pad = N + pk.EXPAND_W + 128
off_tbl = jnp.zeros((8, n_pad), jnp.int32).at[0, :N].set(offsets).at[0, N:].set(
    tiles.INT32_MAX
)
stage("expand_gid (narrowed)",
      jax.jit(lambda t: pk.expand_gid(t, g_lo_sb)), off_tbl)

pad16 = pk.EXPAND_KW + 128
tbl16 = jnp.zeros((16, N + pad16), jnp.float32).at[0, :N].set(
    jnp.minimum(offsets, m_real).astype(jnp.float32)
).at[0, N:].set(float(m_real)).at[3, :].set(1.0)
stage("expand_keys (fused, no cull)",
      jax.jit(lambda t: pk.expand_keys(
          t, g_lo_sb, jnp.int32(m_real), shift=max(1, N.bit_length()),
          tiles_x=-(-W // TW), tile_w=TW, tile_h=TH, has_cull=False,
          key_u32=False,
      )[0]), tbl16)
stage("expand_keys (fused, cull)",
      jax.jit(lambda t: pk.expand_keys(
          t, g_lo_sb, jnp.int32(m_real), shift=max(1, N.bit_length()),
          tiles_x=-(-W // TW), tile_w=TW, tile_h=TH, has_cull=True,
          key_u32=False,
      )[0]), tbl16)

tbl2 = jnp.asarray(rng.integers(0, 2**20, (N, 2)).astype(np.int32))
idx = jnp.asarray(rng.integers(0, N, m_real).astype(np.int32))
stage("fast_gather_rows (M, 2)",
      jax.jit(lambda i: tiles.fast_gather_rows(tbl2, i)), idx)
tbl8 = jnp.asarray(rng.integers(0, 2**20, (N, 8)).astype(np.int32))
stage("fast_gather_rows (M, 8)",
      jax.jit(lambda i: tiles.fast_gather_rows(tbl8, i)), idx)

keys = jnp.asarray(rng.integers(0, 2**31 - 1, m_real).astype(np.int32))
stage("lax.sort M keys",
      jax.jit(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False)[0]),
      keys)
