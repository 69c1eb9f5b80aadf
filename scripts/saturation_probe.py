"""Why is chunk-stop 0.0% on the surface scene at hardware shapes?

Round-5 battery-3 measured the 720p/250k surface legs at 0.0% chunk-stop
on the TPU (32x32 tiles) while the CPU smoke (8x16 tiles) showed 56.6% —
the tile-level exit needs EVERY pixel of the tile to saturate, so the
open question is the per-pixel/per-tile saturation structure of the
scene, not the kernel. This probe answers it offline with the oracle's
exact include-rule semantics (reference.py): per pixel, the depth-order
index at which the ray retires (the CUDA reference's done flag,
gsplat rasterize_impl); per 32x32 tile, the max over its pixels
(= the chunk at which OUR tile exit could fire) and the fraction of
never-retired pixels (one such pixel pins the whole tile to the end).

Scale-reduced run (same per-pixel optical-depth statistics by
make_surface_scene's density-invariant sigma rule): default 320x180,
n=20k. Pure CPU, vectorized scan — run niced next to a battery.

Usage: python scripts/saturation_probe.py [W H N opaque_frac]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.reference import ALPHA_CLAMP, ALPHA_FLOOR, T_EPS
from gags_tpu.utils.synthetic import make_camera, make_surface_scene

W = int(sys.argv[1]) if len(sys.argv) > 1 else 320
H = int(sys.argv[2]) if len(sys.argv) > 2 else 180
N = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
OP = float(sys.argv[4]) if len(sys.argv) > 4 else 0.7
TH = TW = 32

surf = make_surface_scene(N, W, H, seed=3, opaque_frac=OP)
cam = make_camera(W, H)
pj = project_gaussians(
    jnp.asarray(surf["means"]), jnp.asarray(surf["quats"]),
    jnp.asarray(surf["scales"]), cam.viewmat, cam.K, W, H,
)
order = jnp.argsort(pj.depths)

px = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]
py = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None]


def step(carry, g):
    T, kill_idx, idx = carry
    mean, conic, opac, radius = g
    dx = px - mean[0]
    dy = py - mean[1]
    sigma = 0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) + conic[1] * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, opac * jnp.exp(-sigma))
    live = (radius > 0) & (sigma >= 0.0) & (alpha >= ALPHA_FLOOR)
    alpha = jnp.where(live, alpha, 0.0)
    next_t = T * (1.0 - alpha)
    kill = (alpha > 0.0) & (next_t < T_EPS) & (kill_idx < 0)
    kill_idx = jnp.where(kill, idx, kill_idx)
    T = jnp.where((alpha > 0.0) & (kill_idx < 0), next_t, T)
    return (T, kill_idx, idx + 1), None


init = (
    jnp.ones((H, W), jnp.float32),
    jnp.full((H, W), -1, jnp.int32),
    jnp.int32(0),
)
g = (pj.means2d[order], pj.conics[order],
     jnp.asarray(surf["opacities"])[order], pj.radii[order])
(T, kill_idx, _), _ = jax.jit(
    lambda init, g: jax.lax.scan(step, init, g)
)(init, g)
T = np.asarray(T)
kill = np.asarray(kill_idx)

alive = kill < 0
print(f"scene {W}x{H} n={N} opaque={OP:.0%}: "
      f"{alive.mean():.2%} of pixels never retire "
      f"(final T: median {np.median(T):.2e}, p90 {np.quantile(T, .9):.2e})")
ret = kill[~alive]
if ret.size:
    print(f"retired pixels: kill-depth median {np.median(ret):.0f} "
          f"p90 {np.quantile(ret, .9):.0f} max {ret.max()} of {N}")

# per-tile: the chunk at which OUR tile-level exit could fire
ty, tx = -(-H // TH), -(-W // TW)
pad_kill = np.full((ty * TH, tx * TW), -1, np.int32)
pad_kill[:H, :W] = np.where(alive, np.iinfo(np.int32).max, kill)
# image-padding pixels never see splats -> treat as retired at 0 (the
# kernel's padded lanes blend nothing; opm=0 keeps log_t at 0 forever
# though -- report both conventions)
tiles = pad_kill.reshape(ty, TH, tx, TW).transpose(0, 2, 1, 3).reshape(ty * tx, -1)
in_img = np.zeros((ty * TH, tx * TW), bool)
in_img[:H, :W] = True
in_tiles = in_img.reshape(ty, TH, tx, TW).transpose(0, 2, 1, 3).reshape(ty * tx, -1)
tile_max = np.where(in_tiles, tiles, 0).max(axis=1)
never = (tile_max == np.iinfo(np.int32).max)
print(f"tiles {ty}x{tx}: {never.mean():.2%} contain a never-retiring "
      f"pixel (tile exit can NEVER fire there)")
ok = tile_max[~never]
if ok.size:
    print(f"exiting tiles: exit depth median {np.median(ok):.0f} "
          f"p90 {np.quantile(ok, .9):.0f} of {N} total splats")
# how much of a tile's pixel population is the never-retiring tail?
frac_alive_per_tile = np.where(in_tiles, tiles == np.iinfo(np.int32).max,
                               False).sum(1) / in_tiles.sum(1)
print(f"per-tile never-retiring pixel fraction: median "
      f"{np.median(frac_alive_per_tile):.2%}, p90 "
      f"{np.quantile(frac_alive_per_tile, .9):.2%}")
# p_block slabs (256 px = 8 rows of 32): block_exit granularity
PB_ROWS = 8
slabs = pad_kill.reshape(ty, TH // PB_ROWS, PB_ROWS, tx, TW)
slabs = slabs.transpose(0, 3, 1, 2, 4).reshape(-1, PB_ROWS * TW)
in_slabs = in_img.reshape(ty, TH // PB_ROWS, PB_ROWS, tx, TW)
in_slabs = in_slabs.transpose(0, 3, 1, 2, 4).reshape(-1, PB_ROWS * TW)
m = in_slabs.any(1)
slab_max = np.where(in_slabs, slabs, 0).max(axis=1)[m]
print(f"p_block=256 slabs: {(slab_max == np.iinfo(np.int32).max).mean():.2%} "
      f"never exit; exiting median {np.median(slab_max[slab_max < np.iinfo(np.int32).max]) if (slab_max < np.iinfo(np.int32).max).any() else -1:.0f}")
