"""Reproduce the battery-3 surface-scene 0.0% chunk-stop offline.

saturation_probe.py (oracle semantics) says the 32x32 tile exit should
fire at ~32% of the depth list on make_surface_scene, but the hardware
legs counted 0.0%. Run the REAL kernel (interpret mode) on the same
scene at reduced scale with the tuned flag set and print its own
counters next to the oracle prediction. If interpret also reads 0%,
the exit-condition bug is offline-reproducible; if it reads ~50%, the
discrepancy is hardware-only (Mosaic).

Usage: python scripts/exit_repro.py [W H N tile]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gags_tpu.splat.rasterizer import (
    RasterizeConfig, _blend_fwd_impl, _prepare,
)
from gags_tpu.utils.synthetic import make_camera, make_surface_scene

W = int(sys.argv[1]) if len(sys.argv) > 1 else 160
H = int(sys.argv[2]) if len(sys.argv) > 2 else 96
N = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
TT = int(sys.argv[4]) if len(sys.argv) > 4 else 32

surf = make_surface_scene(N, W, H, seed=3, opaque_frac=0.7)
cam = make_camera(W, H)
sm, sq, ss = (jnp.asarray(surf[k]) for k in ("means", "quats", "scales"))
so = jnp.asarray(surf["opacities"])
sf = jnp.asarray(surf["features"])
bg = jnp.zeros((16,), jnp.float32)

for bf16 in (True, False):
    cfg = RasterizeConfig(
        tile_h=TT, tile_w=TT, chunk=256, p_block=256, budget_factor=10.0,
        aligned=False, fast_color_rows=True, blend_bf16=bf16,
        fused_keys=True, image_chw=True, interpret=True,
    )
    tx, ty = -(-W // cfg.tile_w), -(-H // cfg.tile_h)
    pj, b, geom, _, _ = _prepare(sm, sq, ss, so, cam.viewmat, cam.K, W, H,
                                 cfg)
    assert int(b.overflow) == 0, int(b.overflow)
    _, _, st = _blend_fwd_impl(
        sf, geom, b.inst_gid, b.tile_starts, b.tile_counts, bg,
        (tx, ty), cfg, exit_stats=True,
    )
    st = np.asarray(st)[:, 0, :4]
    kd, kt = st[:, 2].sum(), max(st[:, 3].sum(), 1.0)
    sd, stot = st[:, 0].sum(), max(st[:, 1].sum(), 1.0)
    print(f"bf16={int(bf16)} tile={TT}: chunk-stop {1.0 - kd/kt:6.1%} "
          f"({int(kd)}/{int(kt)}), seg-stop {1.0 - sd/stot:6.1%} "
          f"({int(sd)}/{int(stot)}), valid={int(b.num_valid)}",
          flush=True)

# ---- per-tile ideal-vs-kernel comparison (last cfg's binning) ----
# For each tile: walk its OWN instance list in order, accumulate the
# UNGATED per-pixel log(1-alpha) (the kernel's exit quantity), find the
# chunk at which max-over-pixels crosses ln(1e-4), and compare with the
# kernel's own counter. Exposes WHERE the exit stalls (which pixels).
import math

st_all = st  # already (T, 4) from the loop's last iteration
order = np.argsort(np.asarray(pj.depths), kind="stable")
m2d = np.asarray(pj.means2d)
con = np.asarray(pj.conics)
op_ = np.asarray(so)
rad = np.asarray(pj.radii)
gid_of_rank = order
starts = np.asarray(b.tile_starts)
counts = np.asarray(b.tile_counts)
ranks = np.asarray(b.inst_gid)
g = cfg.chunk
eps_ln = math.log(1e-4)
print("tile | kernel kd/kt | ideal kd/kt | worst-px cum@end")
for t in range(min(len(starts), 15)):
    s0, cnt = int(starts[t]), int(counts[t])
    if cnt == 0:
        continue
    lead = s0 % g
    nch = -(-(lead + cnt) // g)
    gids = gid_of_rank[ranks[s0 : s0 + cnt] % len(order)]
    tyx, txx = divmod(t, tx)
    pxs = (np.arange(txx * cfg.tile_w, (txx + 1) * cfg.tile_w) + 0.5)[None, :]
    pys = (np.arange(tyx * cfg.tile_h, (tyx + 1) * cfg.tile_h) + 0.5)[:, None]
    cum = np.zeros((cfg.tile_h, cfg.tile_w), np.float64)
    crossed_at = -1
    for ci in range(nch):
        i0 = max(ci * g - lead, 0)
        i1 = min((ci + 1) * g - lead, cnt)
        for gi in gids[i0:i1]:
            dx = pxs - m2d[gi, 0]
            dy = pys - m2d[gi, 1]
            a, bq, cq = con[gi]
            sg = 0.5 * (a * dx * dx + cq * dy * dy) + bq * dx * dy
            al = np.minimum(0.999, op_[gi] * np.exp(-sg))
            al = np.where((rad[gi] > 0) & (sg >= 0) & (al >= 1 / 255.0),
                          al, 0.0)
            cum += np.log1p(-al)
        if cum.max() < eps_ln and crossed_at < 0:
            crossed_at = ci + 1
    ideal_kd = crossed_at if crossed_at > 0 else nch
    print(f"{t:4d} | {int(st_all[t, 2]):3d}/{int(st_all[t, 3]):3d} | "
          f"{ideal_kd:3d}/{nch:3d} | {cum.max():8.2f}")

# ---- discriminators: mxu_sigma off, and image parity vs the oracle ----
from gags_tpu.splat.rasterizer import rasterize
from gags_tpu.splat.reference import rasterize_reference

for ms in (True, False):
    c3 = RasterizeConfig(
        tile_h=TT, tile_w=TT, chunk=256, p_block=256, budget_factor=10.0,
        aligned=False, fast_color_rows=False, blend_bf16=False,
        fused_keys=True, interpret=True, mxu_sigma=ms,
    )
    pj3, b3, geom3, _, _ = _prepare(sm, sq, ss, so, cam.viewmat, cam.K,
                                    W, H, c3)
    _, _, st3 = _blend_fwd_impl(
        sf, geom3, b3.inst_gid, b3.tile_starts, b3.tile_counts, bg,
        (tx, ty), c3, exit_stats=True,
    )
    st3 = np.asarray(st3)[:, 0, :4]
    kd3, kt3 = st3[:, 2].sum(), max(st3[:, 3].sum(), 1.0)
    r3 = rasterize(sm, sq, ss, so, sf, cam.viewmat, cam.K, W, H,
                   background=bg, config=c3)
    ref_img, _ = rasterize_reference(
        pj3.means2d, pj3.conics, pj3.depths, pj3.radii, so, sf, W, H,
        background=bg)
    rel = float(np.max(np.abs(np.asarray(r3.image) - np.asarray(ref_img)))
                / (np.max(np.abs(np.asarray(ref_img))) + 1e-8))
    print(f"mxu_sigma={int(ms)}: chunk-stop {1.0 - kd3/kt3:6.1%} "
          f"({int(kd3)}/{int(kt3)}), image rel err vs oracle {rel:.3e}",
          flush=True)

# ---- kernel's own final max log_t per tile (stats lane 4) ----
c4 = RasterizeConfig(
    tile_h=TT, tile_w=TT, chunk=256, p_block=256, budget_factor=10.0,
    aligned=False, fast_color_rows=False, blend_bf16=False,
    fused_keys=True, interpret=True,
)
pj4, b4, geom4, _, _ = _prepare(sm, sq, ss, so, cam.viewmat, cam.K, W, H,
                                c4)
_, _, st4 = _blend_fwd_impl(
    sf, geom4, b4.inst_gid, b4.tile_starts, b4.tile_counts, bg,
    (tx, ty), c4, exit_stats=True,
)
st4 = np.asarray(st4)[:, 0, :5]
print("tile | kd/kt | final max log2 T (kernel) | eps =",
      math.log2(1e-4))
for t in range(min(len(st4), 15)):
    print(f"{t:4d} | {int(st4[t, 2]):3d}/{int(st4[t, 3]):3d} | "
          f"{st4[t, 4]:9.3f}")

# ---- spatial structure of the kernel-vs-oracle error ----
r4 = rasterize(sm, sq, ss, so, sf, cam.viewmat, cam.K, W, H,
               background=bg, config=c4)
ref4, _ = rasterize_reference(
    pj4.means2d, pj4.conics, pj4.depths, pj4.radii, so, sf, W, H,
    background=bg)
err = np.abs(np.asarray(r4.image) - np.asarray(ref4)).max(axis=-1)  # (H, W)
flat = np.argsort(err.ravel())[::-1][:12]
print("worst pixels: (y, x) -> err | tile (ty,tx) | in-tile (r,c)")
for f in flat:
    y, x = divmod(int(f), W)
    print(f"  ({y:3d},{x:3d}) -> {err[y, x]:.4f} | "
          f"({y // TT},{x // TT}) | ({y % TT:2d},{x % TT:2d})")
# error histogram by in-tile row to reveal slab/row structure
row_err = np.zeros(TT)
for r in range(TT):
    row_err[r] = err[r::TT, :].mean() if r < H else 0.0
top_rows = np.argsort(row_err)[::-1][:6]
print("highest-error in-tile rows:", top_rows.tolist(),
      [f"{row_err[r]:.5f}" for r in top_rows])
