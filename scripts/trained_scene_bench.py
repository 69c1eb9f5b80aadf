"""FPS on a TRAINED-statistics scene: the apples-to-apples headline.

The bench.py headline scene draws opacities U(0.2, 0.95) — almost no
pixel saturates, so the reference's main interactive-rate lever
(per-pixel early termination on trained scenes, where sigmoid-saturated
opacities cluster near 1) never fires; NOTES' early-exit sim measured
ZERO tile-exit upside there. Real trained 3DGS scenes are bimodal:
pruning removes opacity < 0.005 and a large mass sits > 0.9. This probe
re-times the SAME tuned 720p/250k/C16 frame with opacities remapped to
a trained-like mixture (fraction `opaque` near-1, rest low), so the
kernel's existing tile-level exit gets the workload the 4090 reference
actually runs. Headline bench.py is left untouched for cross-round
comparability — this number is the honest trained-scene counterpart.

Round-5 addition: the fog scene above has SPOTTY per-pixel coverage —
even at opaque=70% most rays never cross T < 1e-4, so no exit scheme can
fire (battery 1b measured chunk-stop 0.0%). The SURFACE legs re-run the
A/B on make_surface_scene (heightfield filling the frustum, every ray
hits opaque splats within a short depth prefix — the actual trained-3DGS
workload) with block_exit off/on, which is where the reference's
interactive rates come from (per-pixel thread retirement in the CUDA
rasterizer).

Usage: python scripts/trained_scene_bench.py [opaque_frac ...]
       (default sweeps 0.0 / 0.3 / 0.5 / 0.7, then the surface legs)
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp

from _retry import reexec_on_transient

from gags_tpu.splat.rasterizer import (
    RasterizeConfig, _prepare, rasterize, rasterize_exit_stats,
)
from gags_tpu.utils.synthetic import make_scene, make_camera
from gags_tpu.utils.timing import device_time_drain

N, W, H = 250_000, 1280, 720
fracs = [float(a) for a in sys.argv[1:]] or [0.0, 0.3, 0.5, 0.7]
# GAGS_TSB_TILE=16x16 overrides the tuned tile shape (surface-scene exit
# granularity A/B: a 1024-px tile exits only when ALL its pixels die)
_tile_env = os.environ.get("GAGS_TSB_TILE", "")
SMOKE = bool(int(os.environ.get("GAGS_SMOKE", "0")))  # tiny CPU dry run
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
    N, W, H, fracs = 600, 64, 32, [0.7]

raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales = (
    jnp.asarray(raw[k]) for k in ("means", "quats", "scales")
)
feats = jnp.asarray(raw["features"])
cam = make_camera(W, H)
bg = jnp.zeros((16,), jnp.float32)

# tuned config straight from the persisted bench tune (fall back to the
# measured round-4 winner if the cache is missing/stale)
try:
    with open("/root/repo/.gags_bench_tune.json") as f:
        cfg = RasterizeConfig(**json.load(f)["config"])
except Exception:
    cfg = RasterizeConfig(tile_h=32, tile_w=32, chunk=256, p_block=256,
                          budget_factor=2.2, aligned=False,
                          fast_color_rows=True, blend_bf16=True,
                          tile_cull=False, fused_keys=True)
if SMOKE:
    from dataclasses import replace as _rep
    cfg = _rep(cfg, interpret=True, tile_h=8, tile_w=16, chunk=8,
               p_block=32, budget_factor=8.0, soa_geom=False)
if _tile_env:
    from dataclasses import replace as _rep2
    _th, _tw = (int(v) for v in _tile_env.split("x"))
    cfg = _rep2(cfg, tile_h=_th, tile_w=_tw,
                p_block=min(cfg.p_block, _th * _tw),
                budget_factor=max(cfg.budget_factor, 4.0))
print(f"cfg: {cfg.tile_h}x{cfg.tile_w} chunk={cfg.chunk} "
      f"bf16={cfg.blend_bf16} fkeys={cfg.fused_keys} "
      f"bf={cfg.budget_factor} soa={cfg.soa_geom}", flush=True)

if cfg.soa_geom:  # the tuned winner may be the lane-major-geometry config
    from gags_tpu.splat.rasterizer import soa_geometry

    means, quats, scales = soa_geometry(means, quats, scales)

rng = np.random.default_rng(7)
base_opac = np.asarray(raw["opacities"])


@jax.jit
def full(m, q, s, o, f):
    return rasterize(m, q, s, o, f, cam.viewmat, cam.K,
                     W, H, background=bg, config=cfg).image


for frac in fracs:
    if frac <= 0.0:
        opac = base_opac
        label = "bench U(0.2,0.95)"
    else:
        opaque = rng.random(N) < frac
        lo = rng.uniform(0.01, 0.30, N).astype(np.float32)
        hi = rng.beta(14.0, 1.0, N).astype(np.float32)  # mode ~0.96
        opac = np.where(opaque, hi, lo).astype(np.float32)
        label = f"trained-like opaque={frac:.0%}"
    o = jnp.asarray(opac)
    dt = reexec_on_transient(
        lambda: device_time_drain(lambda f: full(means, quats, scales, o, f),
                                  feats, k=20, warmup=2))
    # the kernel's OWN early-termination counters (VERDICT r4 #7): per-
    # tile (segments done, total, chunks done, total) from exit_stats
    tx, ty = -(-W // cfg.tile_w), -(-H // cfg.tile_h)

    @jax.jit
    def stats_pass(m, q, s, o_, f):
        st, _ = rasterize_exit_stats(m, q, s, o_, f, cam.viewmat, cam.K,
                                     W, H, background=bg, config=cfg)
        return st

    st = np.asarray(reexec_on_transient(
        lambda: stats_pass(means, quats, scales, o, feats)))[:, 0, :4]
    kd, kt = st[:, 2].sum(), max(st[:, 3].sum(), 1.0)
    print(f"{label:28s} {dt*1000:7.3f} ms = {1.0/dt:6.2f} FPS | "
          f"chunk-stop {1.0 - kd/kt:6.1%} ({int(kd)}/{int(kt)} chunks run)",
          flush=True)

# ---- SURFACE scene legs: block_exit A/B on the saturating workload ----
# (heavier than the fog scene: aligned 6.5-px-sigma pancakes bin to ~3x
# the instance count — budget escalates until 0 overflow, pair count is
# printed so the A/B has a denominator)
from dataclasses import replace

from gags_tpu.utils.synthetic import make_surface_scene

for opaque_frac in ((0.7,) if SMOKE else (0.7, 0.9)):
    surf = make_surface_scene(N, W, H, seed=3, opaque_frac=opaque_frac)
    sm, sq, ss, so, sf = (
        jnp.asarray(surf[k])
        for k in ("means", "quats", "scales", "opacities", "features")
    )
    if cfg.soa_geom:
        sm, sq, ss = soa_geometry(sm, sq, ss)

    base = None
    for bf in (6.0, 8.0, 10.0):
        base = replace(cfg, budget_factor=bf)
        r = reexec_on_transient(
            lambda: rasterize(sm, sq, ss, so, sf, cam.viewmat, cam.K,
                              W, H, background=bg, config=base))
        if int(r.overflow) == 0:
            break
        print(f"  (surface op={opaque_frac:.0%}: bf={bf} overflow "
              f"{int(r.overflow)})", flush=True)

    # auto-tight budget from the measured valid count (train-step recipe)
    _, b0, _, _, _ = jax.jit(
        lambda m, q, s, o_: _prepare(m, q, s, o_, cam.viewmat, cam.K,
                                     W, H, base)
    )(sm, sq, ss, so)
    tight = (int(b0.num_valid) // base.chunk + 2) * base.chunk
    tbase = replace(base, budget=tight)
    r = reexec_on_transient(
        lambda: rasterize(sm, sq, ss, so, sf, cam.viewmat, cam.K,
                          W, H, background=bg, config=tbase))
    if int(r.overflow) == 0:
        base = tbase
        print(f"  (surface op={opaque_frac:.0%}: budget tightened to "
              f"{tight}, valid {int(b0.num_valid)})", flush=True)

    # variants: plain, slab-level exit, and ellipse-tile cull + exit
    # (tile_cull lost 5.4 ms on the fog scene but the surface scene's
    # aligned pancakes have bbox tiles their ellipse never touches)
    variants = [("block_exit=0", dict(block_exit=False)),
                ("block_exit=1", dict(block_exit=True))]
    if not SMOKE:
        variants.append(("exit+cull", dict(block_exit=True,
                                           tile_cull=True)))
    for vlabel, vflags in variants:
        c2 = replace(base, **vflags)

        @jax.jit
        def surf_full(m, q, s, o_, f, c2=c2):
            return rasterize(m, q, s, o_, f, cam.viewmat, cam.K,
                             W, H, background=bg, config=c2).image

        dt = reexec_on_transient(
            lambda: device_time_drain(
                lambda f: surf_full(sm, sq, ss, so, f), sf, k=20, warmup=2))

        @jax.jit
        def surf_stats(m, q, s, o_, f, c2=c2):
            return rasterize_exit_stats(m, q, s, o_, f, cam.viewmat,
                                        cam.K, W, H, background=bg,
                                        config=c2)

        st, nv = reexec_on_transient(
            lambda: surf_stats(sm, sq, ss, so, sf))
        st = np.asarray(st)[:, 0, :4]
        kd, kt = st[:, 2].sum(), max(st[:, 3].sum(), 1.0)
        label = f"SURFACE op={opaque_frac:.0%} {vlabel}"
        print(f"{label:28s} {dt*1000:7.3f} ms = {1.0/dt:6.2f} FPS | "
              f"chunk-stop {1.0 - kd/kt:6.1%} "
              f"({int(kd)}/{int(kt)} chunks run) | "
              f"valid={int(nv)/1e6:.2f}M "
              f"pairs={int(nv)*cfg.tile_h*cfg.tile_w/1e6:.0f}M",
              flush=True)
