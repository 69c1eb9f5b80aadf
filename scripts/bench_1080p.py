"""1080p / 1M-Gaussian inference benchmark (BASELINE config 4), drain-timed.

History: r2 161 ms (6.2 FPS, two-key wide sort) -> r4 ~99 ms (10.1 FPS,
32x32 chunk256 bf16 fkeys chw). Round-5 attack (VERDICT r4 #5): the r4
number was declared a "structural floor at current pair count" without
attacking the pair count itself. Legs here:

  anchor  - the r4 winner, re-timed min-of-2 (noise guard)
  tiles   - tile-shape pair-count attack: 16x32 / 16x16. Pairs = valid
            instances x tile pixels; smaller tiles waste fewer border
            pixels per splat, so pair count FALLS even as the instance
            count rises (each instance covers fewer px). The per-chunk
            fixed cost rises with instance count -> chunk 256 throughout.
  soa     - lane-major geometry at the anchor config (r4 720p winner was
            soa; never tried at 1080p)
  trained - trained-statistics opacity mixture (70% near-1 mass, rest
            low): opacity-aware extents (projection.py contour shrink)
            + the kernel's tile early-exit fire the way they do on the
            reference's ACTUAL Mip-360-OVS working point
            (/root/reference/README.md:81 renders trained scenes, not
            U(0.2,0.95) fog). Reported next to the synthetic number.

Valid-instance counts (and so pair counts) are printed per leg via the
binner so the ledger has owners. Geometry is passed as jit ARGS (never
closed over: XLA would constant-fold projection/binning and the probe
would lie — NOTES.md).

  surface - make_surface_scene at 1080p/1M (heightfield with trained
            opacity stats — the fog remap above can't saturate rays, so
            its "trained" legs measure nothing the exit path can use)
            with block_exit off/on: the VERDICT r4 #5 pair-count attack
            at the workload where pairs actually die early.

Usage: python scripts/bench_1080p.py [anchor] [tiles] [soa] [trained] [surface]
       (default: all five legs)
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp
from _retry import reexec_on_transient
from gags_tpu.splat.rasterizer import (
    RasterizeConfig, rasterize, _prepare, soa_geometry,
)
from gags_tpu.utils.synthetic import make_scene, make_camera
from gags_tpu.utils.timing import device_time_drain

legs = set(sys.argv[1:]) or {"anchor", "tiles", "soa", "trained", "surface"}
N, W, H = 1_000_000, 1920, 1080
if bool(int(os.environ.get("GAGS_SMOKE", "0"))):  # tiny CPU dry run
    jax.config.update("jax_platforms", "cpu")
    N, W, H = 1500, 128, 64
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (
    jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities")
)
feats = jnp.asarray(raw["features"])
cam = make_camera(W, H)
bg = jnp.zeros((16,), jnp.float32)

# r4 winner as the base recipe; tile shape/budget per leg. bf=2 overflowed
# by 661646 at 32x32 (valid ~2.66M) — fractional budgets sized per shape,
# overflow asserted on every leg.
BASE = dict(aligned=False, fast_color_rows=True, blend_bf16=True,
            fused_keys=True, image_chw=True, chunk=256)
if bool(int(os.environ.get("GAGS_SMOKE", "0"))):
    BASE.update(interpret=True, chunk=8)


def run(label, cfg, o=opac, geom=None, k=10):
    m_, q_, s_ = geom if geom is not None else (means, quats, scales)

    @jax.jit
    def render(m, q, s, o_, f):
        return rasterize(m, q, s, o_, f, cam.viewmat, cam.K, W, H,
                         background=bg, config=cfg).image

    # eager pass: overflow + valid-count attribution (binner truth)
    res = reexec_on_transient(
        lambda: rasterize(m_, q_, s_, o, feats, cam.viewmat, cam.K, W, H,
                          background=bg, config=cfg))
    ovf = int(res.overflow)
    if ovf:
        print(f"{label:44s} OVERFLOW {ovf} (bf={cfg.budget_factor}) — "
              "skipped", flush=True)
        return None
    _, b, _, _, _ = jax.jit(
        lambda m, q, s, o_: _prepare(m, q, s, o_, cam.viewmat, cam.K,
                                     W, H, cfg)
    )(m_, q_, s_, o)
    nv = int(b.num_valid)
    pairs = nv * cfg.tile_h * cfg.tile_w
    dt = min(
        reexec_on_transient(
            lambda: device_time_drain(lambda f: render(m_, q_, s_, o, f),
                                      feats, k=k, warmup=2))
        for _ in range(2)
    )
    print(f"{label:44s} {dt*1e3:7.2f} ms ({1/dt:5.2f} FPS)  "
          f"valid={nv/1e6:.2f}M pairs={pairs/1e6:.0f}M", flush=True)
    return dt


if "anchor" in legs:
    run("anchor 32x32 bf=2.7",
        RasterizeConfig(tile_h=32, tile_w=32, budget_factor=2.7, **BASE))

if "tiles" in legs:
    # budget factors: instance count grows ~1.6-2.2x as tiles shrink
    # (more tiles per splat bbox) — start generous, tighten if 0 overflow
    for th, tw, bfs in ((16, 32, (4.5, 4.0)), (16, 16, (7.0, 6.0))):
        dt = None
        for bf in bfs:
            d = run(f"tiles {th}x{tw} bf={bf}",
                    RasterizeConfig(tile_h=th, tile_w=tw,
                                    budget_factor=bf, **BASE))
            if d is not None:
                dt = d
                break
        if dt is None:
            print(f"tiles {th}x{tw}: all budgets overflowed", flush=True)

if "soa" in legs:
    run("soa 32x32 bf=2.7",
        RasterizeConfig(tile_h=32, tile_w=32, budget_factor=2.7,
                        soa_geom=True, **BASE),
        geom=soa_geometry(means, quats, scales))

if "trained" in legs:
    # trained-like bimodal opacities (see trained_scene_bench.py): the
    # pruning floor removes <0.005 and sigmoid saturation piles mass >0.9
    rng = np.random.default_rng(7)
    opaque = rng.random(N) < 0.7
    lo = rng.uniform(0.01, 0.30, N).astype(np.float32)
    hi = rng.beta(14.0, 1.0, N).astype(np.float32)
    o_tr = jnp.asarray(np.where(opaque, hi, lo).astype(np.float32))
    run("trained-stats 32x32 bf=2.7 (opaque=70%)",
        RasterizeConfig(tile_h=32, tile_w=32, budget_factor=2.7, **BASE),
        o=o_tr)
    run("trained-stats 16x32 bf=4.5 (opaque=70%)",
        RasterizeConfig(tile_h=16, tile_w=32, budget_factor=4.5, **BASE),
        o=o_tr)

if "surface" in legs:
    from gags_tpu.utils.synthetic import make_surface_scene

    surf = make_surface_scene(N, W, H, seed=3, opaque_frac=0.7)
    sgeom = tuple(
        jnp.asarray(surf[k]) for k in ("means", "quats", "scales"))
    so = jnp.asarray(surf["opacities"])
    feats = jnp.asarray(surf["features"])  # run() reads the module global
    # aligned pancakes bin ~3x the fog instances — escalate the budget
    # until 0 overflow, auto-tighten from the valid count (train-step
    # recipe), then A/B block_exit at the tight budget
    from dataclasses import replace as _replace

    sbase = None
    for bf in (4.0, 6.0, 8.0, 10.0):
        sbase = RasterizeConfig(tile_h=32, tile_w=32, budget_factor=bf,
                                **BASE)
        r = reexec_on_transient(
            lambda: rasterize(*sgeom, so, feats, cam.viewmat, cam.K,
                              W, H, background=bg, config=sbase))
        if int(r.overflow) == 0:
            break
        print(f"  (surface: bf={bf} overflow {int(r.overflow)})",
              flush=True)
    _, b0, _, _, _ = jax.jit(
        lambda m, q, s, o_: _prepare(m, q, s, o_, cam.viewmat, cam.K,
                                     W, H, sbase)
    )(*sgeom, so)
    tight = (int(b0.num_valid) // sbase.chunk + 2) * sbase.chunk
    tcfg = _replace(sbase, budget=tight)
    r = reexec_on_transient(
        lambda: rasterize(*sgeom, so, feats, cam.viewmat, cam.K,
                          W, H, background=bg, config=tcfg))
    if int(r.overflow) == 0:
        sbase = tcfg
        print(f"  (surface budget tightened to {tight}, "
              f"valid {int(b0.num_valid)})", flush=True)
    for be in (False, True):
        run(f"SURFACE 32x32 tight block_exit={int(be)}",
            _replace(sbase, block_exit=be), o=so, geom=sgeom)
