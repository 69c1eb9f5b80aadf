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

Usage: python scripts/trained_scene_bench.py [opaque_frac ...]
       (default sweeps 0.0 / 0.3 / 0.5 / 0.7)
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
    RasterizeConfig, rasterize, _blend_fwd_impl, _prepare,
)
from gags_tpu.utils.synthetic import make_scene, make_camera
from gags_tpu.utils.timing import device_time_drain

N, W, H = 250_000, 1280, 720
fracs = [float(a) for a in sys.argv[1:]] or [0.0, 0.3, 0.5, 0.7]

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
        _, b, geom, _, _ = _prepare(m, q, s, o_, cam.viewmat, cam.K, W, H,
                                    cfg)
        _, _, st = _blend_fwd_impl(
            f, geom, b.inst_gid, b.tile_starts, b.tile_counts, bg,
            (tx, ty), cfg, exit_stats=True,
        )
        return st

    st = np.asarray(reexec_on_transient(
        lambda: stats_pass(means, quats, scales, o, feats)))[:, 0, :4]
    kd, kt = st[:, 2].sum(), max(st[:, 3].sum(), 1.0)
    print(f"{label:28s} {dt*1000:7.3f} ms = {1.0/dt:6.2f} FPS | "
          f"chunk-stop {1.0 - kd/kt:6.1%} ({int(kd)}/{int(kt)} chunks run)",
          flush=True)
