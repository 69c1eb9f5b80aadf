"""Hardware compile sweep: EVERY Pallas kernel x flag combination that the
train/infer CLIs can reach, compiled AND executed on the real device at
tiny shapes.

Round 4 hit four Mosaic failures that only manifest on hardware (packed-
bf16 cmpf, f32->u16 casts, the (2,G,C) gcol memref_slice, the flat-view
value reshape) — the CPU interpreter enforces neither the (8,128) tiling
rules nor the target's op set, so the ONLY gate that catches this class
is compiling each reachable variant on-device. tpu_validate checks
numerics on a few configs; this sweep checks that the full flag matrix
COMPILES and runs finite. Exit code 1 if any leg fails.

Usage: python scripts/kernel_sweep.py  (~10-15 min: ~18 legs x ~30s compile)
"""
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.splat.rasterizer import (
    RasterizeConfig, prepare_binning, rasterize, rasterize_binned,
    soa_geometry,
)
from gags_tpu.utils.synthetic import make_scene, make_camera

print(jax.devices(), flush=True)

W = H = 128  # divisible by every tile shape in the matrix
raw = make_scene(3000, seed=0, extent=3.0)
means, quats, scales = (
    jnp.asarray(raw[k]) for k in ("means", "quats", "scales")
)
opac = jnp.asarray(raw["opacities"])
feats = jnp.asarray(raw["features"])  # (N, 16)
rgb = jnp.asarray(raw["features"][:, :3])
cam = make_camera(W, H)

failures = []


def leg(name, fn):
    t0 = time.time()
    try:
        out = fn()
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        finite = all(bool(jnp.all(jnp.isfinite(x))) for x in leaves
                     if jnp.issubdtype(x.dtype, jnp.floating))
        if not finite:
            raise AssertionError("non-finite output")
        print(f"PASS  {name}  ({time.time() - t0:.1f}s)", flush=True)
    except Exception as exc:  # noqa: BLE001 — a sweep must survive legs
        failures.append(name)
        tb = traceback.format_exc().strip().splitlines()[-1]
        print(f"FAIL  {name}  ({time.time() - t0:.1f}s): {repr(exc):.400}",
              flush=True)
        print(f"      {tb:.300}", flush=True)


def fwd(cfg, geom=None, f=None):
    m, q, s = geom if geom is not None else (means, quats, scales)
    ff = feats if f is None else f
    return jax.jit(
        lambda *a: rasterize(*a, cam.viewmat, cam.K, W, H, config=cfg).image
    )(m, q, s, opac, ff)


# ---- forward kernels: aligned (training) + fast (inference) matrix ------
# dimensions that change KERNEL code paths: tile shape, chunk, p_block,
# bf16 pipeline, colour-row dtype, fused-keys binning, cull columns,
# SoA projection core, CHW epilogue. (budget_factor/opacity_extents only
# change XLA-side sizes — one leg each is enough.)
FWD_LEGS = [
    ("aligned 32x32 c128 (train fwd)", RasterizeConfig()),
    ("aligned 16x16", RasterizeConfig(tile_h=16, tile_w=16)),
    ("aligned fast_fwd (GAGS_FASTFWD path)",
     RasterizeConfig(fast_fwd_aligned=True)),
    ("fast f32 32x32", RasterizeConfig(aligned=False)),
    ("fast rows16", RasterizeConfig(aligned=False, fast_color_rows=True)),
    ("fast bf16", RasterizeConfig(aligned=False, fast_color_rows=True,
                                  blend_bf16=True)),
    ("fast bf16 chunk256 pb256",
     RasterizeConfig(aligned=False, fast_color_rows=True, blend_bf16=True,
                     chunk=256, p_block=256)),
    ("fast bf16 fused_keys",
     RasterizeConfig(aligned=False, fast_color_rows=True, blend_bf16=True,
                     fused_keys=True)),
    ("fast bf16 tile_cull",
     RasterizeConfig(aligned=False, fast_color_rows=True, blend_bf16=True,
                     tile_cull=True)),
    ("fast bf16 16x32 pb512",
     RasterizeConfig(aligned=False, fast_color_rows=True, blend_bf16=True,
                     tile_h=16, tile_w=32, p_block=512)),
    ("fast bf16 16x16",
     RasterizeConfig(aligned=False, fast_color_rows=True, blend_bf16=True,
                     tile_h=16, tile_w=16)),
    ("fast no-extents", RasterizeConfig(aligned=False, fast_color_rows=True,
                                        opacity_extents=False)),
    # block_exit: per-p_block early termination (VMEM log-T scratch +
    # pl.when-gated slab compute + scalar tile-max carries) — new Mosaic
    # surface: sublane-sliced (p, 1) scratch stores, matmuls inside a
    # predicated region
    ("fast f32 block_exit", RasterizeConfig(aligned=False, block_exit=True)),
    ("fast bf16 block_exit c256 pb256",
     RasterizeConfig(aligned=False, fast_color_rows=True, blend_bf16=True,
                     chunk=256, p_block=256, block_exit=True)),
    ("fast bf16 block_exit 16x32",
     RasterizeConfig(aligned=False, fast_color_rows=True, blend_bf16=True,
                     tile_h=16, tile_w=32, block_exit=True)),
]
for name, cfg in FWD_LEGS:
    leg(name, lambda cfg=cfg: fwd(cfg))

# exit-stats variant (trained_scene_bench telemetry): extra (T, 8, 128)
# counter output + 3-tuple seg-loop carry — must compile on-device
def stats_leg():
    # via the public wrapper so the rank permutation is applied — the
    # old direct _blend_fwd_impl call fed the gid-ordered table and its
    # counters described a garbage workload (r5 batch-3 post-mortem)
    from gags_tpu.splat.rasterizer import rasterize_exit_stats

    cfg = RasterizeConfig(aligned=False, fast_color_rows=True,
                          blend_bf16=True, budget_factor=8)
    st, _ = jax.jit(
        lambda f: rasterize_exit_stats(
            means, quats, scales, opac, f, cam.viewmat, cam.K, W, H,
            config=cfg)
    )(feats)
    stn = np.asarray(st)
    assert (stn[:, 0, 2] <= stn[:, 0, 3]).all()
    return stn[:, 0, :4]


leg("fast bf16 exit_stats (counters output)", stats_leg)

# tuned-combo leg (the bench winner's full flag set, incl. SoA + CHW)
leg("fast TUNED combo (bf16+fkeys+chw+soa 16x32 c256)", lambda: fwd(
    RasterizeConfig(aligned=False, fast_color_rows=True, blend_bf16=True,
                    fused_keys=True, image_chw=True, soa_geom=True,
                    tile_h=16, tile_w=32, chunk=256, p_block=256,
                    budget_factor=3),
    geom=soa_geometry(means, quats, scales),
))

# ---- backward kernels -----------------------------------------------------
tgt16 = jnp.asarray(
    np.random.default_rng(3).uniform(0, 1, (H, W, 16)).astype(np.float32)
)
tgt3 = tgt16[:, :, :3]


def full_vjp(cfg, f, tgt):
    def loss(mm, qq, ss, oo, cc):
        r = rasterize(mm, qq, ss, oo, cc, cam.viewmat, cam.K, W, H,
                      config=cfg)
        return jnp.mean(jnp.abs(r.image - tgt)) + 0.1 * jnp.mean(r.alpha)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
        means, quats, scales, opac * 0.6, f
    )


leg("full VJP C16 (geometry grads)", lambda: full_vjp(
    RasterizeConfig(geometry_grads=True, budget_factor=8), feats, tgt16))
leg("full VJP C3 (RGB training)", lambda: full_vjp(
    RasterizeConfig(geometry_grads=True, budget_factor=8), rgb, tgt3))


def binned_grad(cfg, env=None):
    env = env or {}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        b = prepare_binning(means, quats, scales, cam.viewmat, cam.K, W, H,
                            cfg)

        def loss(f):
            img_, _ = rasterize_binned(
                means, quats, scales, opac, f, cam.viewmat, cam.K,
                b.inst_gid, b.tile_starts, b.tile_counts, W, H, config=cfg,
                order=b.order, red_slot=b.red.slot_to_pos,
                red_rank=b.red.slot_rank, red_block=b.red.chunk_block,
            )
            return jnp.mean(jnp.abs(img_ - tgt16))

        return jax.jit(jax.grad(loss))(feats)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


leg("binned colour grad FLAT c128 (train bwd default)",
    lambda: binned_grad(RasterizeConfig(budget_factor=8)))
leg("binned colour grad FLAT chunk256",
    lambda: binned_grad(RasterizeConfig(budget_factor=8, chunk=256)))
leg("binned colour grad ROWPAD (fallback)",
    lambda: binned_grad(RasterizeConfig(budget_factor=8),
                        env={"GAGS_BWD_ROWPAD": "1"}))
leg("binned colour grad FLAT + fast_fwd_aligned",
    lambda: binned_grad(RasterizeConfig(budget_factor=8,
                                        fast_fwd_aligned=True)))
leg("binned colour grad FLAT 16x16",
    lambda: binned_grad(RasterizeConfig(budget_factor=8, tile_h=16,
                                        tile_w=16)))

# ---- train-step composite (sorted_segment_sum + dense_segment_sum +
# supervision + decoders — everything the GAD CLI jits per step) ----------
def train_leg(fused_sup: bool):
    from gags_tpu.gad.train import (
        GadConfig, create_train_state, frozen_geometry,
        make_train_step_binned,
    )
    from gags_tpu.scene.gaussian_data import GaussianScene

    n = means.shape[0]
    o = np.clip(np.asarray(raw["opacities"]), 1e-4, 1 - 1e-4)
    scene = GaussianScene(
        means=means, sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(np.log(o / (1 - o))),
        scales_raw=jnp.log(scales), quats=quats,
        semantic_features=jnp.zeros((n, 16)),
    )
    gcfg = GadConfig(max_segments=64, fused_supervision=fused_sup,
                     raster=RasterizeConfig(budget_factor=8))
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), gcfg)
    geom = jax.device_put(frozen_geometry(scene))
    b = prepare_binning(geom["means"], geom["quats"], geom["scales"],
                        cam.viewmat, cam.K, W, H, gcfg.raster,
                        opacities=geom["opacities"])
    rng = np.random.default_rng(1)
    m_masks = 32
    emb = rng.normal(size=(m_masks, 512)).astype(np.float16)
    seg = rng.integers(-1, m_masks, size=(H, W, 4)).astype(np.int32)
    batch = dict(
        viewmat=cam.viewmat, K=cam.K, img_embed=jnp.asarray(emb),
        seg_map=jnp.asarray(seg), inst_gid=b.inst_gid,
        tile_starts=b.tile_starts, tile_counts=b.tile_counts, order=b.order,
        red_slot=b.red.slot_to_pos, red_rank=b.red.slot_rank,
        red_block=b.red.chunk_block,
    )
    step = make_train_step_binned(statics, W, H, gcfg)
    state2, metrics = step(state, geom, batch, jnp.float32(1e-3),
                           jnp.float32(0.0))
    return metrics["loss"]


leg("GAD train step (binned, default flags)", lambda: train_leg(False))
leg("GAD train step (fused_supervision)", lambda: train_leg(True))

print(flush=True)
if failures:
    print(f"SWEEP FAIL: {len(failures)} leg(s): {failures}", flush=True)
    sys.exit(1)
print("SWEEP OK: all kernel/flag combinations compile and run finite",
      flush=True)
