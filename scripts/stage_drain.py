"""Drain-timed stage breakdown of one inference frame at 720p/250k/C16.

Stages mirror the PRODUCTION unaligned pipeline exactly (opacity-aware
extents + ellipse-tile cull + fast streaming kernel), decomposing the
bench FPS honestly: full = prepare (project+bin+geom) + permutes +
blend impl + tiles->image. Geometry is always a jit ARG (never closed
over — XLA constant-folds closures and the probe lies).

Usage: python scripts/stage_drain.py [tile_h tile_w] [bf16] [chunk256] [fkeys] [chw] [soa]
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from _retry import reexec_on_transient
from gags_tpu.splat.rasterizer import (
    RasterizeConfig, rasterize, _blend_fwd_impl, _cull_rows, _geom_table,
    _image_epilogue, _prepare, order_ext, permute_rows,
)
from gags_tpu.splat import tiles as tiles_mod
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.utils.synthetic import make_scene, make_camera
from gags_tpu.utils.timing import device_time_drain

args = [a for a in sys.argv[1:]]
N, W, H = 250_000, 1280, 720
raw = make_scene(N, seed=0, extent=3.0)
means, quats, scales, opac = (
    jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities")
)
feats = jnp.asarray(raw["features"])
cam = make_camera(W, H)
if "tuned" in args:
    # decompose exactly the frame bench.py recorded: the persisted winner
    import json

    with open("/root/repo/.gags_bench_tune.json") as fh:
        cfg = RasterizeConfig(**json.load(fh)["config"])
    th, tw, bf16 = cfg.tile_h, cfg.tile_w, cfg.blend_bf16
else:
    bf16 = "bf16" in args
    dims = [int(a) for a in args if a.isdigit()]
    th = dims[0] if dims else 32
    tw = dims[1] if len(dims) > 1 else 32
    bfac = next(
        (float(a.split("=")[1]) for a in args if a.startswith("bf=")), 3.0)
    cfg = RasterizeConfig(tile_h=th, tile_w=tw, aligned=False,
                          fast_color_rows=True, budget_factor=bfac,
                          blend_bf16=bf16,
                          chunk=256 if "chunk256" in args else 128,
                          fused_keys="fkeys" in args,
                          image_chw="chw" in args,
                          soa_geom="soa" in args)
if cfg.soa_geom:  # lane-major geometry: scene store layout choice
    means = jnp.asarray(means.T)
    quats = jnp.asarray(quats.T)
    scales = jnp.asarray(scales.T)
print(f"cfg: {th}x{tw} bf16={bf16} chunk={cfg.chunk} bf={cfg.budget_factor} "
      f"fkeys={cfg.fused_keys} "
      f"chw={cfg.image_chw} soa={cfg.soa_geom}", flush=True)
bg = jnp.zeros((16,), jnp.float32)
tiles_x, tiles_y = -(-W // tw), -(-H // th)


def stage(name, fn, arg, k=20):
    # battery 8 lost this probe to a mid-run tunnel FAILED_PRECONDITION —
    # recover by re-exec (fresh JAX client), see scripts/_retry.py
    dt = reexec_on_transient(
        lambda: device_time_drain(fn, arg, k=k, warmup=2))
    print(f"{name:28s} {dt*1000:7.3f} ms", flush=True)
    return dt


@jax.jit
def full(m, q, s, o, f):
    return rasterize(m, q, s, o, f, cam.viewmat, cam.K,
                     W, H, background=bg, config=cfg).image

t_full = stage("full rasterize", lambda f: full(means, quats, scales, opac, f), feats)

@jax.jit
def proj_only(m, q, s, o):
    if cfg.soa_geom:
        from gags_tpu.splat.projection import project_gaussians_soa

        c = project_gaussians_soa(m, q, s, cam.viewmat, cam.K, W, H,
                                  opacities=o)
        return c.mx, c.my, c.rx, c.depth, c.ca, c.cb, c.cc
    p = project_gaussians(m, q, s, cam.viewmat, cam.K, W, H, opacities=o)
    return p.means2d, p.radii_x, p.depths, p.conics

t_proj = stage("project", lambda m: proj_only(m, quats, scales, opac), means)

@jax.jit
def prep(m, q, s, o):
    _, binned, geom, _, _ = _prepare(m, q, s, o, cam.viewmat, cam.K, W, H, cfg)
    return binned.inst_gid, binned.tile_starts, binned.tile_counts, geom

t_prep = stage("prepare (proj+bin+geom)", lambda m: prep(m, quats, scales, opac), means)

# production blend stage with precomputed binning (all passed as args)
_, b, geom, _, _ = jax.jit(
    lambda m, q, s, o: _prepare(m, q, s, o, cam.viewmat, cam.K, W, H, cfg)
)(means, quats, scales, opac)
perm = order_ext(b.order)
inv_perm = jnp.argsort(perm).astype(jnp.int32)
print(f"  [M={b.inst_gid.shape[0]} valid={int(b.num_valid)} "
      f"tiles={tiles_x * tiles_y} overflow={int(b.overflow)}]")

_to_img, _ = _image_epilogue(cfg)  # matches the cfg's kernel output layout


@jax.jit
def blend_stage(f, geom_t, order, invo, gid, starts, counts):
    if cfg.soa_geom:
        # mirror the production SoA path exactly (rasterizer.py soa
        # branch): pre-split u16 colours BEFORE the rank permute, u16
        # row-gathers, direct _blend_fwd_impl call
        fp = jnp.concatenate([f, jnp.zeros((1, f.shape[1]), f.dtype)])
        col_u16 = (
            jax.lax.bitcast_convert_type(fp.astype(jnp.bfloat16), jnp.uint16)
            if cfg.fast_color_rows
            else tiles_mod.u16_halves(fp)
        )
        perm = order_ext(order)
        ti, ta = _blend_fwd_impl(
            f, geom_t[perm], gid, starts, counts, bg,
            (tiles_x, tiles_y), cfg,
            pre_split_colors=col_u16[perm], c_true=f.shape[1],
        )
    else:
        ti, ta = _blend_fwd_impl(
            permute_rows(f, order, invo[: order.shape[0]]),
            permute_rows(geom_t, order_ext(order), invo),
            gid, starts, counts, bg, (tiles_x, tiles_y), cfg,
        )
    return _to_img(ti, tiles_x, tiles_y, th, tw, H, W)

t_blend = stage(
    "permute+blend+to_image",
    lambda f: blend_stage(f, geom, b.order, inv_perm, b.inst_gid,
                          b.tile_starts, b.tile_counts),
    feats,
)

print(f"\nderived: bin = {1000*(t_prep - t_proj):.3f} ms, "
      f"fixed-binning frame = {1000*t_blend:.3f} ms, "
      f"residual (full - prep - blend) = {1000*(t_full - t_prep - t_blend):.3f} ms")
print(f"fps(full) = {1.0/t_full:.1f}")

# ---- sub-attribution of the blend stage (non-SoA path only) ----
# Each piece jitted separately with data-dependent inputs as ARGS; the
# fused stage above is the honest stage time — these assign owners to
# it (separately-timed pieces can sum above the fused time because XLA
# overlaps DMA across the fusion boundary).
pairs = int(b.num_valid) * (th * tw)
n_chunks = int(-(-int(b.num_valid) // cfg.chunk))  # lower bound (per-tile cdiv rounds up)

if not cfg.soa_geom:
    @jax.jit
    def permutes(f, g, order, invo):
        return (permute_rows(f, order, invo[: order.shape[0]]),
                permute_rows(g, order_ext(order), invo))

    rows_f, rows_g = permutes(feats, geom, b.order, inv_perm)
    t_perm = stage(
        "  permutes (colour+geom)",
        lambda f: permutes(f, geom, b.order, inv_perm), feats)

    @jax.jit
    def kernel_only(rf, rg, gid, starts, counts):
        return _blend_fwd_impl(rf, rg, gid, starts, counts, bg,
                               (tiles_x, tiles_y), cfg)

    ti0, _ = kernel_only(rows_f, rows_g, b.inst_gid, b.tile_starts,
                         b.tile_counts)
    t_kern = stage(
        "  blend kernel",
        lambda rf: kernel_only(rf, rows_g, b.inst_gid, b.tile_starts,
                               b.tile_counts)[0],
        rows_f,
    )

    t_img = stage(
        "  tiles->image epilogue",
        lambda t: _to_img(t, tiles_x, tiles_y, th, tw, H, W), ti0)
    print(f"  (sub-sum = {1000*(t_perm + t_kern + t_img):.3f} ms "
          f"vs fused stage {1000*t_blend:.3f} ms)")
else:
    # SoA path: same owners, soa-flavoured inputs (pre-split colours
    # BEFORE the rank permute, direct _blend_fwd_impl with
    # pre_split_colors — mirrors the rasterizer's soa branch)
    fp = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]), feats.dtype)])
    col_u16_t = (
        jax.lax.bitcast_convert_type(fp.astype(jnp.bfloat16), jnp.uint16)
        if cfg.fast_color_rows else tiles_mod.u16_halves(fp)
    )
    perm_s = order_ext(b.order)

    @jax.jit
    def permutes_soa(cu, g, p):
        return cu[p], g[p]

    rows_c, rows_g = permutes_soa(col_u16_t, geom, perm_s)
    t_perm = stage(
        "  permutes (colour+geom)",
        lambda cu: permutes_soa(cu, geom, perm_s), col_u16_t)

    @jax.jit
    def kernel_only_soa(rc, rg, gid, starts, counts):
        return _blend_fwd_impl(
            feats, rg, gid, starts, counts, bg, (tiles_x, tiles_y), cfg,
            pre_split_colors=rc, c_true=feats.shape[1],
        )

    ti0, _ = kernel_only_soa(rows_c, rows_g, b.inst_gid, b.tile_starts,
                             b.tile_counts)
    t_kern = stage(
        "  blend kernel",
        lambda rc: kernel_only_soa(rc, rows_g, b.inst_gid, b.tile_starts,
                                   b.tile_counts)[0],
        rows_c,
    )
    t_img = stage(
        "  tiles->image epilogue",
        lambda t: _to_img(t, tiles_x, tiles_y, th, tw, H, W), ti0)
    print(f"  (sub-sum = {1000*(t_perm + t_kern + t_img):.3f} ms "
          f"vs fused stage {1000*t_blend:.3f} ms)")

# ---- speed-of-light ledger at THIS config (VERDICT r4 #1b) -------------
# The round-4 ledger was fit at the untuned 32x32 f32 stats and its
# 16.6 ms "minimum" was beaten by the 14.9 ms measurement — re-derive
# the per-pair and per-chunk costs from what was actually drained here.
ps_pair = t_kern * 1e12 / max(pairs, 1)
print(f"\nledger @ {th}x{tw} chunk={cfg.chunk} bf16={cfg.blend_bf16}:")
print(f"  pairs = {pairs/1e6:.1f}M ({int(b.num_valid)} valid inst x "
      f"{th*tw} px), chunks >= {n_chunks}")
print(f"  blend kernel {1000*t_kern:.3f} ms -> {ps_pair:.1f} ps/pair "
      f"(r3 f32 VPU-floor fit was 22 ps/pair + 0.56 us/chunk)")
print(f"  frame = project {1000*t_proj:.3f} + bin {1000*(t_prep-t_proj):.3f}"
      f" + permutes {1000*t_perm:.3f} + blend {1000*t_kern:.3f}"
      f" + epilogue {1000*t_img:.3f}"
      f" = {1000*(t_prep + t_perm + t_kern + t_img):.3f} ms"
      f" (measured full {1000*t_full:.3f} ms)")
