"""Round-end TPU hardware validation: forward parity, full-VJP parity, FPS."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.reference import rasterize_reference
from gags_tpu.utils.synthetic import make_scene, make_camera

print(jax.devices(), flush=True)

# ---- 1. forward parity at 128², 2000 gaussians --------------------------
raw = make_scene(2000, seed=1)
m, q, s, o = (jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities"))
c = jnp.asarray(raw["features"])
cam = make_camera(128, 128)
cfg = RasterizeConfig()
img = jax.jit(lambda *a: rasterize(*a, cam.viewmat, cam.K, 128, 128, config=cfg).image)(m, q, s, o, c)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    p = project_gaussians(m, q, s, cam.viewmat, cam.K, 128, 128)
    ref, _ = rasterize_reference(p.means2d, p.conics, p.depths, p.radii, o, c, 128, 128)
err = float(jnp.max(jnp.abs(img - jnp.asarray(np.asarray(ref)))))
print(f"forward parity max err: {err:.2e} {'OK' if err < 1e-3 else 'FAIL'}", flush=True)

# ---- 1b. INFERENCE fast-kernel parity (unaligned streaming path) --------
cfg_inf = RasterizeConfig(aligned=False)
img_f = jax.jit(
    lambda *a: rasterize(*a, cam.viewmat, cam.K, 128, 128, config=cfg_inf).image
)(m, q, s, o, c)
err_f = float(jnp.max(jnp.abs(img_f - jnp.asarray(np.asarray(ref)))))
print(f"fast-kernel parity max err: {err_f:.2e} {'OK' if err_f < 1e-3 else 'FAIL'}", flush=True)
cfg_bf = RasterizeConfig(aligned=False, fast_color_rows=True)
img_b = jax.jit(
    lambda *a: rasterize(*a, cam.viewmat, cam.K, 128, 128, config=cfg_bf).image
)(m, q, s, o, c)
err_b = float(jnp.max(jnp.abs(img_b - jnp.asarray(np.asarray(ref)))))
print(f"bf16-colour-rows max err: {err_b:.2e} {'OK' if err_b < 3e-2 else 'FAIL'} "
      "(expected ~1e-3 relative: colour rows quantised)", flush=True)

cfg_16 = RasterizeConfig(aligned=False, fast_color_rows=True, blend_bf16=True)
img_16 = jax.jit(
    lambda *a: rasterize(*a, cam.viewmat, cam.K, 128, 128, config=cfg_16).image
)(m, q, s, o, c)
scale16 = float(jnp.max(jnp.abs(jnp.asarray(np.asarray(ref))))) + 1e-8
err_16 = float(jnp.max(jnp.abs(img_16 - jnp.asarray(np.asarray(ref))))) / scale16
print(f"blend_bf16 rel max err: {err_16:.2e} {'OK' if err_16 < 5e-2 else 'FAIL'} "
      "(contract ~1e-2 relative: bf16 alpha/transmittance pipeline)", flush=True)

# ---- 1c. staged-kernel BIT-exactness on hardware -------------------------
# fused_keys claims bit-identity with the classic pipeline via
# HIGHEST-pinned one-hot matmuls; CPU tests run under
# jax_default_matmul_precision=highest and cannot catch a missing
# pin or a Mosaic lowering surprise — only this check can.
for flags in (
    {"fused_keys": True},
):
    try:
        cfg_v = RasterizeConfig(aligned=False, fast_color_rows=True, **flags)
        img_v = jax.jit(
            lambda *a, _c=cfg_v: rasterize(
                *a, cam.viewmat, cam.K, 128, 128, config=_c
            ).image
        )(m, q, s, o, c)
        bits = bool(jnp.all(img_v == img_b))
        print(f"{flags}: {'BIT-EXACT OK' if bits else 'FAIL (not bit-exact)'} "
              f"(max abs diff {float(jnp.max(jnp.abs(img_v - img_b))):.2e})",
              flush=True)
    except Exception as exc:
        # full text: the Mosaic error names the exact MLIR op that the
        # target rejected — truncating it costs a hardware round trip
        print(f"{flags}: COMPILE/RUN FAIL {exc}", flush=True)

# layout variants: SoA geometry (lane-major inputs, component projection
# core + direct u16 tables) and channel-major final image — both claim
# BIT-identity; verify on hardware where XLA layouts/fusions differ from
# the CPU interpreter
try:
    cfg_soa = RasterizeConfig(
        aligned=False, fast_color_rows=True, soa_geom=True, image_chw=True
    )
    img_soa = jax.jit(
        lambda mm, qq, ss, oo, cc: rasterize(
            mm, qq, ss, oo, cc, cam.viewmat, cam.K, 128, 128, config=cfg_soa
        ).image
    )(jnp.asarray(m.T), jnp.asarray(q.T), jnp.asarray(s.T), o, c)
    img_soa = jnp.transpose(img_soa, (1, 2, 0))
    bits = bool(jnp.all(img_soa == img_b))
    print(f"soa_geom+image_chw: {'BIT-EXACT OK' if bits else 'FAIL (not bit-exact)'} "
          f"(max abs diff {float(jnp.max(jnp.abs(img_soa - img_b))):.2e})",
          flush=True)
except Exception as exc:
    print(f"soa_geom+image_chw: COMPILE/RUN FAIL {exc!r:.300}", flush=True)

# ---- 2. full-VJP parity (geometry grads) --------------------------------
cfg_g = RasterizeConfig(geometry_grads=True, budget_factor=8)
raw2 = make_scene(400, seed=2)
m2, q2, s2 = (jnp.asarray(raw2[k]) for k in ("means", "quats", "scales"))
o2 = jnp.asarray(raw2["opacities"]) * 0.6  # avoid saturation
c2 = jnp.asarray(raw2["features"][:, :3])
tgt = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (128, 128, 3)).astype(np.float32))

def loss_tpu(mm, qq, ss, oo, cc):
    r = rasterize(mm, qq, ss, oo, cc, cam.viewmat, cam.K, 128, 128, config=cfg_g)
    return jnp.mean(jnp.abs(r.image - tgt)) + 0.1 * jnp.mean(r.alpha)

g_tpu = jax.jit(jax.grad(loss_tpu, argnums=(0, 1, 2, 3, 4)))(m2, q2, s2, o2, c2)

with jax.default_device(cpu):
    def loss_ref(mm, qq, ss, oo, cc):
        p = project_gaussians(mm, qq, ss, cam.viewmat, cam.K, 128, 128)
        img, alpha = rasterize_reference(
            p.means2d, p.conics, p.depths, p.radii, oo * p.compensations, cc, 128, 128
        )
        return jnp.mean(jnp.abs(img - tgt)) + 0.1 * jnp.mean(alpha)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(m2, q2, s2, o2, c2)

for name, a, b in zip(["means", "quats", "scales", "opac", "colors"], g_ref, g_tpu):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(a).max() + 1e-8
    rel = np.abs(a - b).max() / scale
    print(f"grad {name}: rel max err {rel:.2e} {'OK' if rel < 5e-3 else 'FAIL'}", flush=True)

# ---- 2b. binned training-path colour grads -------------------------------
# Compiles tile_blend_backward (the GAD step's colour backward), which NO
# other leg touches: battery 6 proved the full-VJP leg above can pass
# while this kernel fails Mosaic (the (2, G, C) gcol memref_slice bug was
# train_bench-only). Parity: binned colour grad vs the classic rasterize
# grad on the same scene.
from gags_tpu.splat.rasterizer import prepare_binning, rasterize_binned

cfg_t = RasterizeConfig(budget_factor=8)
binned = prepare_binning(m2, q2, s2, cam.viewmat, cam.K, 128, 128, cfg_t)
tgt16 = jnp.asarray(
    np.random.default_rng(3).uniform(0, 1, (128, 128, 16)).astype(np.float32)
)
c16 = jnp.asarray(raw2["features"])

def loss_binned(f):
    img_, _ = rasterize_binned(
        m2, q2, s2, o2, f, cam.viewmat, cam.K,
        binned.inst_gid, binned.tile_starts, binned.tile_counts,
        128, 128, config=cfg_t, order=binned.order,
        red_slot=binned.red.slot_to_pos, red_rank=binned.red.slot_rank,
        red_block=binned.red.chunk_block,
    )
    return jnp.mean(jnp.abs(img_ - tgt16))

def loss_classic(f):
    r = rasterize(m2, q2, s2, o2, f, cam.viewmat, cam.K, 128, 128, config=cfg_t)
    return jnp.mean(jnp.abs(r.image - tgt16))

try:
    gb = np.asarray(jax.jit(jax.grad(loss_binned))(c16))
    gc_ = np.asarray(jax.jit(jax.grad(loss_classic))(c16))
    relb = np.abs(gb - gc_).max() / (np.abs(gc_).max() + 1e-8)
    print(f"binned colour grad (tile_blend_backward): rel max err {relb:.2e} "
          f"{'OK' if relb < 5e-4 else 'FAIL'}", flush=True)
except Exception as exc:
    print(f"binned colour grad: COMPILE/RUN FAIL {exc!r:.300}", flush=True)

# ---- 3. headline FPS ------------------------------------------------------
raw3 = make_scene(250_000, seed=0, extent=3.0)
m3, q3, s3, o3 = (jnp.asarray(raw3[k]) for k in ("means", "quats", "scales", "opacities"))
c3 = jnp.asarray(raw3["features"])
cam3 = make_camera(1280, 720)
f = jax.jit(lambda *a: rasterize(*a, cam3.viewmat, cam3.K, 1280, 720, config=cfg).image)
img = f(m3, q3, s3, o3, c3); img.block_until_ready()
t0 = time.perf_counter()
for _ in range(30):
    img = f(m3, q3, s3, o3, c3)
img.block_until_ready()
dt = (time.perf_counter() - t0) / 30
print(f"720p 250k C16: {dt*1000:.1f} ms = {1/dt:.2f} FPS", flush=True)
