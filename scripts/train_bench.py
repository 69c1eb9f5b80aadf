"""Measure GAD training throughput on TPU: binned step, LERF-like scale."""
import sys, time
sys.path.insert(0, "/root/repo")
import os.path as _osp
sys.path.insert(0, _osp.dirname(_osp.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
import _retry  # noqa: F401 — persistent compile cache across re-execs
from gags_tpu.gad.train import GadConfig, create_train_state, frozen_geometry, make_train_step_binned
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import RasterizeConfig, prepare_binning
from gags_tpu.utils.synthetic import make_scene, make_camera

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
W, H = (int(x) for x in (sys.argv[2].split("x") if len(sys.argv) > 2 else ("640x360",))[0].split("x")) if False else (640, 360)
M_MASKS = 300

raw = make_scene(N, seed=0, extent=3.0)
scene = GaussianScene(
    means=jnp.asarray(raw["means"]), sh=jnp.asarray(raw["sh"]),
    opacities_raw=jnp.asarray(np.log(raw["opacities"]/(1-raw["opacities"]))),
    scales_raw=jnp.asarray(np.log(raw["scales"])), quats=jnp.asarray(raw["quats"]),
    semantic_features=jnp.zeros((N, 16)),
)
import os
# 32x32 is the measured training default (105 vs 112 ms/step at 8x128 —
# RasterizeConfig docstring); env overrides for tile sweeps
_th = int(os.environ.get("GAGS_TILE_H", "32"))
_tw = int(os.environ.get("GAGS_TILE_W", "32"))
# GAGS_FASTFWD=1: training forward on the streaming fast kernel
# (RasterizeConfig.fast_fwd_aligned A/B; grads untouched)
cfg = GadConfig(
    max_segments=1024,
    # GAGS_FSUP=0 disables the (now-default) fused supervision VJP A/B
    fused_supervision=os.environ.get("GAGS_FSUP", "1") == "1",
    # GAGS_DEC_BF16=1: mixed-precision decoders (bf16 matmuls, f32 params)
    decoder_bf16=os.environ.get("GAGS_DEC_BF16", "0") == "1",
    raster=RasterizeConfig(
        tile_h=_th, tile_w=_tw,
        fast_fwd_aligned=os.environ.get("GAGS_FASTFWD", "0") == "1",
        # GAGS_TRAIN_BF: training instance-budget trim A/B — every
        # M-length stream in the step (backward chunks, u16 table build,
        # reduction gather) scales with it; overflow is printed below and
        # must stay 0 for the number to count
        budget_factor=float(os.environ.get("GAGS_TRAIN_BF", "4.0")),
    ),
)
state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
geom = jax.device_put(frozen_geometry(scene))
cam = make_camera(W, H)

t0 = time.time()
b = prepare_binning(geom["means"], geom["quats"], geom["scales"], cam.viewmat, cam.K, W, H, cfg.raster, opacities=geom["opacities"])
jax.block_until_ready(b)
print(f"prepare_binning: {time.time()-t0:.1f}s (incl compile), "
      f"overflow={int(b.overflow)}, valid={int(b.num_valid)} of "
      f"budget {cfg.raster.instance_budget(N)} (bf={cfg.raster.budget_factor})",
      flush=True)

# GAGS_TRAIN_AUTOB=1: auto-tight budget from the measured valid count —
# mirrors cli/train_gad.py's loader (budget = valid rounded up +2 chunks)
if os.environ.get("GAGS_TRAIN_AUTOB", "0") == "1":
    import dataclasses as _dc
    tight = (int(b.num_valid) // cfg.raster.chunk + 2) * cfg.raster.chunk
    cfg = _dc.replace(cfg, raster=_dc.replace(cfg.raster, budget=tight))
    t0 = time.time()
    b = prepare_binning(geom["means"], geom["quats"], geom["scales"], cam.viewmat, cam.K, W, H, cfg.raster, opacities=geom["opacities"])
    jax.block_until_ready(b)
    print(f"auto-tight re-bin: {time.time()-t0:.1f}s, budget={tight}, "
          f"overflow={int(b.overflow)}", flush=True)
    assert int(b.overflow) == 0

rng = np.random.default_rng(1)
emb = rng.normal(size=(M_MASKS, 512)).astype(np.float16)
emb /= np.linalg.norm(emb.astype(np.float32), axis=1, keepdims=True).astype(np.float16)
seg = rng.integers(-1, M_MASKS, size=(H, W, 4)).astype(np.int32)
batch = dict(
    viewmat=cam.viewmat, K=cam.K, img_embed=jnp.asarray(emb), seg_map=jnp.asarray(seg),
    inst_gid=b.inst_gid, tile_starts=b.tile_starts, tile_counts=b.tile_counts, order=b.order,
    red_slot=b.red.slot_to_pos, red_rank=b.red.slot_rank, red_block=b.red.chunk_block,
)
step = make_train_step_binned(statics, W, H, cfg)
t0 = time.time()
state, m = step(state, geom, batch, jnp.float32(1e-3), jnp.float32(0.0))
jax.block_until_ready(m["loss"])
print(f"first step (compile): {time.time()-t0:.1f}s loss={float(m['loss']):.4f}", flush=True)
t0 = time.time()
iters = 20
for _ in range(iters):
    state, m = step(state, geom, batch, jnp.float32(1e-3), jnp.float32(0.0))
jax.block_until_ready(m["loss"])
dt = (time.time()-t0)/iters
print(f"train step: {dt*1000:.1f} ms = {1/dt:.2f} it/s  ({N} gaussians, {W}x{H}, 512-dim GT)", flush=True)
print(f"30k iterations would take {30000*dt/60:.1f} min", flush=True)
