"""Break down the binned GAD train step cost on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.gad.train import GadConfig, create_train_state, frozen_geometry
from gags_tpu.gad import losses
from gags_tpu.gad.supervision import blend_gt_feature_map, mixed_seg_map
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import RasterizeConfig, prepare_binning, rasterize_binned
from gags_tpu.utils.synthetic import make_scene, make_camera

N, W, H, M_MASKS = 300_000, 640, 360, 300
raw = make_scene(N, seed=0, extent=3.0)
scene = GaussianScene(
    means=jnp.asarray(raw["means"]), sh=jnp.asarray(raw["sh"]),
    opacities_raw=jnp.asarray(np.log(raw["opacities"]/(1-raw["opacities"]))),
    scales_raw=jnp.asarray(np.log(raw["scales"])), quats=jnp.asarray(raw["quats"]),
    semantic_features=jnp.zeros((N, 16)),
)
cfg = GadConfig(max_segments=1024)
state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
geom = jax.device_put(frozen_geometry(scene))
cam = make_camera(W, H)
b = prepare_binning(geom["means"], geom["quats"], geom["scales"], cam.viewmat, cam.K, W, H, cfg.raster, opacities=geom["opacities"])
rng = np.random.default_rng(1)
emb = jnp.asarray((rng.normal(size=(M_MASKS,512))/np.sqrt(512)).astype(np.float32))
seg = jnp.asarray(rng.integers(-1, M_MASKS, size=(H, W, 4)).astype(np.int32))
bg = jnp.zeros((16,))
dec, scl = statics["decoder"], statics["scale_decoder"]

def t(name, f, *a):
    o = f(*a); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(10): o = f(*a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.1f} ms", flush=True)
    return o

render = jax.jit(lambda g, f: rasterize_binned(g["means"],g["quats"],g["scales"],g["opacities"],f,cam.viewmat,cam.K,b.inst_gid,b.tile_starts,b.tile_counts,W,H,background=bg,config=cfg.raster,order=b.order)[0])
fm = t("render fwd", render, geom, state.features)

render_bwd = jax.jit(lambda g, f: jax.grad(lambda ff: jnp.sum(rasterize_binned(g["means"],g["quats"],g["scales"],g["opacities"],ff,cam.viewmat,cam.K,b.inst_gid,b.tile_starts,b.tile_counts,W,H,background=bg,config=cfg.raster,order=b.order)[0]**2))(f))
t("render fwd+bwd", render_bwd, geom, state.features)

dec_f = jax.jit(lambda p, x: dec.apply(p, x))
t("decoder fwd", dec_f, state.decoder_params, fm)
dec_b = jax.jit(lambda p, x: jax.grad(lambda pp: jnp.sum(dec.apply(pp, x)**2))(p))
t("decoder fwd+bwd(params)", dec_b, state.decoder_params, fm)

scale_f = jax.jit(lambda p, x: scl.apply(p, x))
sm = t("scale dec fwd", scale_f, state.scale_params, fm)

gt_f = jax.jit(lambda e, s, m: blend_gt_feature_map(e, s, m))
gt, mask = t("gt blend fwd", gt_f, emb, seg, sm)

seg_f = jax.jit(lambda s, m: mixed_seg_map(s, m))
segm = t("mixed seg", seg_f, seg, sm)

l1_f = jax.jit(lambda a, bb, s: losses.region_balanced_l1(losses.l1_map(a, bb), s, 1024))
t("region L1", l1_f, gt, gt, segm)
rv_f = jax.jit(lambda x, s: losses.region_variance_loss(x, s, 1024))
t("region var", rv_f, fm, segm)
