"""Profile the binned GAD train step on TPU and print per-op HLO self times.

Finds where the fwd+bwd composition spends time (VERDICT round-1 weak #2:
step parts summed to ~100 ms while the step measured 197 ms)."""
import sys

sys.path.insert(0, "/root/repo")
import os.path as _osp
sys.path.insert(0, _osp.dirname(_osp.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
import _retry  # noqa: F401 — persistent compile cache across re-execs
from gags_tpu.gad.train import GadConfig, create_train_state, frozen_geometry, make_train_step_binned
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import prepare_binning
from gags_tpu.utils.synthetic import make_scene, make_camera

N, W, H, M_MASKS = 300_000, 640, 360, 300
raw = make_scene(N, seed=0, extent=3.0)
scene = GaussianScene(
    means=jnp.asarray(raw["means"]), sh=jnp.asarray(raw["sh"]),
    opacities_raw=jnp.asarray(np.log(raw["opacities"] / (1 - raw["opacities"]))),
    scales_raw=jnp.asarray(np.log(raw["scales"])), quats=jnp.asarray(raw["quats"]),
    semantic_features=jnp.zeros((N, 16)),
)
import os as _os

from gags_tpu.splat.rasterizer import RasterizeConfig as _RC

# same env A/B legs as train_bench so profiles attribute the same code
cfg = GadConfig(
    max_segments=1024,
    fused_supervision=_os.environ.get("GAGS_FSUP", "0") == "1",
    decoder_bf16=_os.environ.get("GAGS_DEC_BF16", "0") == "1",
    raster=_RC(
        fast_fwd_aligned=_os.environ.get("GAGS_FASTFWD", "0") == "1",
    ),
)
state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
geom = jax.device_put(frozen_geometry(scene))
cam = make_camera(W, H)
b = prepare_binning(geom["means"], geom["quats"], geom["scales"], cam.viewmat, cam.K, W, H, cfg.raster, opacities=geom["opacities"])
jax.block_until_ready(b)
rng = np.random.default_rng(1)
emb = rng.normal(size=(M_MASKS, 512)).astype(np.float16)
seg = rng.integers(-1, M_MASKS, size=(H, W, 4)).astype(np.int32)
batch = dict(
    viewmat=cam.viewmat, K=cam.K, img_embed=jnp.asarray(emb), seg_map=jnp.asarray(seg),
    inst_gid=b.inst_gid, tile_starts=b.tile_starts, tile_counts=b.tile_counts, order=b.order,
    red_slot=b.red.slot_to_pos, red_rank=b.red.slot_rank, red_block=b.red.chunk_block,
)
step = make_train_step_binned(statics, W, H, cfg)
state, m = step(state, geom, batch, jnp.float32(1e-3), jnp.float32(0.0))
jax.block_until_ready(m["loss"])

K = 5
out = "/tmp/gags_train_trace"
with jax.profiler.trace(out):
    for _ in range(K):
        state, m = step(state, geom, batch, jnp.float32(1e-3), jnp.float32(0.0))
    jax.block_until_ready(m["loss"])
    np.asarray(m["loss"])

from xprof.convert import raw_to_tool_data as rtd
import glob, json, collections

f = sorted(glob.glob(out + "/plugins/profile/*/*.xplane.pb"))[-1:]
data, _ = rtd.xspace_to_tool_data(f, "hlo_stats", {})
j = json.loads(data)
cols = [c["label"] for c in j["cols"]]
tot = collections.defaultdict(float)
cat = {}
for r in j["rows"]:
    d = dict(zip(cols, [c.get("v") for c in r["c"]]))
    key = (d.get("HLO op name") or "?")[:70]
    tot[key] += float(d.get("Total self time (us)") or 0)
    cat[key] = (d.get("HLO op category"), d.get("Bound by"), (d.get("HLO op text") or "")[:110])
print(f"\n=== per-op self time (us/step, {K} steps) ===")
for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
    c, bb, txt = cat[k]
    print(f"{v/K:9.1f} us  {k}  [{c} | {bb}]")
    print(f"            {txt}")
print("TOTAL device", sum(tot.values()) / K / 1000, "ms/step")
