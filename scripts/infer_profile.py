"""Profile one inference frame (geometry as ARGS — no constant folding) and
print per-op HLO self times. Usage: python scripts/infer_profile.py [th tw]"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.synthetic import make_scene, make_camera

_ints = [a for a in sys.argv[1:] if a.isdigit()]
th = int(_ints[0]) if _ints else 32
tw = int(_ints[1]) if len(_ints) > 1 else 32
N, W, H = 250_000, 1280, 720
raw = make_scene(N, seed=0, extent=3.0)
m, q, s, o = (jnp.asarray(raw[k]) for k in ("means", "quats", "scales", "opacities"))
c = jnp.asarray(raw["features"])
cam = make_camera(W, H)
cfg = RasterizeConfig(tile_h=th, tile_w=tw, aligned=False)
if "tuned" in sys.argv:
    # profile the BENCH WINNER frame (what the headline measures), not
    # the base config — attribution must match the number being chased
    import dataclasses as _dc
    import json as _json

    rec = _json.load(open("/root/repo/.gags_bench_tune.json"))
    fields = {f.name for f in _dc.fields(RasterizeConfig)}
    cfg = RasterizeConfig(
        **{k: v for k, v in rec["config"].items() if k in fields}
    )
    if cfg.soa_geom:
        from gags_tpu.splat.rasterizer import soa_geometry

        m, q, s = soa_geometry(m, q, s)
    print(f"tuned cfg: {cfg}", flush=True)
bg = jnp.zeros((16,), jnp.float32)

@jax.jit
def fwd(m_, q_, s_, o_, c_):
    return rasterize(m_, q_, s_, o_, c_, cam.viewmat, cam.K, W, H,
                     background=bg, config=cfg).image

img = fwd(m, q, s, o, c); jax.block_until_ready(img)
K = 5
out = "/tmp/gags_infer_trace"
with jax.profiler.trace(out):
    for _ in range(K):
        img = fwd(m, q, s, o, c)
    jax.block_until_ready(img)
    np.asarray(img[0, 0, 0])

from xprof.convert import raw_to_tool_data as rtd
import glob, json, collections

f = sorted(glob.glob(out + "/plugins/profile/*/*.xplane.pb"))[-1:]
data, _ = rtd.xspace_to_tool_data(f, "hlo_stats", {})
j = json.loads(data)
cols = [cc["label"] for cc in j["cols"]]
tot = collections.defaultdict(float)
txt = {}
for r in j["rows"]:
    d = dict(zip(cols, [cc.get("v") for cc in r["c"]]))
    key = (d.get("HLO op name") or "?")[:60]
    tot[key] += float(d.get("Total self time (us)") or 0)
    txt[key] = (d.get("HLO op text") or "")[:100]
print(f"=== tile {th}x{tw}: per-op self time (us/frame) ===")
for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:22]:
    print(f"{v/K:9.1f} us  {k}")
    print(f"           {txt[k]}")
print("TOTAL device", sum(tot.values()) / K / 1000, "ms/frame")
