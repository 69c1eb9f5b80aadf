"""Profile the SAM ViT-H image encoder on TPU: per-op HLO self times.

The encoder is the GAS stage's wall (106 ms/img bf16 batch-4 = 9.4 img/s
vs a ~26 ms/img v5e MXU roofline for ViT-H's ~5.2 TFLOP at 4096 tokens,
i.e. ~25% MXU utilisation). This attributes the other 75%: window
partition reshapes, rel-pos math, layernorms, the 4 global flash blocks
vs the 28 windowed blocks. Counterpart of the reference's torch SAM
encoder (`segment_anything` pip dep, driven at preprocess.py:526).

Usage: python scripts/sam_profile.py [batch] [bf16|f32]
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

from _retry import reexec_on_transient
from gags_tpu.models.sam import SAM, SAMConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
use_bf16 = (sys.argv[2] if len(sys.argv) > 2 else "bf16") == "bf16"

cfg = SAMConfig.vit_h()
sam = SAM(cfg)
rng = jax.random.PRNGKey(0)
img0 = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
pts0 = jnp.zeros((2, 1, 2), jnp.float32)
lbl0 = jnp.zeros((2, 1), jnp.int32)
params = sam.init(rng, img0, pts0, lbl0)
if use_bf16:
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )

encode = jax.jit(
    lambda imgs: sam.apply(params, imgs, method="encode_image")
)
imgs = jnp.asarray(
    np.random.default_rng(0)
    .normal(size=(B, cfg.image_size, cfg.image_size, 3))
    .astype(np.float32)
)
# the compile + first execution is where two batteries died on tunnel
# broken pipes — recover with a fresh process (see scripts/_retry.py)
e = reexec_on_transient(lambda: jax.block_until_ready(encode(imgs)))

K = 3
out = "/tmp/gags_sam_trace"

def _traced():
    with jax.profiler.trace(out):
        e = None
        for _ in range(K):
            e = encode(imgs)
        jax.block_until_ready(e)
        np.asarray(e).ravel()[:1]

reexec_on_transient(_traced)

from xprof.convert import raw_to_tool_data as rtd
import glob, json, collections

f = sorted(glob.glob(out + "/plugins/profile/*/*.xplane.pb"))[-1:]
data, _ = rtd.xspace_to_tool_data(f, "hlo_stats", {})
j = json.loads(data)
cols = [c["label"] for c in j["cols"]]
tot = collections.defaultdict(float)
cat = {}
catsum = collections.defaultdict(float)
for r in j["rows"]:
    d = dict(zip(cols, [c.get("v") for c in r["c"]]))
    key = (d.get("HLO op name") or "?")[:70]
    t = float(d.get("Total self time (us)") or 0)
    tot[key] += t
    catsum[d.get("HLO op category") or "?"] += t
    cat[key] = (d.get("HLO op category"), d.get("Bound by"), (d.get("HLO op text") or "")[:110])
print(f"\n=== SAM encoder per-op self time (us per batch-{B} call, {K} calls) ===")
for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
    c, bb, txt = cat[k]
    print(f"{v/K:9.1f} us  {k}  [{c} | {bb}]")
    print(f"            {txt}")
print("\n=== by category (ms/call) ===")
for k, v in sorted(catsum.items(), key=lambda kv: -kv[1]):
    print(f"{v/K/1000:8.2f} ms  {k}")
total = sum(tot.values()) / K / 1000
print(f"TOTAL device {total:.2f} ms/call = {total/B:.2f} ms/img "
      f"({1000*B/total:.2f} img/s)")
