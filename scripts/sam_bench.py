"""SAM ViT-H image-encoder throughput on one TPU chip (SURVEY hard part #3).

Random weights (no checkpoints in env) — throughput depends only on shapes.
Reference comparison: the torch SAM ViT-H encoder runs ~0.25-0.45 s/image
on an RTX 3090/4090 class GPU at 1024x1024 (the GAS stage's dominant cost,
reference preprocess.py:464-502).

Usage: python scripts/sam_bench.py [batch] [bf16]
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from gags_tpu.models.sam import SAMConfig, ImageEncoder
from gags_tpu.utils.timing import device_time_drain

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
use_bf16 = len(sys.argv) > 2 and sys.argv[2] == "bf16"

cfg = SAMConfig.vit_h()
enc = ImageEncoder(cfg)
rng = jax.random.PRNGKey(0)
x = jnp.zeros((batch, cfg.image_size, cfg.image_size, 3), jnp.float32)
params = enc.init(rng, x)
if use_bf16:
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )
    x = x.astype(jnp.bfloat16)

n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
print(f"ViT-H encoder params: {n_params/1e6:.1f}M, batch={batch}, "
      f"dtype={'bf16' if use_bf16 else 'f32'}", flush=True)

fwd = jax.jit(lambda p, im: enc.apply(p, im))
out = fwd(params, x)
jax.block_until_ready(out)
print("output:", out.shape, out.dtype, flush=True)
dt = device_time_drain(fwd, params, x, k=10)
print(f"encoder: {dt*1e3:.1f} ms/batch = {dt/batch*1e3:.1f} ms/image "
      f"= {batch/dt:.2f} img/s", flush=True)
