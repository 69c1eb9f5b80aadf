"""Is bf16 elementwise 2x f32 on this chip's VPU? Micro-probe.

Times a ~20-op elementwise chain (mix of mul/add/select/exp2/log1p like the
blend kernel's alpha path) on (8192, 512) arrays in f32 vs bf16, inside a
trivial Pallas kernel so XLA fusion choices don't differ.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gags_tpu.utils.timing import device_time_drain

R, C = 512, 256


def make(dtype):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        one = jnp.asarray(1.0, dtype)
        half = jnp.asarray(0.5, dtype)
        a = x * half + one
        b = a * a - x
        c = jnp.minimum(b, one)
        e = jnp.exp2(-c)
        f = e * half - b
        g = e * f + a
        h = g * e + f
        i = h + b * c
        j = jnp.exp2(i * jnp.asarray(-0.01, dtype))
        o_ref[:] = j + c

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), dtype),
            in_specs=[pl.BlockSpec((R, C), lambda: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, C), lambda: (0, 0), memory_space=pltpu.VMEM),
        )(x)

    return run


for dtype in (jnp.float32, jnp.bfloat16):
    x = jnp.asarray(
        jax.random.uniform(jax.random.PRNGKey(0), (R, C), jnp.float32), dtype
    )
    run = make(dtype)
    dt = device_time_drain(run, x, k=50, warmup=3)
    els = R * C
    print(f"{dtype.__name__}: {dt*1e6:8.2f} us/call "
          f"({els/dt/1e9:6.1f} Gelem/s)", flush=True)
