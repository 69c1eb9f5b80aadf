"""Does explicit slab-looping beat whole-block elementwise chains in Mosaic?

Hypothesis test for the blend kernel's 22 ps/pair VPU floor: if Mosaic
compiles each (P, G) elementwise op as a full VMEM-to-VMEM pass (per-op
temp streaming), then re-expressing the same chain as a fori_loop over
row slabs small enough for the whole chain to live in vector registers
should cut the per-element cost. If the cost is invariant, Mosaic is
already tiling+fusing and the floor is architectural.

Chain mirrors the blend alpha path (~12 op-equivalents incl. 2 exp2).
"""
import functools
import sys

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gags_tpu.utils.timing import device_time_drain

P, G = 1024, 128
REPS = 24  # chain applications per kernel call (amortise call overhead)


def chain(x, lt, dtype):
    # compares/selects run on f32 EXTENSIONS of the working dtype — the
    # Mosaic v5e target has no packed-bf16 cmpf ("Target does not support
    # this comparison", r4 battery), matching the production bf16 blend
    # leg which does the same.
    one = jnp.asarray(1.0, dtype)
    half = jnp.asarray(0.5, dtype)
    s2 = x * half + one
    alpha = jnp.minimum(jnp.asarray(0.999, dtype), jnp.exp2(-s2))
    af = alpha.astype(jnp.float32)
    live = af >= jnp.float32(1.0 / 255.0)
    alpha = jnp.where(live, alpha, jnp.asarray(0, dtype))
    # log1p is also not legalized on packed bf16 (r4 battery 2: Mosaic
    # "failed to legalize math.log1p" on vector<...x2xbf16>) — run it on
    # the f32 extension like the compares
    l1m = jnp.log1p(-alpha.astype(jnp.float32)).astype(dtype)
    cum = l1m + lt
    include = cum.astype(jnp.float32) >= jnp.float32(-8.0)
    w = jnp.where(include, alpha * jnp.exp2(cum - l1m), jnp.asarray(0, dtype))
    return w + s2 * jnp.asarray(1e-3, dtype)


def make(dtype, slab):
    def kernel(x_ref, o_ref):
        lt = jnp.zeros((slab if slab else P, 1), dtype)

        if slab is None:
            acc = x_ref[:]
            for _ in range(REPS):
                acc = chain(acc, lt, dtype)
            o_ref[:] = acc
        else:
            ns = P // slab

            def body(i, _):
                sl = pl.ds(i * slab, slab)
                acc = x_ref[sl, :]
                for _ in range(REPS):
                    acc = chain(acc, lt, dtype)
                o_ref[sl, :] = acc
                return 0

            jax.lax.fori_loop(0, ns, body, 0)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, G), dtype),
            in_specs=[pl.BlockSpec((P, G), lambda: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((P, G), lambda: (0, 0), memory_space=pltpu.VMEM),
        )(x)

    return run


for dtype in (jnp.float32, jnp.bfloat16):
    for slab in (None, 256, 64, 32, 8):
        x = jnp.asarray(
            jax.random.uniform(jax.random.PRNGKey(0), (P, G), jnp.float32), dtype
        )
        run = make(dtype, slab)
        dt = device_time_drain(run, x, k=50, warmup=3)
        pairs = P * G * REPS
        print(
            f"{dtype.__name__:9s} slab={str(slab):5s}: {dt*1e6:8.2f} us/call "
            f"({dt/pairs*1e12:6.2f} ps/pair-chain)",
            flush=True,
        )
