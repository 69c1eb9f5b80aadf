"""Micro-benchmark XLA sort variants on the current backend.

Informs the binning redesign (VERDICT r1 task 2): how much of the 37 ms
bin stage is the lax.sort, and what key/payload/size choices buy.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    for m in (262_144, 655_360, 1_245_184):
        keys = jnp.asarray(rng.integers(0, 2**28, size=m).astype(np.int32))
        gids = jnp.asarray(rng.integers(0, 250_000, size=m).astype(np.int32))

        timeit(f"sort key+payload m={m}",
               jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1)), keys, gids)
        timeit(f"sort key only   m={m}",
               jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)), keys)
        timeit(f"sort stable kp  m={m}",
               jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1, is_stable=True)),
               keys, gids)
        small = jnp.asarray(rng.integers(0, 1024, size=m).astype(np.int32))
        timeit(f"sort small-key+p m={m}",
               jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1)), small, gids)
        # gather cost for post-sort payload reconstruction
        perm = jnp.asarray(rng.permutation(m).astype(np.int32))
        tbl = jnp.asarray(rng.normal(size=(250_001, 24)).astype(np.float32))
        g2 = jnp.asarray(rng.integers(0, 250_000, size=m).astype(np.int32))
        timeit(f"gather (m,24)   m={m}", jax.jit(lambda t, i: t[i]), tbl, g2)
        timeit(f"gather (m,) i32 m={m}", jax.jit(lambda t, i: t[i]),
               jnp.asarray(rng.integers(0, 2**20, size=m).astype(np.int32)), perm)
        # scatter-set of unique indices (counting-sort final pass shape)
        vals = jnp.asarray(rng.integers(0, 2**20, size=m).astype(np.int32))
        timeit(f"scatter set uniq m={m}",
               jax.jit(lambda p, v: jnp.zeros((m,), jnp.int32).at[p].set(v)), perm, vals)
        print(flush=True)


if __name__ == "__main__":
    main()
