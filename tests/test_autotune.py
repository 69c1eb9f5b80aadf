"""autotune_config mechanics on CPU (interpret mode, force=True)."""

import numpy as np
import jax.numpy as jnp

from gags_tpu.splat.autotune import autotune_config
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize

import pytest

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier

W, H, F = 64, 32, 40.0


def _scene(n, seed=0, cdim=16):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n), rng.uniform(3, 9, n)], 1
        ).astype(np.float32)
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    scales = jnp.asarray(np.exp(rng.normal(-1.8, 0.4, (n, 3))).astype(np.float32))
    op = jnp.asarray(rng.uniform(0.2, 0.95, n).astype(np.float32))
    col = jnp.asarray(rng.uniform(0, 1, (n, cdim)).astype(np.float32))
    vm = jnp.eye(4)
    K = jnp.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], jnp.float32)
    return means, quats, scales, op, col, vm, K


def test_autotune_picks_parity_guarded_config():
    means, quats, scales, op, col, vm, K = _scene(120, 3)
    base = RasterizeConfig(
        tile_h=8, tile_w=16, chunk=8, budget_factor=1, interpret=True,
        aligned=False, fast_color_rows=True,
    )
    cfg = autotune_config(
        means, quats, scales, op, col, vm, K, W, H,
        base=base, force=True, cache=False, k=2,
    )
    assert isinstance(cfg, RasterizeConfig)
    assert not cfg.aligned
    # the winner must render overflow-free and match the (budget-grown)
    # base bit-for-bit: every offered variant is exact
    res = rasterize(
        means, quats, scales, op, col, vm, K, W, H,
        background=jnp.zeros((16,), jnp.float32), config=cfg,
    )
    assert int(res.overflow) == 0
    import dataclasses

    ref = rasterize(
        means, quats, scales, op, col, vm, K, W, H,
        background=jnp.zeros((16,), jnp.float32),
        config=dataclasses.replace(cfg, fused_keys=False),
    )
    np.testing.assert_array_equal(np.asarray(res.image), np.asarray(ref.image))


def test_autotune_cpu_returns_base_without_force():
    means, quats, scales, op, col, vm, K = _scene(60, 1)
    base = RasterizeConfig(
        tile_h=8, tile_w=16, chunk=8, interpret=True, aligned=False
    )
    cfg = autotune_config(
        means, quats, scales, op, col, vm, K, W, H, base=base, cache=False
    )
    assert cfg == base
