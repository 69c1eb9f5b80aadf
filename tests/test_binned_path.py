"""Cached-binning fast path must exactly match full rasterization."""

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.splat.rasterizer import (
    RasterizeConfig,
    prepare_binning,
    rasterize,
    rasterize_binned,
)
from gags_tpu.utils.synthetic import make_scene, make_camera

W, H, N = 64, 32, 150
CFG = RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True)


def test_binned_matches_full():
    raw = make_scene(N, seed=0)
    cam = make_camera(W, H)
    means = jnp.asarray(raw["means"])
    quats = jnp.asarray(raw["quats"])
    scales = jnp.asarray(raw["scales"])
    opac = jnp.asarray(raw["opacities"])
    feats = jnp.asarray(raw["features"])
    bg = jnp.zeros((16,))

    full = rasterize(
        means, quats, scales, opac, feats, cam.viewmat, cam.K, W, H,
        background=bg, config=CFG,
    )
    binned = prepare_binning(means, quats, scales, cam.viewmat, cam.K, W, H, CFG)
    assert int(binned.overflow) == 0
    img, alpha = rasterize_binned(
        means, quats, scales, opac, feats, cam.viewmat, cam.K,
        binned.inst_gid, binned.tile_starts, binned.tile_counts,
        W, H, background=bg, config=CFG, order=binned.order,
        red_slot=binned.red.slot_to_pos, red_rank=binned.red.slot_rank,
        red_block=binned.red.chunk_block,
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(full.image), atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(full.alpha), atol=1e-6)


def test_binned_gradients_match():
    raw = make_scene(N, seed=1)
    cam = make_camera(W, H)
    means = jnp.asarray(raw["means"])
    quats = jnp.asarray(raw["quats"])
    scales = jnp.asarray(raw["scales"])
    opac = jnp.asarray(raw["opacities"])
    feats = jnp.asarray(raw["features"])
    tgt = jnp.asarray(np.random.default_rng(2).normal(size=(H, W, 16)), jnp.float32)
    binned = prepare_binning(means, quats, scales, cam.viewmat, cam.K, W, H, CFG)

    def loss_full(f):
        r = rasterize(means, quats, scales, opac, f, cam.viewmat, cam.K, W, H, config=CFG)
        return jnp.mean(jnp.abs(r.image - tgt))

    def loss_binned(f):
        img, _ = rasterize_binned(
            means, quats, scales, opac, f, cam.viewmat, cam.K,
            binned.inst_gid, binned.tile_starts, binned.tile_counts, W, H,
            config=CFG, order=binned.order,
            red_slot=binned.red.slot_to_pos, red_rank=binned.red.slot_rank,
            red_block=binned.red.chunk_block,
        )
        return jnp.mean(jnp.abs(img - tgt))

    g1 = jax.grad(loss_full)(feats)
    g2 = jax.grad(loss_binned)(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_backward_flat_pack_matches_rowpad_bitwise():
    """The default flat (M*C/128, 128) output — packed in-kernel by exact
    selection matmuls (_flat_pack, pallas_kernel.py) — must be BIT-identical
    to the GAGS_BWD_ROWPAD=1 lane-pad fallback: every 1.0*x product is
    exact and every output element sums exactly one nonzero."""
    import os

    raw = make_scene(N, seed=3)
    cam = make_camera(W, H)
    means = jnp.asarray(raw["means"])
    quats = jnp.asarray(raw["quats"])
    scales = jnp.asarray(raw["scales"])
    opac = jnp.asarray(raw["opacities"])
    feats = jnp.asarray(raw["features"])
    tgt = jnp.asarray(np.random.default_rng(4).normal(size=(H, W, 16)), jnp.float32)
    binned = prepare_binning(means, quats, scales, cam.viewmat, cam.K, W, H, CFG)

    def loss_binned(f):
        img, _ = rasterize_binned(
            means, quats, scales, opac, f, cam.viewmat, cam.K,
            binned.inst_gid, binned.tile_starts, binned.tile_counts, W, H,
            config=CFG, order=binned.order,
            red_slot=binned.red.slot_to_pos, red_rank=binned.red.slot_rank,
            red_block=binned.red.chunk_block,
        )
        return jnp.mean(jnp.abs(img - tgt))

    assert os.environ.get("GAGS_BWD_ROWPAD") is None
    g_flat = np.asarray(jax.grad(loss_binned)(feats))
    os.environ["GAGS_BWD_ROWPAD"] = "1"
    try:
        g_pad = np.asarray(jax.grad(loss_binned)(feats))
    finally:
        del os.environ["GAGS_BWD_ROWPAD"]
    np.testing.assert_array_equal(g_flat, g_pad)


def test_tight_budget_binning_matches_default():
    """Auto-tight budgets (cli/train_gad loader: budget = measured valid
    count rounded up + 2 chunks) must not change the rendered image or
    the feature gradients — the same real instances survive; only pad
    slack shrinks."""
    import dataclasses

    raw = make_scene(N, seed=5)
    cam = make_camera(W, H)
    means = jnp.asarray(raw["means"])
    quats = jnp.asarray(raw["quats"])
    scales = jnp.asarray(raw["scales"])
    opac = jnp.asarray(raw["opacities"])
    feats = jnp.asarray(raw["features"])
    tgt = jnp.asarray(np.random.default_rng(6).normal(size=(H, W, 16)), jnp.float32)

    b0 = prepare_binning(means, quats, scales, cam.viewmat, cam.K, W, H, CFG)
    assert int(b0.overflow) == 0
    tight = (int(b0.num_valid) // CFG.chunk + 2) * CFG.chunk
    assert tight < CFG.instance_budget(N)
    cfg_t = dataclasses.replace(CFG, budget=tight)
    b1 = prepare_binning(means, quats, scales, cam.viewmat, cam.K, W, H, cfg_t)
    assert int(b1.overflow) == 0
    assert b1.inst_gid.shape[0] < b0.inst_gid.shape[0]

    def loss(f, b, cfg):
        img, _ = rasterize_binned(
            means, quats, scales, opac, f, cam.viewmat, cam.K,
            b.inst_gid, b.tile_starts, b.tile_counts, W, H,
            config=cfg, order=b.order,
            red_slot=b.red.slot_to_pos, red_rank=b.red.slot_rank,
            red_block=b.red.chunk_block,
        )
        return jnp.mean(jnp.abs(img - tgt)), img

    g0 = jax.grad(lambda f: loss(f, b0, CFG)[0])(feats)
    g1 = jax.grad(lambda f: loss(f, b1, cfg_t)[0])(feats)
    _, img0 = loss(feats, b0, CFG)
    _, img1 = loss(feats, b1, cfg_t)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)
