"""Pallas tile rasterizer vs the pure-JAX oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gags_tpu.splat.projection import project_gaussians
from gags_tpu.splat.reference import rasterize_reference
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.splat import tiles

W, H, F = 64, 32, 40.0
CFG = RasterizeConfig(tile_h=8, tile_w=16, chunk=8, budget_factor=6, interpret=True)


def _scene(n, seed=0, cdim=3):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n), rng.uniform(3, 9, n)], 1
        ).astype(np.float32)
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    scales = jnp.asarray(
        np.exp(rng.normal(-1.8, 0.4, size=(n, 3))).astype(np.float32)
    )
    op = jnp.asarray(rng.uniform(0.2, 0.95, n).astype(np.float32))
    col = jnp.asarray(rng.uniform(0, 1, (n, cdim)).astype(np.float32))
    vm = jnp.eye(4)
    K = jnp.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], jnp.float32)
    return means, quats, scales, op, col, vm, K


def test_binning_invariants():
    means, quats, scales, op, col, vm, K = _scene(200)
    p = project_gaussians(means, quats, scales, vm, K, W, H)
    binned = tiles.bin_gaussians(
        p.means2d, p.radii, p.depths, W, H, CFG.tile_w, CFG.tile_h,
        budget=CFG.instance_budget(200), chunk=CFG.chunk,
    )
    tiles_x = -(-W // CFG.tile_w)
    tiles_y = -(-H // CFG.tile_h)
    num_tiles = tiles_x * tiles_y
    # inst_gid holds depth ranks; map through `order` to original indices
    order = np.concatenate([np.asarray(binned.order), [200]])
    gid = order[np.asarray(binned.inst_gid)]
    starts = np.asarray(binned.tile_starts)
    counts = np.asarray(binned.tile_counts)
    depths = np.asarray(p.depths)
    means2d = np.asarray(p.means2d)
    radii = np.asarray(p.radii)

    assert int(binned.overflow) == 0
    # ranges are chunk-aligned and disjoint
    assert (starts % CFG.chunk == 0).all()
    total_hits = 0
    for t in range(num_tiles):
        s, c = starts[t], counts[t]
        ids = gid[s : s + c]
        assert (ids < 200).all()  # real gaussians inside the count
        # depth-sorted front to back
        d = depths[ids]
        assert (np.diff(d) >= -1e-6).all()
        # every listed gaussian's rect covers this tile
        ty, tx = divmod(t, tiles_x)
        for g in ids:
            r = radii[g]
            assert r > 0
            x0 = (means2d[g, 0] - r) / CFG.tile_w
            x1 = (means2d[g, 0] + r) / CFG.tile_w
            y0 = (means2d[g, 1] - r) / CFG.tile_h
            y1 = (means2d[g, 1] + r) / CFG.tile_h
            assert x0 - 1e-4 <= tx + 1 and x1 + 1e-4 >= tx
            assert y0 - 1e-4 <= ty + 1 and y1 + 1e-4 >= ty
        # padding rows are sentinel (rank 200 maps to the appended 200)
        pad = gid[s + c : s + ((c + CFG.chunk - 1) // CFG.chunk) * CFG.chunk]
        assert (pad == 200).all()
        total_hits += c
    # total == sum over gaussians of rect areas
    expect = 0
    for g in range(200):
        if radii[g] <= 0:
            continue
        x0 = int(np.clip(np.floor((means2d[g, 0] - radii[g]) / CFG.tile_w), 0, tiles_x))
        x1 = int(np.clip(np.ceil((means2d[g, 0] + radii[g]) / CFG.tile_w), 0, tiles_x))
        y0 = int(np.clip(np.floor((means2d[g, 1] - radii[g]) / CFG.tile_h), 0, tiles_y))
        y1 = int(np.clip(np.ceil((means2d[g, 1] + radii[g]) / CFG.tile_h), 0, tiles_y))
        expect += max(0, x1 - x0) * max(0, y1 - y0)
    assert total_hits == expect


@pytest.mark.parametrize("n,cdim,seed", [(60, 3, 0), (200, 3, 1), (120, 16, 2)])
def test_forward_matches_reference(n, cdim, seed):
    means, quats, scales, op, col, vm, K = _scene(n, seed, cdim)
    p = project_gaussians(means, quats, scales, vm, K, W, H)
    ref_img, ref_alpha = rasterize_reference(
        p.means2d, p.conics, p.depths, p.radii, op, col, W, H
    )
    res = rasterize(means, quats, scales, op, col, vm, K, W, H, config=CFG)
    np.testing.assert_allclose(
        np.asarray(res.image), np.asarray(ref_img), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.alpha), np.asarray(ref_alpha), atol=2e-5
    )


def test_forward_with_background():
    means, quats, scales, op, col, vm, K = _scene(80, 3)
    bg = jnp.array([0.2, 0.4, 0.6])
    p = project_gaussians(means, quats, scales, vm, K, W, H)
    ref_img, _ = rasterize_reference(
        p.means2d, p.conics, p.depths, p.radii, op, col, W, H, background=bg
    )
    res = rasterize(means, quats, scales, op, col, vm, K, W, H, background=bg, config=CFG)
    np.testing.assert_allclose(
        np.asarray(res.image), np.asarray(ref_img), atol=2e-5, rtol=1e-4
    )


def test_color_gradients_match_reference_autodiff():
    n = 80
    means, quats, scales, op, col, vm, K = _scene(n, 3, cdim=16)
    p = project_gaussians(means, quats, scales, vm, K, W, H)
    tgt = jnp.asarray(np.random.default_rng(9).uniform(0, 1, (H, W, 16)).astype(np.float32))

    def loss_ref(c):
        img, _ = rasterize_reference(
            p.means2d, p.conics, p.depths, p.radii, op, c, W, H
        )
        return jnp.mean(jnp.abs(img - tgt))

    def loss_pallas(c):
        res = rasterize(means, quats, scales, op, c, vm, K, W, H, config=CFG)
        return jnp.mean(jnp.abs(res.image - tgt))

    l_ref, g_ref = jax.value_and_grad(loss_ref)(col)
    l_pal, g_pal = jax.value_and_grad(loss_pallas)(col)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-6, rtol=1e-4)


def test_budget_overflow_flagged():
    means, quats, scales, op, col, vm, K = _scene(300, 4)
    cfg = RasterizeConfig(tile_h=8, tile_w=16, chunk=8, budget=64, interpret=True)
    res = rasterize(means, quats, scales, op, col, vm, K, W, H, config=cfg)
    assert int(res.overflow) > 0


@pytest.mark.parametrize(
    "n,cdim,seed,mxu_sigma",
    [(200, 3, 1, True), (120, 16, 2, True), (120, 16, 2, False)],
)
def test_unaligned_forward_matches_reference(n, cdim, seed, mxu_sigma):
    """aligned=False (inference binning: no dummies, searchsorted ranges,
    in-kernel head/tail masking) must match the oracle exactly — in both
    the MXU-bilinear-sigma and elementwise-sigma kernel variants."""
    means, quats, scales, op, col, vm, K = _scene(n, seed, cdim)
    p = project_gaussians(means, quats, scales, vm, K, W, H)
    ref_img, ref_alpha = rasterize_reference(
        p.means2d, p.conics, p.depths, p.radii, op, col, W, H
    )
    cfg = RasterizeConfig(
        tile_h=8, tile_w=16, chunk=8, budget_factor=6, interpret=True,
        aligned=False, mxu_sigma=mxu_sigma,
    )
    res = rasterize(means, quats, scales, op, col, vm, K, W, H, config=cfg)
    np.testing.assert_allclose(
        np.asarray(res.image), np.asarray(ref_img), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.alpha), np.asarray(ref_alpha), atol=2e-5
    )
    assert int(res.overflow) == 0


def test_blend_bf16_close_to_f32():
    """blend_bf16 (bf16 alpha/transmittance pipeline, LN-unit scan) stays
    within ~1e-2 of the f32 oracle — the documented precision contract of
    the bandwidth-diet inference mode."""
    means, quats, scales, op, col, vm, K = _scene(150, 3, 16)
    p = project_gaussians(means, quats, scales, vm, K, W, H)
    ref_img, ref_alpha = rasterize_reference(
        p.means2d, p.conics, p.depths, p.radii, op, col, W, H
    )
    cfg = RasterizeConfig(
        tile_h=8, tile_w=16, chunk=8, budget_factor=6, interpret=True,
        aligned=False, blend_bf16=True,
    )
    res = rasterize(means, quats, scales, op, col, vm, K, W, H, config=cfg)
    ref = np.asarray(ref_img)
    img = np.asarray(res.image)
    scale = np.abs(ref).max()
    assert np.abs(img - ref).max() <= 0.05 * scale
    assert np.abs(img - ref).mean() <= 0.005 * scale
    np.testing.assert_allclose(
        np.asarray(res.alpha), np.asarray(ref_alpha), atol=0.03
    )
    assert int(res.overflow) == 0


def test_blend_bf16_saturated_rgb():
    """bf16 pipeline under saturation (early-exit while-loop) and with RGB
    channel padding (C=3 -> 8): dense high-opacity stack drives most
    pixels to alpha ~ 1; the bf16 carry/exit logic must match the oracle
    within contract, and padded channels must not leak."""
    means, quats, scales, op, col, vm, K = _scene(400, 7, 3)
    op = jnp.minimum(op * 4.0, 0.98)  # near-opaque: exercises T < eps exit
    p = project_gaussians(means, quats, scales, vm, K, W, H)
    ref_img, ref_alpha = rasterize_reference(
        p.means2d, p.conics, p.depths, p.radii, op, col, W, H
    )
    cfg = RasterizeConfig(
        tile_h=8, tile_w=16, chunk=8, budget_factor=8, interpret=True,
        aligned=False, blend_bf16=True,
    )
    res = rasterize(means, quats, scales, op, col, vm, K, W, H, config=cfg)
    ref = np.asarray(ref_img)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(res.image) - ref).max() <= 0.05 * scale
    # saturated pixels: alpha within bf16 tolerance of 1
    np.testing.assert_allclose(
        np.asarray(res.alpha), np.asarray(ref_alpha), atol=0.03
    )
    assert int(res.overflow) == 0


@pytest.mark.parametrize(
    "n,seed,cull,force_u32,budget_factor",
    [
        (200, 1, True, False, 8),
        (200, 1, False, False, 8),
        (150, 2, True, True, 8),
        (300, 3, True, False, 2),  # tight budget: exercises the cut
    ],
)
def test_fused_keys_matches_classic_binning(n, seed, cull, force_u32, budget_factor):
    """The fused expansion+key kernel (pallas_kernel.expand_keys) must
    produce the exact same BinnedInstances as the classic expand_gid +
    gather + XLA key chain, including under the ellipse cull, the u32 key
    tier, and a budget cut."""
    from gags_tpu.splat.projection import project_gaussians
    from gags_tpu.splat.rasterizer import _cull_rows

    means, quats, scales, op, col, vm, K = _scene(n, seed)
    p = project_gaussians(means, quats, scales, vm, K, W, H, opacities=op)
    cr = _cull_rows(p, op) if cull else None
    kw = dict(
        width=W, height=H, tile_w=16, tile_h=8,
        budget=budget_factor * n, chunk=8, aligned=False, interpret=True,
        radii_y=p.radii_y, cull_rows=cr, _force_u32_keys=force_u32,
    )
    a = tiles.bin_gaussians(p.means2d, p.radii_x, p.depths, **kw)
    b = tiles.bin_gaussians(
        p.means2d, p.radii_x, p.depths, fused_keys=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a.inst_gid), np.asarray(b.inst_gid))
    np.testing.assert_array_equal(np.asarray(a.tile_starts), np.asarray(b.tile_starts))
    np.testing.assert_array_equal(np.asarray(a.tile_counts), np.asarray(b.tile_counts))
    assert int(a.num_valid) == int(b.num_valid)
    assert int(a.overflow) == int(b.overflow)
    np.testing.assert_array_equal(np.asarray(a.order), np.asarray(b.order))


@pytest.mark.parametrize(
    "cdim,bf16",
    [(16, False), (16, True), (3, False)],
)
def test_image_chw_matches_default_layout(cdim, bf16):
    """image_chw (channel-major (C, H, W) FINAL image) must be exactly the
    transpose of the default (H, W, C) output for every upstream kernel
    layout — it only changes the tiles→image epilogue permutation."""
    means, quats, scales, op, col, vm, K = _scene(170, 6, cdim)
    base = dict(
        tile_h=8, tile_w=16, chunk=8, budget_factor=8, interpret=True,
        aligned=False, fast_color_rows=True,
        blend_bf16=bf16,
    )
    a = rasterize(
        means, quats, scales, op, col, vm, K, W, H,
        config=RasterizeConfig(**base),
    )
    b = rasterize(
        means, quats, scales, op, col, vm, K, W, H,
        config=RasterizeConfig(**base, image_chw=True),
    )
    assert b.image.shape == (cdim, H, W)
    np.testing.assert_array_equal(
        np.asarray(a.image), np.asarray(b.image).transpose(1, 2, 0)
    )
    np.testing.assert_array_equal(np.asarray(a.alpha), np.asarray(b.alpha))
    assert b.alpha.shape == (H, W)


@pytest.mark.parametrize(
    "cdim,fused,chw,fcr",
    [
        (16, False, False, True),
        (16, True, True, True),
        (3, False, False, True),
        (8, False, False, False),  # f32 colour rows: [hi|lo] pre-split leg
    ],
)
def test_soa_geom_matches_aos(cdim, fused, chw, fcr):
    """soa_geom (lane-major (3,N)/(4,N)/(3,N) geometry inputs) must be
    bit-identical to the AoS path end-to-end: projection shares one
    component core, the binner consumes (mx, my) components, and the
    geometry/cull tables are assembled from the same values."""
    means, quats, scales, op, col, vm, K = _scene(170, 6, cdim)
    base = dict(
        tile_h=8, tile_w=16, chunk=8, budget_factor=8, interpret=True,
        aligned=False, fast_color_rows=fcr, fused_keys=fused,
        image_chw=chw,
    )
    a = rasterize(
        means, quats, scales, op, col, vm, K, W, H,
        config=RasterizeConfig(**base),
    )
    b = rasterize(
        jnp.asarray(means.T), jnp.asarray(quats.T), jnp.asarray(scales.T),
        op, col, vm, K, W, H,
        config=RasterizeConfig(**base, soa_geom=True),
    )
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))
    np.testing.assert_array_equal(np.asarray(a.alpha), np.asarray(b.alpha))
    np.testing.assert_array_equal(np.asarray(a.radii), np.asarray(b.radii))
    np.testing.assert_array_equal(
        np.asarray(a.means2d), np.asarray(b.means2d)
    )
    assert int(a.overflow) == int(b.overflow)


@pytest.mark.parametrize("case", ["invisible", "tiny_budget", "one_big"])
def test_fused_keys_edge_cases(case):
    """Degenerate inputs: nothing visible (num_valid = 0), a budget cut
    that drops almost everything, and a single gaussian covering many
    tiles — fused and classic binning must agree exactly."""
    from gags_tpu.splat.projection import project_gaussians

    rng = np.random.default_rng(21)
    if case == "one_big":
        n = 1
        means = jnp.asarray([[0.0, 0.0, 4.0]], jnp.float32)
        scales = jnp.asarray([[2.0, 2.0, 2.0]], jnp.float32)
    else:
        n = 300
        z = -5.0 if case == "invisible" else 5.0
        means = jnp.asarray(
            np.stack(
                [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                 np.full(n, z) + rng.uniform(0, 1, n)], 1
            ).astype(np.float32)
        )
        scales = jnp.asarray(
            np.exp(rng.normal(-1.8, 0.4, (n, 3))).astype(np.float32)
        )
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    op = jnp.asarray(rng.uniform(0.2, 0.95, n).astype(np.float32))
    vm = jnp.eye(4)
    K = jnp.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], jnp.float32)
    p = project_gaussians(means, quats, scales, vm, K, W, H, opacities=op)
    from gags_tpu.splat.rasterizer import _cull_rows

    kw = dict(
        width=W, height=H, tile_w=16, tile_h=8,
        budget=8 if case == "tiny_budget" else 8 * n,
        chunk=8, aligned=False, interpret=True, radii_y=p.radii_y,
        cull_rows=_cull_rows(p, op),
    )
    a = tiles.bin_gaussians(p.means2d, p.radii_x, p.depths, **kw)
    b = tiles.bin_gaussians(
        p.means2d, p.radii_x, p.depths, fused_keys=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a.inst_gid), np.asarray(b.inst_gid))
    np.testing.assert_array_equal(np.asarray(a.tile_starts), np.asarray(b.tile_starts))
    np.testing.assert_array_equal(np.asarray(a.tile_counts), np.asarray(b.tile_counts))
    assert int(a.num_valid) == int(b.num_valid)
    assert int(a.overflow) == int(b.overflow)
    if case == "invisible":
        assert int(a.num_valid) == 0


def test_fused_keys_single_instance_ranks():
    """Worst-case window geometry: tiny splats give ~1 instance per rank,
    so a 1024-slot chunk spans ~1025 consecutive ranks and the last
    sub-block's window sits at the maximum 128-aligned offset — the
    narrowed KEYS_WS sub-windows must still contain every owner."""
    rng = np.random.default_rng(11)
    n = 2000
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n),
             rng.uniform(3, 9, n)], 1
        ).astype(np.float32)
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    # ~point-sized: rects collapse to a single tile per gaussian
    scales = jnp.asarray(np.full((n, 3), 1e-3, np.float32))
    op = jnp.asarray(rng.uniform(0.2, 0.95, n).astype(np.float32))
    vm = jnp.eye(4)
    K = jnp.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], jnp.float32)
    from gags_tpu.splat.projection import project_gaussians

    p = project_gaussians(means, quats, scales, vm, K, W, H, opacities=op)
    kw = dict(
        width=W, height=H, tile_w=16, tile_h=8, budget=2 * n, chunk=8,
        aligned=False, interpret=True, radii_y=p.radii_y,
    )
    a = tiles.bin_gaussians(p.means2d, p.radii_x, p.depths, **kw)
    b = tiles.bin_gaussians(
        p.means2d, p.radii_x, p.depths, fused_keys=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a.inst_gid), np.asarray(b.inst_gid))
    np.testing.assert_array_equal(np.asarray(a.tile_counts), np.asarray(b.tile_counts))
    assert int(a.num_valid) == int(b.num_valid) and int(a.num_valid) > 1024


def test_fused_keys_end_to_end_image():
    """Full unaligned render with fused_keys must be bit-identical."""
    means, quats, scales, op, col, vm, K = _scene(180, 9, 16)
    base = dict(
        tile_h=8, tile_w=16, chunk=8, budget_factor=8, interpret=True,
        aligned=False, fast_color_rows=True,
    )
    a = rasterize(
        means, quats, scales, op, col, vm, K, W, H,
        config=RasterizeConfig(**base),
    )
    b = rasterize(
        means, quats, scales, op, col, vm, K, W, H,
        config=RasterizeConfig(**base, fused_keys=True),
    )
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))
    np.testing.assert_array_equal(np.asarray(a.alpha), np.asarray(b.alpha))


def test_blend_bf16_requires_mxu_sigma():
    means, quats, scales, op, col, vm, K = _scene(20)
    cfg = RasterizeConfig(
        tile_h=8, tile_w=16, chunk=8, interpret=True, aligned=False,
        blend_bf16=True, mxu_sigma=False,
    )
    with pytest.raises(ValueError, match="mxu_sigma"):
        jax.block_until_ready(
            rasterize(means, quats, scales, op, col, vm, K, W, H, config=cfg).image
        )


def test_opacity_extents_image_exact():
    """Opacity-aware rects (alpha-floor contour, projection.py) shed
    instances on low-opacity splats while leaving the image bit-identical
    up to float boundary hair: every dropped pair fails the kernel's
    1/255 alpha floor anyway."""
    means, quats, scales, op, col, vm, K = _scene(200, 3, 8)
    op = op * 0.15  # opacity-sparse: most splats below the 0.353 knee
    base = dict(tile_h=8, tile_w=16, chunk=8, budget_factor=8, interpret=True)
    cfg_on = RasterizeConfig(**base, opacity_extents=True)
    cfg_off = RasterizeConfig(**base, opacity_extents=False)
    r_on = rasterize(means, quats, scales, op, col, vm, K, W, H, config=cfg_on)
    r_off = rasterize(means, quats, scales, op, col, vm, K, W, H, config=cfg_off)
    assert int(r_on.overflow) == 0 and int(r_off.overflow) == 0
    np.testing.assert_allclose(
        np.asarray(r_on.image), np.asarray(r_off.image), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_on.alpha), np.asarray(r_off.alpha), atol=1e-5
    )
    from gags_tpu.splat.rasterizer import prepare_binning

    b_on = prepare_binning(means, quats, scales, vm, K, W, H, cfg_on, opacities=op)
    b_off = prepare_binning(means, quats, scales, vm, K, W, H, cfg_off)
    assert int(b_on.num_valid) < int(b_off.num_valid)  # instances shed
    # visibility semantics unchanged: geometric radii identical
    np.testing.assert_array_equal(np.asarray(r_on.radii), np.asarray(r_off.radii))


def test_tile_cull_image_exact():
    """The ellipse-tile cull (tiles.ellipse_tile_keep) drops corner tiles
    of each splat's bbox whose pixels all fall below the alpha floor —
    the unaligned image must be identical with it on or off."""
    means, quats, scales, op, col, vm, K = _scene(200, 3, 8)
    base = dict(
        tile_h=8, tile_w=16, chunk=8, budget_factor=8, interpret=True,
        aligned=False,
    )
    r_on = rasterize(
        means, quats, scales, op, col, vm, K, W, H,
        config=RasterizeConfig(**base, tile_cull=True),
    )
    r_off = rasterize(
        means, quats, scales, op, col, vm, K, W, H,
        config=RasterizeConfig(**base, tile_cull=False),
    )
    assert int(r_on.overflow) == 0 and int(r_off.overflow) == 0
    np.testing.assert_allclose(
        np.asarray(r_on.image), np.asarray(r_off.image), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_on.alpha), np.asarray(r_off.alpha), atol=1e-5
    )
    # instances shed: bin directly with and without cull rows
    from gags_tpu.splat.projection import project_gaussians
    from gags_tpu.splat import tiles as _tiles
    from gags_tpu.splat.rasterizer import _cull_rows

    p = project_gaussians(means, quats, scales, vm, K, W, H, opacities=op)
    kw = dict(
        width=W, height=H, tile_w=16, tile_h=8, budget=8 * means.shape[0],
        chunk=8, aligned=False, radii_y=p.radii_y, interpret=True,
    )
    b_on = _tiles.bin_gaussians(
        p.means2d, p.radii_x, p.depths, cull_rows=_cull_rows(p, op), **kw
    )
    b_off = _tiles.bin_gaussians(p.means2d, p.radii_x, p.depths, **kw)
    assert int(b_on.num_valid) < int(b_off.num_valid)
    assert int(jnp.sum(b_on.tile_counts)) == int(b_on.num_valid)
    # the wide-key (general) path culls identically
    b_wide = _tiles.bin_gaussians(
        p.means2d, p.radii_x, p.depths, cull_rows=_cull_rows(p, op),
        _force_wide_keys=True, **kw
    )
    assert int(b_wide.num_valid) == int(b_on.num_valid)
    np.testing.assert_array_equal(
        np.asarray(b_wide.tile_counts), np.asarray(b_on.tile_counts)
    )


def test_ellipse_tile_keep_conservative():
    """Property test vs brute force: ellipse_tile_keep must NEVER drop a
    tile containing a pixel centre with sigma <= L (conservative-exact),
    and should drop most tiles whose true min is well above L."""
    rng = np.random.default_rng(3)
    m = 512
    tw, th = 16, 16
    tile_x = rng.integers(0, 8, m).astype(np.int32)
    tile_y = rng.integers(0, 8, m).astype(np.int32)
    # centres clustered near their tile so keep/drop are both populated
    mx = (tile_x * tw + rng.uniform(-24, 40, m)).astype(np.float32)
    my = (tile_y * th + rng.uniform(-24, 40, m)).astype(np.float32)
    # random PD conics: A = R diag(1/s1^2, 1/s2^2) R^T
    ang = rng.uniform(0, np.pi, m)
    s1 = rng.uniform(0.5, 12, m)
    s2 = rng.uniform(0.5, 12, m)
    ca_, sa_ = np.cos(ang), np.sin(ang)
    ia, ib = 1 / s1**2, 1 / s2**2
    a = (ca_**2 * ia + sa_**2 * ib).astype(np.float32)
    c = (sa_**2 * ia + ca_**2 * ib).astype(np.float32)
    b = (ca_ * sa_ * (ia - ib)).astype(np.float32)
    L = rng.uniform(0.5, 6.0, m).astype(np.float32)
    cull = jnp.asarray(np.stack([mx, my, a, b, c, L], axis=1))
    keep = np.asarray(
        tiles.ellipse_tile_keep(
            jnp.asarray(tile_x), jnp.asarray(tile_y), tw, th, cull
        )
    )
    # brute force over the tile's pixel centres
    xs = np.arange(tw) + 0.5
    ys = np.arange(th) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    n_false_neg = 0
    n_true_drop = 0
    for i in range(m):
        u = tile_x[i] * tw + gx - mx[i]
        v = tile_y[i] * th + gy - my[i]
        sig = 0.5 * (a[i] * u * u + c[i] * v * v) + b[i] * u * v
        has_pixel = (sig <= L[i]).any()
        if has_pixel and not keep[i]:
            n_false_neg += 1
        if not has_pixel:
            n_true_drop += 1
            # conservatism slack: the continuous min can undercut the
            # pixel-centre min, so keep[i] may be True here — that's fine
    assert n_false_neg == 0
    # sanity: the scene actually exercises both outcomes
    assert n_true_drop > 50 and keep.sum() > 50
    # and the cull is not vacuous: most no-pixel tiles are dropped
    dropped = (~keep).sum()
    assert dropped >= 0.5 * n_true_drop


def test_unaligned_binning_ranges():
    """Unaligned ranges are dense (no padding) and tile-major sorted."""
    means, quats, scales, op, col, vm, K = _scene(200)
    p = project_gaussians(means, quats, scales, vm, K, W, H)
    chunk = 8
    binned = tiles.bin_gaussians(
        p.means2d, p.radii, p.depths, W, H, CFG.tile_w, CFG.tile_h,
        budget=CFG.instance_budget(200), chunk=chunk, aligned=False,
        interpret=True,
    )
    starts = np.asarray(binned.tile_starts)
    counts = np.asarray(binned.tile_counts)
    # dense layout: each range starts where the previous ended
    np.testing.assert_array_equal(starts[1:], starts[:-1] + counts[:-1])
    assert starts[0] == 0
    assert int(starts[-1] + counts[-1]) == int(binned.num_valid)
    # sentinel tail pad of one chunk (the expansion kernel rounds the
    # slot count up to its grid-step multiple first)
    from gags_tpu.splat.pallas_kernel import EXPAND_K

    m_real = ((CFG.instance_budget(200) + chunk - 1) // chunk) * chunk
    mk = -(-m_real // EXPAND_K) * EXPAND_K
    assert binned.inst_gid.shape[0] == mk + chunk
    assert (np.asarray(binned.inst_gid)[-chunk:] == 200).all()


@pytest.mark.parametrize("aligned", [False, True])
def test_key_tiers_equivalent(aligned):
    """The three sort-key tiers (int32 packed, uint32 packed, two-key
    lexicographic) produce identical instance layouts. The u32 tier is
    what 1080p/1M-gaussian scenes use (2040 tiles x 2^20 ~ 2.1e9)."""
    means, quats, scales, op, col, vm, K = _scene(300)
    p = project_gaussians(means, quats, scales, vm, K, W, H)
    kw = dict(
        width=W, height=H, tile_w=CFG.tile_w, tile_h=CFG.tile_h,
        budget=CFG.instance_budget(300), chunk=8, aligned=aligned,
        interpret=True, radii_y=p.radii_y,
    )
    b32 = tiles.bin_gaussians(p.means2d, p.radii_x, p.depths, **kw)
    bu32 = tiles.bin_gaussians(
        p.means2d, p.radii_x, p.depths, _force_u32_keys=True, **kw
    )
    bwide = tiles.bin_gaussians(
        p.means2d, p.radii_x, p.depths, _force_wide_keys=True, **kw
    )
    for b in (bu32, bwide):
        np.testing.assert_array_equal(
            np.asarray(b32.tile_starts), np.asarray(b.tile_starts)
        )
        np.testing.assert_array_equal(
            np.asarray(b32.tile_counts), np.asarray(b.tile_counts)
        )
        assert int(b32.num_valid) == int(b.num_valid)
        m = min(b32.inst_gid.shape[0], b.inst_gid.shape[0])
        np.testing.assert_array_equal(
            np.asarray(b32.inst_gid)[:m], np.asarray(b.inst_gid)[:m]
        )


def test_sorted_segment_sum_matches_xla():
    """ReductionLayout + Pallas one-hot reduction == jax.ops.segment_sum."""
    from gags_tpu.splat.pallas_kernel import sorted_segment_sum
    from gags_tpu.splat.tiles import fast_gather_rows, reduction_layout

    rng = np.random.default_rng(11)
    n, m, c = 300, 2000, 16
    # tile-major-ish ids incl sentinel n, with some empty rank blocks
    gid = np.concatenate(
        [np.sort(rng.integers(0, 40, m // 2)), np.sort(rng.integers(250, n + 1, m - m // 2))]
    ).astype(np.int32)
    rows = rng.normal(size=(m, c)).astype(np.float32)

    layout = reduction_layout(jnp.asarray(gid), n)
    assert layout.slot_to_pos.shape[0] % 128 == 0
    from gags_tpu.splat.tiles import u16_halves

    rows_ext = jnp.concatenate([jnp.asarray(rows), jnp.zeros((1, c))], axis=0)
    rows_u16 = u16_halves(rows_ext)[layout.slot_to_pos]
    out = sorted_segment_sum(
        rows_u16, layout.slot_rank, layout.chunk_block,
        num_ranks=n + 1, interpret=True,
    )
    expect = jax.ops.segment_sum(jnp.asarray(rows), jnp.asarray(gid), num_segments=n + 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("aligned", [True, False])
def test_wide_key_sort_matches_narrow(aligned):
    """The two-key (tile, rank) sort fallback for num_tiles*(N+1) >= 2^31
    (1080p at ~1M+ gaussians) must produce the identical binning."""
    means, quats, scales, op, col, vm, K = _scene(200)
    p = project_gaussians(means, quats, scales, vm, K, W, H)
    kw = dict(budget=CFG.instance_budget(200), chunk=8, aligned=aligned,
              interpret=True)
    a = tiles.bin_gaussians(
        p.means2d, p.radii, p.depths, W, H, CFG.tile_w, CFG.tile_h, **kw
    )
    b = tiles.bin_gaussians(
        p.means2d, p.radii, p.depths, W, H, CFG.tile_w, CFG.tile_h,
        _force_wide_keys=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(a.tile_starts), np.asarray(b.tile_starts))
    np.testing.assert_array_equal(np.asarray(a.tile_counts), np.asarray(b.tile_counts))
    # filler rows past each tile's (padded) range are never read and recover
    # arbitrary ranks in narrow mode — compare the consumed ranges only
    ga, gb = np.asarray(a.inst_gid), np.asarray(b.inst_gid)
    for s, c in zip(np.asarray(a.tile_starts), np.asarray(a.tile_counts)):
        e = s + (((c + 7) // 8) * 8 if aligned else c)
        np.testing.assert_array_equal(ga[s:e], gb[s:e])


def test_fast_fwd_aligned_matches_classic():
    """fast_fwd_aligned runs the TRAINING forward on the streaming kernel
    over the aligned (dummy-padded) ranges: image within the fuzzed f32
    contract of the classic aligned forward, colour gradients BIT-equal
    (the backward kernels are untouched)."""
    means, quats, scales, op, col, vm, K = _scene(170, 6, 16)
    base = dict(tile_h=8, tile_w=16, chunk=8, budget_factor=8, interpret=True)

    def run(cfg):
        def f(c):
            res = rasterize(
                means, quats, scales, op, c, vm, K, W, H,
                config=cfg,
            )
            return jnp.sum(res.image * jnp.cos(res.image)), res.image

        (loss, img), g = jax.value_and_grad(f, has_aux=True)(col)
        return img, g

    img_a, g_a = run(RasterizeConfig(**base))
    img_b, g_b = run(RasterizeConfig(**base, fast_fwd_aligned=True))
    scale = float(jnp.max(jnp.abs(img_a))) + 1e-8
    rel = float(jnp.max(jnp.abs(img_a - img_b))) / scale
    assert rel <= 5e-4, rel
    # gradients flow through the UNCHANGED backward kernel; the cotangent
    # differs only through the fwd image's ~1e-4 shift inside cos()
    grel = float(jnp.max(jnp.abs(g_a - g_b))) / (float(jnp.max(jnp.abs(g_a))) + 1e-8)
    assert grel <= 5e-3, grel


def test_geom_table_u16_matches_f32_split():
    """_geom_table_u16_comp (the SoA path's direct u16 [hi|lo] assembly)
    must stay bit-identical to tiles.u16_halves of the f32 table built by
    _geom_table_comp — the f32 builder is the readable oracle for the
    layout, this test keeps the two from diverging."""
    from gags_tpu.splat.projection import project_gaussians_soa
    from gags_tpu.splat.rasterizer import _geom_table_comp, _geom_table_u16_comp

    means, quats, scales, op, col, vm, K = _scene(130, 4, 3)
    comp = project_gaussians_soa(
        jnp.asarray(means.T), jnp.asarray(quats.T), jnp.asarray(scales.T),
        vm, K, W, H, opacities=op,
    )
    f32_tbl = _geom_table_comp(comp, op)
    u16_tbl = _geom_table_u16_comp(comp, op)
    np.testing.assert_array_equal(
        np.asarray(tiles.u16_halves(f32_tbl)), np.asarray(u16_tbl)
    )


@pytest.mark.parametrize("bf16", [False, True])
def test_chunk_size_value_equivalent(bf16):
    """Doubling the kernel chunk (an autotune candidate: halves the
    per-chunk fixed cost) must reproduce the default-chunk image at the
    f32 reassociation contract — accumulation association moves (carry
    adds, one colour matmul per double chunk), so equality is value-level,
    not bit-level."""
    means, quats, scales, op, col, vm, K = _scene(300, 11, 16)
    base = dict(
        tile_h=8, tile_w=16, budget_factor=6, interpret=True,
        aligned=False, fast_color_rows=True, blend_bf16=bf16,
    )
    a = rasterize(means, quats, scales, op, col, vm, K, W, H,
                  config=RasterizeConfig(**base, chunk=8))
    b = rasterize(means, quats, scales, op, col, vm, K, W, H,
                  config=RasterizeConfig(**base, chunk=16))
    scale = float(np.abs(np.asarray(a.image)).max()) + 1e-8
    tol = 5e-2 if bf16 else 1e-3
    assert np.abs(np.asarray(a.image) - np.asarray(b.image)).max() <= tol * scale
    assert int(b.overflow) == 0


def test_exit_stats_counters():
    """exit_stats=True returns the fast kernel's per-tile early-exit
    counters (segments done/total, chunks done/total) WITHOUT changing the
    image, and the counters are self-consistent: done <= total, and with
    saturating opacities the chunks-done total can only shrink."""
    from gags_tpu.splat.rasterizer import _blend_fwd_impl, _prepare

    means, quats, scales, op, col, vm, K = _scene(400, 5, 16)
    cfg = RasterizeConfig(
        tile_h=8, tile_w=16, chunk=8, budget_factor=8, interpret=True,
        aligned=False, fast_color_rows=True,
    )
    bg = jnp.zeros((16,), jnp.float32)

    def run(o):
        _, b, geom, tx, ty = _prepare(
            means, quats, scales, o, vm, K, W, H, cfg
        )
        img, alpha, st = _blend_fwd_impl(
            col, geom, b.inst_gid, b.tile_starts, b.tile_counts, bg,
            (tx, ty), cfg, exit_stats=True,
        )
        img2, _ = _blend_fwd_impl(
            col, geom, b.inst_gid, b.tile_starts, b.tile_counts, bg,
            (tx, ty), cfg,
        )
        np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))
        return np.asarray(st)[:, 0, :4]

    st = run(op)
    assert (st[:, 0] <= st[:, 1]).all() and (st[:, 2] <= st[:, 3]).all()
    # saturating opacities: strictly earlier termination is allowed, more
    # work is not (same binning budget semantics)
    st_sat = run(jnp.full_like(op, 0.999))
    assert st_sat[:, 2].sum() <= st[:, 3].sum()


@pytest.mark.parametrize(
    "bf16,saturate", [(False, False), (True, False), (False, True), (True, True)]
)
def test_block_exit_bit_identical(bf16, saturate):
    """block_exit=True (skip saturated p_block slabs — the TPU analogue of
    the CUDA reference's per-pixel thread retirement) must be BIT-identical
    to block_exit=False: a saturated slab's pairs already blend with w = 0.
    Exercised with 4 slabs per tile (p_block=32 on a 128-px tile) in both
    the f32 and bf16 pipelines, with and without near-opaque stacks that
    actually drive slabs to saturation mid-tile."""
    means, quats, scales, op, col, vm, K = _scene(400, 11, 16)
    if saturate:
        op = jnp.minimum(op * 5.0, 0.998)

    def run(block_exit):
        cfg = RasterizeConfig(
            tile_h=8, tile_w=16, chunk=8, p_block=32, budget_factor=8,
            interpret=True, aligned=False, blend_bf16=bf16,
            block_exit=block_exit,
        )
        return rasterize(
            means, quats, scales, op, col, vm, K, W, H, config=cfg
        )

    a, b = run(False), run(True)
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))
    np.testing.assert_array_equal(np.asarray(a.alpha), np.asarray(b.alpha))
    assert int(b.overflow) == 0
