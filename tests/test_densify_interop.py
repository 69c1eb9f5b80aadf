"""Densification ops + reference checkpoint interop tests."""

import numpy as np
import jax.numpy as jnp

from gags_tpu.scene.densify import (
    densify_and_clone,
    densify_and_split,
    prune,
    reset_opacity,
)
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.gad.interop import load_reference_checkpoint
from gags_tpu.utils.synthetic import make_scene


def _scene(n=40, seed=0):
    raw = make_scene(n, seed=seed)
    return GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(np.log(raw["opacities"] / (1 - raw["opacities"]))),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.asarray(raw["features"][:, :8]),
    )


def test_clone_adds_small_high_grad():
    s = _scene()
    grads = np.zeros(40)
    grads[:5] = 1.0  # high-gradient gaussians (all small scales in fixture)
    out = densify_and_clone(s, grads, 0.5, scene_extent=100.0)
    assert out.num_gaussians == 45
    np.testing.assert_allclose(np.asarray(out.means[40:]), np.asarray(s.means[:5]))


def test_split_replaces_large_high_grad():
    s = _scene()
    grads = np.zeros(40)
    grads[:3] = 1.0
    # tiny extent so every selected gaussian counts as "large"
    out = densify_and_split(s, grads, 0.5, scene_extent=1e-6, n_split=2)
    assert out.num_gaussians == 40 - 3 + 6
    # children scales shrunk by 0.8*n
    expect = np.asarray(s.scales[:3]) / 1.6
    np.testing.assert_allclose(
        np.asarray(out.scales[-3:]), expect, rtol=1e-5
    )


def test_prune_and_reset_opacity():
    s = _scene()
    s2 = reset_opacity(s, 0.01)
    assert float(jnp.max(s2.opacities)) <= 0.0101
    low = np.asarray(s.opacities) * 0
    pruned, kept = prune(
        GaussianScene(
            means=s.means, sh=s.sh,
            opacities_raw=jnp.full((40,), -10.0),  # ~0 opacity
            scales_raw=s.scales_raw, quats=s.quats,
            semantic_features=s.semantic_features,
        ),
        min_opacity=0.005,
    )
    assert pruned.num_gaussians == 0


def test_reference_checkpoint_roundtrip(tmp_path):
    import torch

    n, k = 12, 16
    rng = np.random.default_rng(0)
    xyz = torch.tensor(rng.normal(size=(n, 3)).astype(np.float32))
    f_dc = torch.tensor(rng.normal(size=(n, 1, 3)).astype(np.float32))
    f_rest = torch.tensor(rng.normal(size=(n, k - 1, 3)).astype(np.float32))
    scaling = torch.tensor(rng.normal(size=(n, 3)).astype(np.float32))
    rotation = torch.tensor(rng.normal(size=(n, 4)).astype(np.float32))
    opacity = torch.tensor(rng.normal(size=(n, 1)).astype(np.float32))
    sem = torch.tensor(rng.normal(size=(n, 16)).astype(np.float32))
    tup13 = (3, xyz, f_dc, f_rest, scaling, rotation, opacity,
             torch.zeros(n), torch.zeros(n, 1), torch.zeros(n, 1), {}, 1.0, sem)
    p = str(tmp_path / "chkpnt30000.pth")
    torch.save((tup13, 30000), p)
    scene, it, feats = load_reference_checkpoint(p)
    assert it == 30000
    assert scene.num_gaussians == n and scene.max_sh_degree == 3
    np.testing.assert_allclose(np.asarray(scene.means), xyz.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.sh[:, 0]), f_dc.numpy()[:, 0], rtol=1e-6)
    np.testing.assert_allclose(feats, sem.numpy(), rtol=1e-6)

    tup12 = tup13[:12]
    p2 = str(tmp_path / "chkpnt12.pth")
    torch.save((tup12, 30000), p2)
    scene2, it2, feats2 = load_reference_checkpoint(p2)
    assert it2 == 0 and feats2 is None  # RGB-only → restart feature training
