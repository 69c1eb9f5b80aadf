"""PLY round-trip, GaussianScene construction, and KNN tests."""

import numpy as np
import jax.numpy as jnp

from gags_tpu.scene.ply import (
    read_ply,
    write_ply,
    read_gaussian_ply,
    write_gaussian_ply,
    read_points3d_ply,
    write_points3d_ply,
)
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.knn import mean_knn_sq_dist, knn_sq_dists


def test_ply_roundtrip_generic(tmp_path):
    p = str(tmp_path / "a.ply")
    fields = {
        "x": np.arange(5, dtype=np.float32),
        "y": np.arange(5, dtype=np.float32) * 2,
        "red": np.arange(5, dtype=np.uint8),
    }
    write_ply(p, fields)
    back = read_ply(p)
    for k in fields:
        np.testing.assert_array_equal(back[k], fields[k])


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 17
    p = str(tmp_path / "point_cloud.ply")
    means = rng.normal(size=(n, 3)).astype(np.float32)
    sh = rng.normal(size=(n, 16, 3)).astype(np.float32)
    op = rng.normal(size=(n,)).astype(np.float32)
    sc = rng.normal(size=(n, 3)).astype(np.float32)
    qu = rng.normal(size=(n, 4)).astype(np.float32)
    sem = rng.normal(size=(n, 16)).astype(np.float32)
    write_gaussian_ply(p, means, sh, op, sc, qu, sem)
    back = read_gaussian_ply(p)
    np.testing.assert_allclose(back["means"], means, rtol=1e-6)
    np.testing.assert_allclose(back["sh"], sh, rtol=1e-6)
    np.testing.assert_allclose(back["opacities_raw"], op, rtol=1e-6)
    np.testing.assert_allclose(back["scales_raw"], sc, rtol=1e-6)
    np.testing.assert_allclose(back["quats"], qu, rtol=1e-6)
    np.testing.assert_allclose(back["semantic_features"], sem, rtol=1e-6)


def test_gaussian_ply_without_semantics(tmp_path):
    p = str(tmp_path / "rgb_only.ply")
    n = 5
    write_gaussian_ply(
        p,
        np.zeros((n, 3), np.float32),
        np.zeros((n, 16, 3), np.float32),
        np.zeros(n, np.float32),
        np.zeros((n, 3), np.float32),
        np.zeros((n, 4), np.float32),
        semantic_features=None,
    )
    back = read_gaussian_ply(p)
    assert "semantic_features" not in back
    scene = GaussianScene.from_ply(p)
    assert scene.semantic_features is None
    assert scene.num_gaussians == n


def test_points3d_roundtrip(tmp_path):
    p = str(tmp_path / "points3D.ply")
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(12, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(12, 3)).astype(np.float32)
    write_points3d_ply(p, xyz, rgb)
    x2, r2, n2 = read_points3d_ply(p)
    np.testing.assert_allclose(x2, xyz, rtol=1e-6)
    np.testing.assert_allclose(r2, rgb, atol=1 / 255.0 + 1e-6)


def test_knn_exact_small():
    pts = jnp.array(
        [[0.0, 0, 0], [1, 0, 0], [0, 2, 0], [0, 0, 3], [5, 5, 5]], jnp.float32
    )
    d = np.asarray(knn_sq_dists(pts, k=3))
    # point 0: neighbours at d2 = 1, 4, 9
    np.testing.assert_allclose(np.sort(d[0]), [1, 4, 9], rtol=1e-5)


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    d = np.asarray(mean_knn_sq_dist(jnp.asarray(pts)))
    # brute force
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expect = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(d, expect, rtol=1e-4)


def test_scene_from_point_cloud_matches_reference_init():
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    scene = GaussianScene.from_point_cloud(xyz, rgb)
    assert scene.semantic_features.shape == (50, 16)
    np.testing.assert_allclose(np.asarray(scene.opacities), 0.1, atol=1e-5)
    # dc coefficient encodes rgb
    from gags_tpu.core.sh import sh_to_rgb

    np.testing.assert_allclose(
        np.asarray(sh_to_rgb(scene.sh[:, 0, :])), rgb, atol=1e-5
    )
    # scales = sqrt(mean 3nn dist^2), isotropic
    d = np.asarray(mean_knn_sq_dist(jnp.asarray(xyz)))
    np.testing.assert_allclose(
        np.asarray(scene.scales)[:, 0], np.sqrt(np.maximum(d, 1e-7)), rtol=1e-4
    )
