"""pcd utils, pose paths, metrics, colormaps tests."""

import numpy as np
import jax.numpy as jnp

from gags_tpu.utils.pcd import euclidean_clusters, points_to_map, position_encoding
from gags_tpu.utils.pose_paths import spiral_path, spherify_path
from gags_tpu.utils.metrics import psnr, ssim
from gags_tpu.utils.colormaps import turbo, apply_pca_colormap, apply_depth_colormap
from gags_tpu.core.camera import look_at


def test_clusters_two_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.01, (30, 3))
    b = rng.normal(0, 0.01, (25, 3)) + 5.0
    noise = np.array([[10.0, 10, 10]])
    labels = euclidean_clusters(np.concatenate([a, b, noise]), eps=0.1, min_points=5)
    assert len(set(labels[:30])) == 1 and labels[0] >= 0
    assert len(set(labels[30:55])) == 1 and labels[30] != labels[0]
    assert labels[-1] == -1


def test_points_to_map():
    uv = np.array([[0, 0], [2, 3]])
    vals = np.array([1.0, 2.0])
    m = points_to_map(uv, vals, (4, 5))
    assert m[0, 0] == 1.0 and m[2, 3] == 2.0 and m.sum() == 3.0


def test_position_encoding_shape():
    enc = position_encoding(jnp.zeros((7, 3)), num_freqs=4)
    assert enc.shape == (7, 24)


def _ring(n=10):
    out = []
    for a in np.linspace(0, 2 * np.pi, n, endpoint=False):
        eye = np.array([3 * np.cos(a), 0.2, 3 * np.sin(a)])
        out.append(np.linalg.inv(look_at(eye, np.zeros(3), np.array([0, -1.0, 0]))))
    return np.stack(out)


def test_spiral_and_spherify_shapes():
    c2ws = _ring()
    sp = spiral_path(c2ws, n_frames=24)
    assert sp.shape == (24, 4, 4)
    sph = spherify_path(c2ws, n_frames=24)
    assert sph.shape == (24, 4, 4)
    # orbit cameras look at the centre
    for vm in sph[:4]:
        pc = vm[:3, :3] @ np.zeros(3) + vm[:3, 3]
        assert pc[2] > 0


def test_psnr_ssim_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (32, 40, 3)).astype(np.float32))
    assert float(psnr(img, img)) > 80
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5
    noisy = jnp.clip(img + 0.1, 0, 1)
    assert float(psnr(img, noisy)) < 25


def test_ssim_matches_torch():
    import torch
    import torch.nn.functional as F
    from math import exp

    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))

    # independent torch implementation of the standard windowed SSIM
    def gwin(size=11, sigma=1.5):
        g = torch.tensor([exp(-((x - size // 2) ** 2) / (2 * sigma**2)) for x in range(size)])
        g = (g / g.sum()).unsqueeze(1)
        w = (g @ g.t()).unsqueeze(0).unsqueeze(0)
        return w.expand(3, 1, size, size).contiguous()

    ta = torch.from_numpy(a).permute(2, 0, 1)[None]
    tb = torch.from_numpy(b).permute(2, 0, 1)[None]
    w = gwin()
    mu1 = F.conv2d(ta, w, padding=5, groups=3)
    mu2 = F.conv2d(tb, w, padding=5, groups=3)
    s1 = F.conv2d(ta * ta, w, padding=5, groups=3) - mu1**2
    s2 = F.conv2d(tb * tb, w, padding=5, groups=3) - mu2**2
    s12 = F.conv2d(ta * tb, w, padding=5, groups=3) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    expect = float(m.mean())
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_turbo_and_pca():
    t = turbo(np.linspace(0, 1, 5))
    assert t.shape == (5, 3) and t.min() >= 0 and t.max() <= 1
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(8, 10, 16)).astype(np.float32)
    rgb, proj = apply_pca_colormap(feats)
    assert rgb.shape == (8, 10, 3) and proj.shape == (16, 3)
    rgb2, _ = apply_pca_colormap(feats, proj)
    np.testing.assert_allclose(rgb, rgb2, atol=1e-6)
    d = apply_depth_colormap(rng.uniform(1, 5, (6, 6)))
    assert d.shape == (6, 6, 3)
