"""End-to-end GAD: COLMAP fixture on disk → CLI run → checkpoint + PLY."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gags_tpu.scene import colmap as cm
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.scene.dataset import detect_and_load
from gags_tpu.utils.synthetic import make_scene
from gags_tpu.core.camera import look_at

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier


def _build_fixture(root, n_cams=4, n_gauss=60, w=32, h=16, n_masks=5):
    rng = np.random.default_rng(0)
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    feat_dir = os.path.join(root, "language_features")
    os.makedirs(feat_dir, exist_ok=True)

    f = 20.0
    cams = {1: cm.ColmapCamera(1, "PINHOLE", w, h, np.array([f, f, w / 2, h / 2]))}
    imgs = {}
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        eye = np.array([0.4 * np.cos(ang), 0.4 * np.sin(ang), -0.5])
        vm = look_at(eye, np.array([0.0, 0.0, 6.0]), np.array([0, -1.0, 0]))
        R_w2c = vm[:3, :3]
        qvec = cm.rotmat_to_qvec(R_w2c)
        imgs[i + 1] = cm.ColmapImage(i + 1, qvec, vm[:3, 3], 1, f"img{i:03d}.png")
        emb = rng.normal(size=(n_masks, 24)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        np.save(os.path.join(feat_dir, f"img{i:03d}_f.npy"), emb)
        seg = np.full((4, h, w), -1.0, np.float32)
        seg[0] = 0
        seg[1, :, : w // 2] = 0
        seg[1, :, w // 2 :] = 1
        seg[2] = 2
        seg[3] = rng.integers(3, n_masks, size=(h, w))
        np.save(os.path.join(feat_dir, f"img{i:03d}_s.npy"), seg)
    cm.write_cameras_binary(os.path.join(sparse, "cameras.bin"), cams)
    cm.write_images_binary(os.path.join(sparse, "images.bin"), imgs)
    xyz = rng.normal(size=(30, 3)) + [0, 0, 6.0]
    cm.write_points3d_binary(
        os.path.join(sparse, "points3D.bin"), xyz, rng.integers(0, 255, (30, 3))
    )

    raw = make_scene(n_gauss, seed=3)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(np.log(raw["opacities"] / (1 - raw["opacities"]))),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.zeros((n_gauss, 8)),
    )
    ply = os.path.join(root, "pretrained.ply")
    scene.save_ply(ply)
    return ply


def test_colmap_fixture_roundtrip(tmp_path):
    root = str(tmp_path / "scene")
    _build_fixture(root)
    info = detect_and_load(root)
    assert len(info.train_cameras) == 4
    assert info.train_cameras[0].width == 32
    assert os.path.exists(info.train_cameras[0].f_path)
    assert info.radius > 0


@pytest.mark.slow
def test_full_training_cli(tmp_path):
    from gags_tpu.cli.train_gad import RunConfig, run
    from gags_tpu.gad.train import GadConfig
    from gags_tpu.splat.rasterizer import RasterizeConfig

    root = str(tmp_path / "scene")
    model = str(tmp_path / "model")
    ply = _build_fixture(root)

    rc = RunConfig(
        source_path=root,
        model_path=model,
        ply_path=ply,
        resolution=1,
        iterations=12,
        save_iterations="12",
    )
    cfg = GadConfig(
        feature_dim=8,
        clip_dim=24,
        max_segments=16,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state = run(rc, cfg)
    assert int(state.step) == 12
    assert os.path.exists(os.path.join(model, "chkpnt12"))
    out_ply = os.path.join(model, "point_cloud", "iteration_12", "point_cloud.ply")
    assert os.path.exists(out_ply)
    back = GaussianScene.from_ply(out_ply)
    assert back.semantic_features.shape == (60, 8)
    # features actually trained (non-zero)
    assert float(jnp.abs(back.semantic_features).max()) > 0
    assert os.path.exists(os.path.join(model, "cfg.json"))
    assert os.path.exists(os.path.join(model, "metrics.jsonl"))


@pytest.mark.slow
def test_warm_start_from_reference_torch_checkpoint(tmp_path):
    """--start_checkpoint: 13-tuple chkpnt<N>.pth + decoder checkpoints
    warm-start training at iteration N (reference train.py:81-94)."""
    torch = pytest.importorskip("torch")
    from gags_tpu.cli.train_gad import RunConfig, run
    from gags_tpu.gad.train import GadConfig
    from gags_tpu.splat.rasterizer import RasterizeConfig
    from gags_tpu.utils.synthetic import make_scene

    root = str(tmp_path / "scene")
    model = str(tmp_path / "model")
    _build_fixture(root)

    raw = make_scene(60, seed=3)
    n = 60
    rng = np.random.default_rng(0)
    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    args13 = (
        3, t(raw["means"]), t(raw["sh"][:, :1]), t(raw["sh"][:, 1:]),
        t(np.log(raw["scales"])), t(raw["quats"]),
        t(np.log(raw["opacities"] / (1 - raw["opacities"]))[:, None]),
        t(np.zeros(n)), t(np.zeros(n)), t(np.zeros(n)), {}, 1.0,
        t(rng.normal(size=(n, 8)) * 0.01),
    )
    os.makedirs(model, exist_ok=True)
    ck = os.path.join(model, "chkpnt6.pth")
    torch.save((args13, 6), ck)

    def conv_sd(dims_in, dims_out):
        sd = {}
        for i, (ci, co) in enumerate(zip(dims_in, dims_out)):
            sd[f"decoder.{2*i}.weight"] = t(
                rng.normal(scale=0.1, size=(co, ci, 1, 1)))
            sd[f"decoder.{2*i}.bias"] = t(np.zeros(co))
        return sd

    torch.save({"module_state_dict": conv_sd([8] + [256] * 8, [256] * 8 + [24])},
               os.path.join(model, "decoder_chkpnt6.pth"))
    torch.save(
        {"module_state_dict": conv_sd([8, 64, 128, 64, 32, 16],
                                     [64, 128, 64, 32, 16, 3])},
        os.path.join(model, "scale_decoder_chkpnt6.pth"))

    rc = RunConfig(source_path=root, model_path=model, start_checkpoint=ck,
                   resolution=1, iterations=8, save_iterations="8")
    cfg = GadConfig(
        feature_dim=8, clip_dim=24, max_segments=16,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True))
    state = run(rc, cfg)
    # warm start at iter 6, trained to 8 → 2 new optimizer steps
    assert int(state.step) == 2
    out_ply = os.path.join(model, "point_cloud", "iteration_8", "point_cloud.ply")
    assert os.path.exists(out_ply)
