"""CLI integration over the synthetic disk fixture (render, depth sample,
metrics, relevancy pcd-mode, edit)."""

import json
import os
import sys

import numpy as np
import pytest

from tests.test_e2e_gad import _build_fixture

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier


def _run_cli(module, argv, monkeypatch):
    import importlib

    m = importlib.import_module(module)
    monkeypatch.setattr(sys, "argv", [module] + argv)
    m.main()


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train the fixture for a few iters to get a model dir with ckpt+PLY."""
    from gags_tpu.cli.train_gad import RunConfig, run
    from gags_tpu.gad.train import GadConfig
    from gags_tpu.splat.rasterizer import RasterizeConfig

    tmp = tmp_path_factory.mktemp("cli")
    root, model = str(tmp / "scene"), str(tmp / "model")
    ply = _build_fixture(root)
    cfg = GadConfig(
        feature_dim=8, clip_dim=24, max_segments=16,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    run(RunConfig(source_path=root, model_path=model, ply_path=ply,
                  resolution=1, iterations=6, save_iterations="6",
                  test_iterations="4"), cfg)
    return root, model


def test_train_cli_data_parallel(tmp_path):
    """--devices 2: camera-DP training through the CLI on the virtual mesh
    (binned fast path, uniform budgets, stacked batches) produces a
    checkpoint + PLY and finite losses."""
    from gags_tpu.cli.train_gad import RunConfig, run
    from gags_tpu.gad.train import GadConfig
    from gags_tpu.splat.rasterizer import RasterizeConfig

    root, model = str(tmp_path / "scene"), str(tmp_path / "model")
    ply = _build_fixture(root, n_cams=5)
    cfg = GadConfig(
        feature_dim=8, clip_dim=24, max_segments=16,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state = run(RunConfig(source_path=root, model_path=model, ply_path=ply,
                          resolution=1, iterations=4, save_iterations="4",
                          test_iterations="", devices=2), cfg)
    assert int(state.step) == 4
    assert os.path.isdir(os.path.join(model, "chkpnt4"))
    rows = [json.loads(l) for l in open(os.path.join(model, "metrics.jsonl"))]
    assert all(np.isfinite(r.get("loss", 0.0)) for r in rows)


def test_heldout_report_written(tmp_path):
    """--eval training writes held-out metrics + scale-map dumps at test
    iterations (reference training_report analogue, train.py:244-286)."""
    from gags_tpu.cli.train_gad import RunConfig, run
    from gags_tpu.gad.train import GadConfig
    from gags_tpu.splat.rasterizer import RasterizeConfig

    root, model = str(tmp_path / "scene"), str(tmp_path / "model")
    ply = _build_fixture(root, n_cams=5)
    cfg = GadConfig(
        feature_dim=8, clip_dim=24, max_segments=16,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    run(RunConfig(source_path=root, model_path=model, ply_path=ply,
                  resolution=1, iterations=4, save_iterations="4",
                  test_iterations="4", eval_split=True), cfg)
    rows = [json.loads(l) for l in open(os.path.join(model, "metrics.jsonl"))]
    test_rows = [r for r in rows if any(k.startswith("test_") for k in r)]
    assert test_rows and test_rows[0]["step"] == 4
    assert "test_l1_feature" in test_rows[0]
    dumps = os.listdir(os.path.join(model, "test_renders"))
    assert "scale_map_4.png" in dumps and "scale_map_s_4.png" in dumps


def test_render_cli_rgb_ed(trained, monkeypatch):
    root, model = trained
    _run_cli(
        "gags_tpu.cli.render",
        ["-m", model, "-s", root, "--iteration", "6",
         "--render_mode", "RGB+ED", "-r", "1", "--skip_test",
         # exercises the autotune code path (on CPU it keeps the base
         # config — interpret timing is meaningless)
         "--autotune"],
        monkeypatch,
    )
    base = os.path.join(model, "train", "ours_6")
    renders = os.listdir(os.path.join(base, "renders"))
    assert len(renders) == 4
    depths = [f for f in os.listdir(os.path.join(base, "depth")) if f.endswith(".npy")]
    assert len(depths) == 4
    d = np.load(os.path.join(base, "depth", depths[0]))
    assert d.shape == (16, 32)


def test_depth_sample_cli(trained, monkeypatch):
    root, model = trained
    _run_cli(
        "gags_tpu.cli.depth_sample",
        ["-s", root, "-m", model, "--iteration", "6", "-r", "1"],
        monkeypatch,
    )
    out = os.listdir(os.path.join(root, "depths_sample"))
    assert len(out) == 4
    m = np.load(os.path.join(root, "depths_sample", out[0]))
    assert m.shape == (16, 32)
    assert (m >= 0).all()


def test_relevancy_pcd_cli(trained, monkeypatch, tmp_path):
    root, model = trained
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(2, 24)).astype(np.float32)
    pos /= np.linalg.norm(pos, axis=1, keepdims=True)
    neg = rng.normal(size=(4, 24)).astype(np.float32)
    neg /= np.linalg.norm(neg, axis=1, keepdims=True)
    embeds = str(tmp_path / "embeds.npz")
    np.savez(embeds, labels=np.array(["cup", "table"]), pos=pos, neg=neg)
    _run_cli(
        "gags_tpu.cli.relevancy",
        ["-m", model, "-s", root, "--iteration", "6", "--pcd_mode",
         "--text_embeds", embeds, "--no_smooth", "--thresh", "0.9"],
        monkeypatch,
    )
    out = os.listdir(os.path.join(model, "relevancy_pcd"))
    assert sorted(out) == ["cup.ply", "table.ply"]


def test_metrics_cli(trained, monkeypatch, tmp_path):
    root, model = trained
    # fabricate a gt dir mirroring renders
    base = os.path.join(model, "train", "ours_6")
    gt = os.path.join(base, "gt")
    os.makedirs(gt, exist_ok=True)
    import shutil

    for f in os.listdir(os.path.join(base, "renders")):
        shutil.copy(os.path.join(base, "renders", f), os.path.join(gt, f))
    _run_cli(
        "gags_tpu.cli.metrics",
        ["-m", model, "--split", "train"],
        monkeypatch,
    )
    with open(os.path.join(model, "results.json")) as f:
        res = json.load(f)
    assert res["ours_6"]["PSNR"] > 60  # identical images
    assert abs(res["ours_6"]["SSIM"] - 1.0) < 1e-3


def test_render_cli_depth_golden(trained, monkeypatch):
    """End-to-end RGB+ED depth parity: the depth .npy written by the render
    CLI must match the pure-JAX oracle's accumulated-depth/alpha map
    (gsplat RGB+ED semantics, gaussian_renderer/__init__.py:56-70)."""
    import jax.numpy as jnp

    from gags_tpu.cli.render import camera_from_info
    from gags_tpu.core.sh import sh_colors
    from gags_tpu.scene.dataset import detect_and_load
    from gags_tpu.scene.gaussian_data import GaussianScene
    from gags_tpu.splat.projection import project_gaussians
    from gags_tpu.splat.reference import rasterize_reference

    root, model = trained
    if not os.path.exists(os.path.join(model, "train", "ours_6", "depth")):
        _run_cli(
            "gags_tpu.cli.render",
            ["-m", model, "-s", root, "--iteration", "6",
             "--render_mode", "RGB+ED", "-r", "1", "--skip_test"],
            monkeypatch,
        )
    info = detect_and_load(root).train_cameras[0]
    cam = camera_from_info(info, 1)
    ply = os.path.join(
        model, "point_cloud", "iteration_6", "point_cloud.ply"
    )
    scene = GaussianScene.from_ply(ply)

    name = os.path.splitext(info.name)[0]
    got = np.load(os.path.join(model, "train", "ours_6", "depth", name + "_depth.npy"))

    proj = project_gaussians(
        scene.means, scene.quats, scene.scales, cam.viewmat, cam.K,
        cam.width, cam.height,
    )
    rgb = sh_colors(scene.max_sh_degree, scene.sh, scene.means, cam.campos)
    colors = jnp.concatenate([rgb, proj.depths[:, None]], axis=-1)
    bg = jnp.concatenate([jnp.zeros((3,)), jnp.zeros((1,))])
    img, alpha = rasterize_reference(
        proj.means2d, proj.conics, proj.depths, proj.radii,
        scene.opacities, colors, cam.width, cam.height, background=bg,
    )
    expect = np.asarray(img[..., 3] / jnp.maximum(alpha, 1e-10))
    np.testing.assert_allclose(got, expect, atol=1e-4, rtol=1e-4)


def test_relevancy_video_cli(trained, monkeypatch, tmp_path):
    """--video renders along the spline path AND encodes an mp4 per label."""
    root, model = trained
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(1, 24)).astype(np.float32)
    pos /= np.linalg.norm(pos, axis=1, keepdims=True)
    neg = rng.normal(size=(4, 24)).astype(np.float32)
    neg /= np.linalg.norm(neg, axis=1, keepdims=True)
    embeds = str(tmp_path / "embeds_v.npz")
    np.savez(embeds, labels=np.array(["cup"]), pos=pos, neg=neg)
    _run_cli(
        "gags_tpu.cli.relevancy",
        ["-m", model, "-s", root, "--iteration", "6", "--image_mode",
         "--video", "--video_frames", "4", "--text_embeds", embeds],
        monkeypatch,
    )
    vid = os.path.join(model, "relevancy", "video", "cup.mp4")
    assert os.path.exists(vid) and os.path.getsize(vid) > 0
    frames = os.listdir(os.path.join(model, "relevancy", "composited", "cup"))
    assert len([f for f in frames if f.startswith("novel_")]) == 4


def test_evaluate_cli(trained, monkeypatch, tmp_path):
    """IoU/loc eval CLI end-to-end on the synthetic fixture: labelme GT
    folder + precomputed text embeds → iou_loc_<iter>.json summary
    (reference evaluate_iou_loc.py flow, eval.sh:11-17)."""
    root, model = trained
    h, w = 16, 32
    gt_dir = tmp_path / "gt_json"
    gt_dir.mkdir()
    data = {
        "info": {"height": h, "width": w, "name": "frame_00001.jpg"},
        "objects": [
            {
                "category": "cup",
                "bbox": [4, 4, 20, 12],
                "segmentation": [[4, 4], [20, 4], [20, 12], [4, 12]],
            }
        ],
    }
    (gt_dir / "frame_00001.json").write_text(json.dumps(data))
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(1, 24)).astype(np.float32)
    pos /= np.linalg.norm(pos, axis=1, keepdims=True)
    neg = rng.normal(size=(3, 24)).astype(np.float32)
    neg /= np.linalg.norm(neg, axis=1, keepdims=True)
    embeds = str(tmp_path / "embeds.npz")
    np.savez(embeds, labels=np.array(["cup"]), pos=pos, neg=neg)
    _run_cli(
        "gags_tpu.cli.evaluate",
        ["-m", model, "-s", root, "--gt_json", str(gt_dir),
         "--iteration", "6", "--text_embeds", embeds],
        monkeypatch,
    )
    summary = json.load(open(os.path.join(model, "iou_loc_6.json")))
    assert 0.0 <= summary["miou"] <= 1.0
    assert 0.0 <= summary["loc_acc"] <= 1.0
    assert summary["frames"]["0"]["labels"] == ["cup"]
