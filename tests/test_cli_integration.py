"""CLI integration over the synthetic disk fixture (render, depth sample,
metrics, relevancy pcd-mode, edit)."""

import json
import os
import sys

import numpy as np
import pytest

from tests.test_e2e_gad import _build_fixture


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
                  resolution=1, iterations=6, save_iterations="6"), cfg)
    return root, model


def test_render_cli_rgb_ed(trained, monkeypatch):
    root, model = trained
    _run_cli(
        "gags_tpu.cli.render",
        ["-m", model, "-s", root, "--iteration", "6",
         "--render_mode", "RGB+ED", "-r", "1", "--skip_test"],
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
