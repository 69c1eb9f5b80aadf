"""HTTP serving endpoint: health, render (rgb + feature PCA), relevancy."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import jax
import jax.numpy as jnp

from gags_tpu.cli.serve import SceneServer, make_handler
from gags_tpu.gad.train import GadConfig, create_train_state
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import RasterizeConfig
from gags_tpu.utils.synthetic import make_camera, make_scene

import pytest

pytestmark = pytest.mark.slow  # integration tier: full suite still runs them; `-m 'not slow'` is the fast iteration tier

W, H, N = 32, 16, 48


def _server():
    raw = make_scene(N, seed=0)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(
            np.log(raw["opacities"] / (1 - raw["opacities"]))
        ),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.asarray(
            np.random.default_rng(3).normal(size=(N, 8)).astype(np.float32)
        ),
    )
    cfg = GadConfig(
        feature_dim=8, clip_dim=16, max_segments=8,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    text = (
        ["thing"],
        rng.normal(size=(1, 16)).astype(np.float32),
        rng.normal(size=(2, 16)).astype(np.float32),
    )
    srv = SceneServer(
        scene, state, statics, text_embeds=text,
        raster=RasterizeConfig(
            tile_h=8, tile_w=16, chunk=8, interpret=True, aligned=False
        ),
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_endpoints():
    httpd, base = _server()
    try:
        cam = make_camera(W, H)
        vm = np.asarray(cam.viewmat).reshape(-1).tolist()
        K = np.asarray(cam.K).reshape(-1).tolist()

        with urllib.request.urlopen(base + "/health") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["n_gaussians"] == N
        assert health["labels"] == ["thing"]

        code, out = _post(base + "/render", dict(
            viewmat=vm, K=K, width=W, height=H, mode="rgb"))
        assert code == 200 and len(out["image_png"]) > 100

        code, out = _post(base + "/render", dict(
            viewmat=vm, K=K, width=W, height=H, mode="feature_pca"))
        assert code == 200 and len(out["image_png"]) > 100

        code, out = _post(base + "/relevancy", dict(
            viewmat=vm, K=K, width=W, height=H, label="thing"))
        assert code == 200 and "heatmap_png" in out and "mask_png" in out
        assert np.isfinite(out["relevancy_max"])

        rng = np.random.default_rng(9)
        code, out2 = _post(base + "/relevancy", dict(
            viewmat=vm, K=K, width=W, height=H,
            pos=rng.normal(size=16).tolist(),
            neg=rng.normal(size=(2, 16)).tolist(), thresh=0.4))
        assert code == 200 and "heatmap_png" in out2

        # errors surface as 400 with a message, not a dropped connection
        code, err = _post(base + "/relevancy", dict(
            viewmat=vm, K=K, width=W, height=H, label="nope"))
        assert code == 400 and "unknown label" in err["error"]
    finally:
        httpd.shutdown()


def test_serve_soa_feature_path_matches_aos():
    """A soa_geom raster config must serve IDENTICAL feature/relevancy
    products: SceneServer keeps lane-major copies for the feature
    programs and a soa_geom=False variant for the RGB/SH program."""
    raw = make_scene(N, seed=0)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(
            np.log(raw["opacities"] / (1 - raw["opacities"]))
        ),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.asarray(
            np.random.default_rng(3).normal(size=(N, 8)).astype(np.float32)
        ),
    )
    cfg = GadConfig(
        feature_dim=8, clip_dim=16, max_segments=8,
        raster=RasterizeConfig(tile_h=8, tile_w=16, chunk=8, interpret=True),
    )
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    base = dict(tile_h=8, tile_w=16, chunk=8, interpret=True, aligned=False,
                fast_color_rows=True)
    srv_aos = SceneServer(
        scene, state, statics, raster=RasterizeConfig(**base)
    )
    srv_soa = SceneServer(
        scene, state, statics,
        raster=RasterizeConfig(**base, soa_geom=True),
    )
    cam = make_camera(W, H)
    a = srv_aos._programs(W, H)
    b = srv_soa._programs(W, H)
    fa = np.asarray(a["feats"](cam.viewmat, cam.K))
    fb = np.asarray(b["feats"](cam.viewmat, cam.K))
    np.testing.assert_array_equal(fa, fb)
    ra = np.asarray(a["rgb"](cam.viewmat, cam.K))
    rb = np.asarray(b["rgb"](cam.viewmat, cam.K))  # AoS fallback config
    np.testing.assert_array_equal(ra, rb)
