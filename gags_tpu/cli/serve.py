"""HTTP serving endpoint for trained GAGS scenes — render + open-vocab query.

Beyond-reference (the reference ships only the SIBR socket viewer, which
`utils/viewer.py` mirrors): a production-shaped JSON/HTTP server exposing
the trained scene for novel-view rendering and text-query relevancy, the
two inference products of the pipeline. TPU-first serving decisions:

  * one jitted render/relevancy program per (width, height) — static
    shapes compile once and are cached for the life of the server;
  * requests are serialized through a device lock (one in-flight program
    keeps the single-chip latency predictable; batch throughput is the
    camera-sharded `make_dp_render` path, not this endpoint);
  * optional `--autotune` picks the fastest parity-guarded kernel variant
    for the serving resolution at startup (splat/autotune.py).

Endpoints (JSON in, JSON out; images as base64 PNG):
  GET  /health
  POST /render     {viewmat: 16 floats (row-major 4x4), K: 9 floats,
                    width, height, mode: "rgb" | "feature_pca"}
  POST /relevancy  {viewmat, K, width, height, thresh?,
                    label: <name from --text_embeds>  OR
                    pos: [D floats], neg: [[D floats], ...]}
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import dataclasses
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax
import jax.numpy as jnp


def _png_b64(img01: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.clip(img01, 0, 1) * 255).astype(np.uint8)).save(
        buf, format="PNG"
    )
    return base64.b64encode(buf.getvalue()).decode("ascii")


class SceneServer:
    """Holds the loaded scene/state and per-resolution jitted programs."""

    def __init__(self, scene, state, statics, text_embeds=None, raster=None):
        from gags_tpu.splat.rasterizer import auto_config

        self.scene = scene
        self.state = state
        self.statics = statics
        self.text = text_embeds  # (labels, pos (L, D), neg (Ln, D)) or None
        self.raster = raster or auto_config(aligned=False)
        self.lock = threading.Lock()
        self._progs = {}
        # feature-path geometry: lane-major one-time copies when the
        # startup autotune picked soa_geom (bit-identical; the RGB/SH
        # path keeps AoS — render()'s SH colours consume (N, 3) means)
        self._geo = dict(
            means=scene.means, quats=scene.quats, scales=scene.scales,
            opacities=scene.opacities,
        )
        if self.raster.soa_geom:
            from gags_tpu.splat.rasterizer import soa_geometry

            m_t, q_t, s_t = soa_geometry(
                scene.means, scene.quats, scene.scales
            )
            self._geo_f = dict(
                means=m_t, quats=q_t, scales=s_t,
                opacities=scene.opacities,
            )
            self._raster_rgb = dataclasses.replace(self.raster, soa_geom=False)
        else:
            self._geo_f = self._geo
            self._raster_rgb = self.raster

    # -- program cache ----------------------------------------------------
    def _programs(self, width: int, height: int):
        key = (width, height)
        if key in self._progs:
            return self._progs[key]
        from gags_tpu.core.camera import Camera
        from gags_tpu.splat.render import render
        from gags_tpu.query.grounding import decode_map_rows
        from gags_tpu.query.relevancy import max_across_levels

        scene, state = self.scene, self.state
        dec = self.statics["decoder"]
        sh_degree = scene.max_sh_degree

        # geometry/features are jit ARGUMENTS, never closed over: XLA
        # embeds closures as constants and constant-folds the projection
        # chain — compile time explodes with N (NOTES.md)
        def cam(viewmat, K, name="req"):
            return Camera(
                viewmat=viewmat, K=K, width=width, height=height, name=name
            )

        def rgb(g, sh, viewmat, K):
            out = render(
                cam(viewmat, K),
                means=g["means"], quats=g["quats"], scales=g["scales"],
                opacities=g["opacities"], sh=sh, sh_degree=sh_degree,
                feature_mode=False, bg_color=jnp.zeros((3,)),
                config=self._raster_rgb,
            )
            return out.render

        def feats(g, semf, viewmat, K):
            out = render(
                cam(viewmat, K),
                means=g["means"], quats=g["quats"], scales=g["scales"],
                opacities=g["opacities"], semantic_features=semf,
                feature_mode=True, bg_color=jnp.zeros((3,)),
                config=self.raster,
            )
            return out.render

        geo, geo_f = self._geo, self._geo_f
        rgb_j, feats_j = jax.jit(rgb), jax.jit(feats)

        def rel(vm, K, pos, neg):
            # decode_map_rows is host-row-chunked (bounds the (H, W, 512)
            # decode memory at 1080p) — it stays outside the jit; the
            # device work is dominated by the jitted render
            fmap = feats_j(geo_f, state.features, vm, K)
            decoded = decode_map_rows(
                dec.apply, state.decoder_params, fmap
            )
            return max_across_levels(decoded[None], pos, neg)[0]

        progs = {
            "rgb": lambda vm, K: rgb_j(geo, scene.sh, vm, K),
            "feats": lambda vm, K: feats_j(geo_f, state.features, vm, K),
            "rel": rel,
        }
        self._progs[key] = progs
        return progs

    # -- request handlers --------------------------------------------------
    def health(self):
        return {
            "status": "ok",
            "n_gaussians": int(self.scene.means.shape[0]),
            "feature_dim": (
                int(self.state.features.shape[1])
                if self.state.features is not None else 0
            ),
            "labels": list(self.text[0]) if self.text else [],
            "compiled": [list(k) for k in self._progs],
        }

    def render(self, req):
        vm = jnp.asarray(
            np.asarray(req["viewmat"], np.float32).reshape(4, 4)
        )
        K = jnp.asarray(np.asarray(req["K"], np.float32).reshape(3, 3))
        w, h = int(req["width"]), int(req["height"])
        mode = req.get("mode", "rgb")
        progs = self._programs(w, h)
        import time

        with self.lock:
            t0 = time.perf_counter()
            if mode == "feature_pca":
                from gags_tpu.utils.colormaps import apply_pca_colormap

                fmap = np.asarray(progs["feats"](vm, K))
                img, _ = apply_pca_colormap(fmap, None)
            else:
                img = np.asarray(progs["rgb"](vm, K))
            ms = (time.perf_counter() - t0) * 1e3
        return {"image_png": _png_b64(img), "mode": mode,
                "render_ms": round(ms, 2)}

    def relevancy(self, req):
        vm = jnp.asarray(
            np.asarray(req["viewmat"], np.float32).reshape(4, 4)
        )
        K = jnp.asarray(np.asarray(req["K"], np.float32).reshape(3, 3))
        w, h = int(req["width"]), int(req["height"])
        if "label" in req:
            if not self.text:
                raise ValueError("server started without --text_embeds")
            labels, pos, neg = self.text
            if req["label"] not in labels:
                raise ValueError(f"unknown label {req['label']!r}")
            k = labels.index(req["label"])
            pos_j = jnp.asarray(pos[k : k + 1])
        else:
            pos_j = jnp.asarray(
                np.asarray(req["pos"], np.float32).reshape(1, -1)
            )
            neg = np.asarray(req["neg"], np.float32)
        neg_j = jnp.asarray(neg)
        progs = self._programs(w, h)
        with self.lock:
            rel = np.asarray(progs["rel"](vm, K, pos_j, neg_j)[0])
        from gags_tpu.query.relevancy import heatmap_to_mask, majority_smooth
        from gags_tpu.utils.colormaps import turbo

        thresh = float(req.get("thresh", 0.5))
        mask, vmap = heatmap_to_mask(jnp.asarray(rel), thresh)
        mask = np.asarray(majority_smooth(mask))
        heat = turbo(np.asarray(vmap))
        return {
            "heatmap_png": _png_b64(heat),
            "mask_png": _png_b64(mask.astype(np.float32)[..., None].repeat(3, -1)),
            "relevancy_max": float(rel.max()),
            "selected_px": int(mask.sum()),
        }


def make_handler(server: SceneServer):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, server.health())
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            ln = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(ln) or b"{}")
                if self.path == "/render":
                    self._reply(200, server.render(req))
                elif self.path == "/relevancy":
                    self._reply(200, server.relevancy(req))
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as exc:  # surface the failure to the client
                self._reply(400, {"error": f"{type(exc).__name__}: {exc}"})

        def log_message(self, fmt, *a):  # quiet; errors go to the client
            pass

    return Handler


def load_server(model_path, iteration, text_embeds=None, autotune=False,
                autotune_res=None):
    from gags_tpu.gad.checkpoints import latest_checkpoint_step, load_checkpoint
    from gags_tpu.gad.train import GadConfig, create_train_state
    from gags_tpu.scene.gaussian_data import GaussianScene
    from gags_tpu.splat.rasterizer import auto_config

    ply = os.path.join(
        model_path, "point_cloud", f"iteration_{iteration}", "point_cloud.ply"
    )
    scene = GaussianScene.from_ply(ply)
    cfg = GadConfig.load(
        model_path, feature_dim=scene.semantic_features.shape[1]
    )
    state, statics = create_train_state(scene, jax.random.PRNGKey(0), cfg)
    step = latest_checkpoint_step(model_path) or iteration
    state = load_checkpoint(model_path, step, state)
    text = None
    if text_embeds:
        data = np.load(text_embeds, allow_pickle=True)
        text = ([str(l) for l in data["labels"]], data["pos"], data["neg"])
    raster = auto_config(aligned=False)
    if not autotune and autotune_res:
        # reuse a persisted tuned winner by default (feature/relevancy
        # serving tolerates the bf16 contract; the RGB/SH program builds
        # its own exact config inside SceneServer)
        from gags_tpu.splat.autotune import load_persisted

        w, h = autotune_res
        tuned = load_persisted(
            w, h, int(scene.means.shape[0]),
            int(state.features.shape[1]), allow_bf16=True,
        )
        if tuned is not None:
            import dataclasses as _dc

            if tuned.image_chw:
                tuned = _dc.replace(tuned, image_chw=False)
            # soa_geom kept: SceneServer builds lane-major copies itself
            raster = tuned
            print("# serve: persisted tuned config reused", flush=True)
    if autotune and autotune_res:
        from gags_tpu.splat.autotune import autotune_config
        from gags_tpu.utils.synthetic import make_camera

        w, h = autotune_res
        c0 = make_camera(w, h)
        raster = autotune_config(
            scene.means, scene.quats, scene.scales, scene.opacities,
            state.features, c0.viewmat, c0.K, w, h,
            base=auto_config(aligned=False, fast_color_rows=True),
            # SceneServer keeps lane-major copies for the feature path
            # when this wins (the RGB/SH program stays AoS)
            allow_soa=True,
            verbose=True,
        )
    return SceneServer(scene, state, statics, text_embeds=text, raster=raster)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("--text_embeds", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--autotune", action="store_true")
    p.add_argument("--autotune_res", default="1280x720",
                   help="WxH used for the startup autotune sweep")
    args = p.parse_args()

    w, h = (int(x) for x in args.autotune_res.split("x"))
    srv = load_server(
        args.model_path, args.iteration,
        text_embeds=args.text_embeds or None,
        autotune=args.autotune, autotune_res=(w, h),
    )
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(srv))
    print(f"serving {args.model_path} on http://{args.host}:{args.port} "
          f"(/health /render /relevancy)", flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
