"""Self-contained end-to-end demo on a synthetic scene (no weights needed).

Builds a tiny COLMAP-layout dataset with synthetic language features,
distills semantic features with the GAD trainer, then runs the query
stack: rendered relevancy heat maps and 3D point-cloud grounding. Runs on
CPU (Pallas interpret mode) in a couple of minutes.

  python examples/synthetic_demo.py /tmp/gags_demo
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_root: str):
    # CPU demo: force the platform BEFORE backend init (probing the default
    # backend would initialise — and potentially hang on — a remote TPU;
    # this environment exports JAX_PLATFORMS=axon, so override, don't defer)
    platform = os.environ.get("GAGS_DEMO_PLATFORM", "cpu")
    os.environ["JAX_PLATFORMS"] = platform
    import jax

    jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp  # noqa: F401

    from tests.test_e2e_gad import _build_fixture
    from gags_tpu.cli.train_gad import RunConfig, run
    from gags_tpu.gad.train import GadConfig
    from gags_tpu.splat.rasterizer import RasterizeConfig, auto_config

    scene_dir = os.path.join(out_root, "scene")
    model_dir = os.path.join(out_root, "model")
    ply = _build_fixture(scene_dir)
    print(f"synthetic COLMAP scene at {scene_dir}")

    rc = RunConfig(
        source_path=scene_dir, model_path=model_dir, ply_path=ply,
        resolution=1, iterations=60, save_iterations="60",
    )
    cfg = GadConfig(
        feature_dim=8, clip_dim=24, max_segments=16,
        raster=auto_config(tile_h=8, tile_w=16, chunk=8),
    )
    state = run(rc, cfg)
    print(f"distilled {int(state.step)} iterations -> {model_dir}")

    # text-embedding stand-ins: random unit vectors (real runs use
    # cli/encode_text with a converted CLIP checkpoint)
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1, 24)).astype(np.float32)
    pos /= np.linalg.norm(pos, axis=1, keepdims=True)
    neg = rng.normal(size=(4, 24)).astype(np.float32)
    neg /= np.linalg.norm(neg, axis=1, keepdims=True)
    embeds = os.path.join(out_root, "embeds.npz")
    np.savez(embeds, labels=np.array(["demo_object"]), pos=pos, neg=neg)

    import gags_tpu.cli.relevancy as rel_cli

    for argv in (
        ["-m", model_dir, "-s", scene_dir, "--iteration", "60",
         "--image_mode", "--text_embeds", embeds],
        ["-m", model_dir, "-s", scene_dir, "--iteration", "60",
         "--pcd_mode", "--no_smooth", "--thresh", "0.8",
         "--text_embeds", embeds],
    ):
        sys.argv = ["relevancy"] + argv
        rel_cli.main()
    print(f"heat maps: {model_dir}/relevancy/heatmap/demo_object/")
    print(f"3D grounding: {model_dir}/relevancy_pcd/demo_object.ply")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gags_demo")
