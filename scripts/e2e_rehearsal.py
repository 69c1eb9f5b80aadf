"""Realistic-scale end-to-end rehearsal on the TPU (VERDICT r4 item 7).

The closest real-data proxy the offline env allows: a synthetic COLMAP
scene at 720p with 250k Gaussians, 512-dim language features and M=300
masks per image → 500 GAD distillation iterations → render + relevancy
CLIs — logging per-stage wall-clock and HBM peak. Validates the memory
envelope assumed by SURVEY §7.3.6 for 1080p-class scenes.

Usage: python scripts/e2e_rehearsal.py [workdir] [iters]
       (defaults /tmp/gags_rehearsal 500)
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import _retry  # noqa: F401 — persistent compile cache across re-execs

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gags_rehearsal"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 500

N_GAUSS = 250_000
W, H = 1280, 720
N_CAMS = 8
N_MASKS = 300
CLIP_DIM = 512

_t0 = time.perf_counter()
_stages = []


def stage(name):
    global _t0
    now = time.perf_counter()
    _stages.append((name, now - _t0))
    _t0 = now
    print(f"== {name}: {_stages[-1][1]:.1f}s", flush=True)


def hbm_peak():
    import jax

    try:
        st = jax.local_devices()[0].memory_stats()
        return f"{st.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB"
    except Exception:
        return "n/a"


def build_scene(root):
    import jax.numpy as jnp
    from PIL import Image

    from gags_tpu.scene import colmap as cm
    from gags_tpu.scene.gaussian_data import GaussianScene
    from gags_tpu.core.camera import look_at
    from gags_tpu.utils.synthetic import make_scene

    rng = np.random.default_rng(0)
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    feat_dir = os.path.join(root, "language_features")
    os.makedirs(feat_dir, exist_ok=True)

    f = 900.0
    cams = {1: cm.ColmapCamera(1, "PINHOLE", W, H,
                               np.array([f, f, W / 2, H / 2]))}
    imgs = {}
    # one shared image + per-view seg layout keeps fixture build fast;
    # the training math is unaffected (features/seg drive GAD, not pixels)
    base_img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    for i in range(N_CAMS):
        ang = 2 * np.pi * i / N_CAMS
        eye = np.array([0.6 * np.cos(ang), 0.6 * np.sin(ang), -0.8])
        vm = look_at(eye, np.array([0.0, 0.0, 6.0]), np.array([0, -1.0, 0]))
        qvec = cm.rotmat_to_qvec(vm[:3, :3])
        name = f"img{i:03d}.png"
        imgs[i + 1] = cm.ColmapImage(i + 1, qvec, vm[:3, 3], 1, name)
        Image.fromarray(base_img).save(os.path.join(img_dir, name))
        emb = rng.normal(size=(N_MASKS, CLIP_DIM)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        np.save(os.path.join(feat_dir, f"img{i:03d}_f.npy"),
                emb.astype(np.float16))
        # 4 granularity seg levels with region sizes spanning the scales a
        # real SAM map produces (big wholes, medium parts, small subparts)
        seg = np.full((4, H, W), -1.0, np.float32)
        gy, gx = np.mgrid[0:H, 0:W]
        seg[0] = (gx // (W // 4)).clip(0, 3)
        seg[1] = (4 + (gx // (W // 16)) % 32).clip(0, N_MASKS - 1)
        seg[2] = (40 + (gy // (H // 12)) * 12 + (gx // (W // 12))) % N_MASKS
        seg[3] = rng.integers(0, N_MASKS, size=(H, W))
        np.save(os.path.join(feat_dir, f"img{i:03d}_s.npy"), seg)
    cm.write_cameras_binary(os.path.join(sparse, "cameras.bin"), cams)
    cm.write_images_binary(os.path.join(sparse, "images.bin"), imgs)
    xyz = rng.normal(size=(1000, 3)) * 2.0 + [0, 0, 6.0]
    cm.write_points3d_binary(
        os.path.join(sparse, "points3D.bin"), xyz,
        rng.integers(0, 255, (1000, 3)),
    )

    raw = make_scene(N_GAUSS, seed=3, extent=3.0)
    scene = GaussianScene(
        means=jnp.asarray(raw["means"]) + jnp.asarray([0.0, 0.0, 6.0]),
        sh=jnp.asarray(raw["sh"]),
        opacities_raw=jnp.asarray(
            np.log(raw["opacities"] / (1 - raw["opacities"]))
        ),
        scales_raw=jnp.asarray(np.log(raw["scales"])),
        quats=jnp.asarray(raw["quats"]),
        semantic_features=jnp.zeros((N_GAUSS, 16)),
    )
    ply = os.path.join(root, "pretrained.ply")
    scene.save_ply(ply)
    return ply


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    scene_dir = os.path.join(WORK, "scene")
    model_dir = os.path.join(WORK, "model")
    if os.path.isdir(WORK):
        shutil.rmtree(WORK)

    ply = build_scene(scene_dir)
    stage("build_fixture")

    from gags_tpu.cli.train_gad import RunConfig, run
    from gags_tpu.gad.train import GadConfig

    rc = RunConfig(
        source_path=scene_dir, model_path=model_dir, ply_path=ply,
        resolution=2,  # GAD.sh runs -r 2 → 640x360 supervision
        iterations=ITERS, save_iterations=str(ITERS),
        test_iterations="",
    )
    cfg = GadConfig(feature_dim=16, clip_dim=CLIP_DIM, max_segments=512)
    state = run(rc, cfg)
    assert int(state.step) == ITERS
    print(f"HBM peak after training: {hbm_peak()}", flush=True)
    stage(f"gad_train_{ITERS}it")

    # feature-mode render CLI over the train split (writes renders + npy)
    from gags_tpu.cli import render as render_cli

    argv0 = sys.argv
    sys.argv = [
        "render", "-m", model_dir, "-s", scene_dir,
        "--iteration", str(ITERS), "--feature_mode", "--feature_npy",
        "-r", "2", "--skip_test",
    ]
    render_cli.main()
    sys.argv = argv0
    print(f"HBM peak after render: {hbm_peak()}", flush=True)
    stage("render_cli_features")

    # relevancy CLI on synthetic text embeddings (512-dim CLIP space)
    rng = np.random.default_rng(7)
    pos = rng.normal(size=(2, CLIP_DIM)).astype(np.float32)
    pos /= np.linalg.norm(pos, axis=1, keepdims=True)
    neg = rng.normal(size=(4, CLIP_DIM)).astype(np.float32)
    neg /= np.linalg.norm(neg, axis=1, keepdims=True)
    te = os.path.join(WORK, "text_embeds.npz")
    np.savez(te, labels=np.array(["obj_a", "obj_b"]), pos=pos, neg=neg)

    from gags_tpu.cli import relevancy as relevancy_cli

    sys.argv = [
        "relevancy", "-m", model_dir, "-s", scene_dir,
        "--iteration", str(ITERS), "--text_embeds", te, "-r", "2",
        "--image_mode",
    ]
    relevancy_cli.main()
    sys.argv = argv0
    print(f"HBM peak after relevancy: {hbm_peak()}", flush=True)
    stage("relevancy_cli")

    total = sum(t for _, t in _stages)
    print("== rehearsal summary ==", flush=True)
    for name, t in _stages:
        print(f"  {name}: {t:.1f}s", flush=True)
    print(f"  total: {total:.1f}s, HBM peak: {hbm_peak()}", flush=True)


if __name__ == "__main__":
    main()
