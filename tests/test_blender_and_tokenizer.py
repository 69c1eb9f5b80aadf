"""Blender (NeRF-synthetic) scene reader + CLIP BPE tokenizer mechanics."""

import gzip
import json
import os

import numpy as np

from gags_tpu.scene.dataset import detect_and_load
from gags_tpu.models.tokenizer import ClipTokenizer, bytes_to_unicode


def _write_blender_fixture(root):
    os.makedirs(root, exist_ok=True)
    frames = []
    for i in range(3):
        ang = 2 * np.pi * i / 3
        c2w = np.eye(4)
        c2w[:3, 3] = [4 * np.cos(ang), 0.0, 4 * np.sin(ang)]
        # simple rotation looking inward (not exact; reader only transforms it)
        frames.append(
            dict(file_path=f"./train/r_{i}", transform_matrix=c2w.tolist())
        )
    meta = dict(camera_angle_x=0.6911, frames=frames)
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(meta, f)


def test_blender_reader(tmp_path):
    root = str(tmp_path / "lego")
    _write_blender_fixture(root)
    info = detect_and_load(root)
    assert len(info.train_cameras) == 3
    cam = info.train_cameras[0]
    assert cam.width == 800 and cam.height == 800  # default when png missing
    assert abs(cam.fovx - 0.6911) < 1e-6
    assert info.radius > 0
    # w2c from the reader must invert the c2w up to the axis flip
    Rt = np.eye(4)
    Rt[:3, :3] = cam.R.T
    Rt[:3, 3] = cam.T
    c2w = np.linalg.inv(Rt)
    np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 4.0, rtol=1e-5)


def _write_bpe_vocab(path):
    """A miniature merges file in the CLIP format (first line is a header)."""
    merges = [
        "#version: tiny",
        "h e",
        "he l",
        "hel l",
        "hell o</w>",
        "w o",
        "wo r",
        "wor l",
        "worl d</w>",
    ]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges) + "\n" * 1)


def test_tokenizer_bpe_merges(tmp_path):
    path = str(tmp_path / "bpe.txt.gz")
    _write_bpe_vocab(path)
    tok = ClipTokenizer(path)
    # "hello" should merge fully into one token, "world" likewise
    ids_hello = tok.encode("hello")
    ids_world = tok.encode("world")
    assert len(ids_hello) == 1
    assert len(ids_world) == 1
    assert tok.decoder[ids_hello[0]] == "hello</w>"
    assert tok.decoder[ids_world[0]] == "world</w>"
    # unmerged word falls back to byte/char-level pieces
    ids_x = tok.encode("xyz")
    assert len(ids_x) >= 2

    batch = tok(["hello world", "hello"])
    assert batch.shape == (2, 77)
    assert batch[0, 0] == tok.sot
    assert batch[0, 3] == tok.eot  # sot hello world eot
    assert batch[1, 2] == tok.eot
    assert (batch[0, 4:] == 0).all()


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
