"""COLMAP SfM driver — counterpart of the reference `convert.py`.

Runs feature extraction → exhaustive matching → mapping → undistortion via
the external `colmap` binary (subprocess, not os.system), with optional
downscaled image pyramids (PIL instead of ImageMagick).

  python -m gags_tpu.cli.convert -s <dir with input/ images> [--no_gpu]
      [--resize] [--camera OPENCV] [--colmap_executable colmap]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess


def run(cmd):
    print("+", " ".join(cmd))
    res = subprocess.run(cmd)
    if res.returncode != 0:
        raise SystemExit(f"command failed ({res.returncode}): {' '.join(cmd)}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--source_path", required=True)
    p.add_argument("--camera", default="OPENCV")
    p.add_argument("--colmap_executable", default="colmap")
    p.add_argument("--no_gpu", action="store_true")
    p.add_argument("--skip_matching", action="store_true")
    p.add_argument("--resize", action="store_true")
    args = p.parse_args()

    src = args.source_path
    colmap = args.colmap_executable
    gpu = "0" if args.no_gpu else "1"

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        run([
            colmap, "feature_extractor",
            "--database_path", f"{src}/distorted/database.db",
            "--image_path", f"{src}/input",
            "--ImageReader.single_camera", "1",
            "--ImageReader.camera_model", args.camera,
            "--SiftExtraction.use_gpu", gpu,
        ])
        run([
            colmap, "exhaustive_matcher",
            "--database_path", f"{src}/distorted/database.db",
            "--SiftMatching.use_gpu", gpu,
        ])
        run([
            colmap, "mapper",
            "--database_path", f"{src}/distorted/database.db",
            "--image_path", f"{src}/input",
            "--output_path", f"{src}/distorted/sparse",
            "--Mapper.ba_global_function_tolerance=0.000001",
        ])

    run([
        colmap, "image_undistorter",
        "--image_path", f"{src}/input",
        "--input_path", f"{src}/distorted/sparse/0",
        "--output_path", src,
        "--output_type", "COLMAP",
    ])
    # move sparse files into sparse/0 (reference convert.py:77-88)
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f == "0":
            continue
        shutil.move(os.path.join(sparse, f), os.path.join(sparse, "0", f))

    if args.resize:
        from PIL import Image

        for div in (2, 4, 8):
            out_dir = os.path.join(src, f"images_{div}")
            os.makedirs(out_dir, exist_ok=True)
            for name in os.listdir(os.path.join(src, "images")):
                img = Image.open(os.path.join(src, "images", name))
                img.resize((img.width // div, img.height // div), Image.LANCZOS).save(
                    os.path.join(out_dir, name)
                )
    print("done.")


if __name__ == "__main__":
    main()
