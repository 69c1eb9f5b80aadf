#!/bin/bash
# GAS pipeline driver — counterpart of the reference GAS.sh:
#   stage A: render RGB + expected depth for every training view
#   stage B: per-image min-depth samples from the Gaussian cloud
#   stage C: depth-adaptive SAM masks + CLIP embeddings → language_features/
set -e

SCENE=$1          # dataset dir (COLMAP layout)
MODEL=$2          # pretrained RGB 3DGS model dir (point_cloud/iteration_N)
ITER=${3:-30000}
SAM_CKPT=${SAM_CKPT:-ckpts/sam_vit_h_4b8939.pth}
CLIP_CKPT=${CLIP_CKPT:-ckpts/open_clip_vit_b16.pt}

python -m gags_tpu.cli.render -m "$MODEL" -s "$SCENE" --iteration "$ITER" \
    --render_mode RGB+ED --skip_test

python -m gags_tpu.cli.depth_sample -s "$SCENE" -m "$MODEL" --iteration "$ITER"

python -m gags_tpu.cli.gas -s "$SCENE" -m "$MODEL" --iteration "$ITER" \
    --sam_ckpt "$SAM_CKPT" --clip_ckpt "$CLIP_CKPT"
