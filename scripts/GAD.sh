#!/bin/bash
# GAD distillation driver — counterpart of the reference GAD.sh:
# trains 16-dim semantic features + decoders from language_features/.
set -e

SCENE=$1
MODEL=$2          # output model dir
PLY=$3            # pretrained RGB 3DGS point_cloud.ply
ITERS=${4:-30000}

python -m gags_tpu.cli.train_gad -s "$SCENE" -m "$MODEL" --ply "$PLY" \
    -r 2 --iterations "$ITERS"
