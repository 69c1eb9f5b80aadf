#!/bin/bash
# Open-vocabulary eval driver — counterpart of the reference eval.sh:
# renders features, evaluates IoU + localization against labelme GT.
set -e

SCENE=$1
MODEL=$2
GT_JSON=$3        # folder of frame_*.json labelme annotations
ITER=${4:-30000}
EMBEDS=${EMBEDS:-embeds.npz}   # from gags_tpu.cli.encode_text

python -m gags_tpu.cli.evaluate -m "$MODEL" -s "$SCENE" --gt_json "$GT_JSON" \
    --iteration "$ITER" --mask_thresh 0.4 --text_embeds "$EMBEDS"
