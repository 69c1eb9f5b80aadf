#!/bin/bash
# Round-4 eighth battery — re-run of battery-6's casualties + the drains.
# Battery 6 got through tpu_validate (parity OK, untuned 25.8 ms) but:
#   * train_bench / train_profile hit a NEW hardware-only Mosaic failure
#     (memref_slice of the lane-padded (2, G, C) gcol stack at a traced
#     slot index) introduced by the row-major backward — fixed by
#     splitting the double buffer into two predicated refs;
#   * sam_profile died on a transient tunnel broken pipe.
# Then the battery-7 drains: decompose the TUNED 21.0 ms headline frame
# vs the 16.6 ms speed-of-light ledger (permute/kernel/epilogue
# sub-attribution is new in stage_drain.py), plus bin_drain for the
# bin-chain tail items.
set -x
cd /root/repo

timeout 2400 python scripts/tpu_validate.py 2>&1 | grep -v WARNING | tail -14
timeout 2400 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -6
timeout 2400 env GAGS_FASTFWD=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -6
timeout 2400 python scripts/train_profile.py 2>&1 | grep -v WARNING | tail -40
timeout 2400 python scripts/sam_profile.py 4 bf16 2>&1 | grep -v WARNING | tail -45
timeout 2400 python scripts/stage_drain.py 32 32 bf16 chunk256 fkeys bf=2.2 2>&1 | grep -v WARNING
timeout 2400 python scripts/bin_drain.py 2>&1 | grep -v WARNING | tail -25
# apples-to-apples: trained-statistics opacities (early termination live)
timeout 2400 python scripts/trained_scene_bench.py 2>&1 | grep -v WARNING
