#!/bin/bash
# Round-5 battery 5 — the GAS leg alone, maximum window. Five batteries
# have lost this leg to tunnel broken-pipes mid-compile-chain; the
# persistent cache now holds most of its compiles (96+ MB), the re-exec
# resumes from it, and nothing else competes for the host core.
set -x
cd /root/repo

# encoder-only profile first (pays/replays the ViT-H compiles, gives the
# per-op table even if AMG later dies)
timeout 3600 python scripts/sam_profile.py 4 bf16 2>&1 | grep -v WARNING | tail -45
# full AMG + CLIP pipeline, 2 images (VERDICT #3: per-image wall-clock
# with encoder/decode/filter/crops+clip split)
timeout 7200 python scripts/gas_bench.py 64 bf16 2 2>&1 | grep -v WARNING | tail -30
