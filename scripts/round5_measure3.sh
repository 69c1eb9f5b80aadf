#!/bin/bash
# Round-5 battery 3 — the trained-scene (saturating) workload + the two
# legs the tunnel has eaten three times (SAM/GAS), now with the
# persistent compile cache so a broken-pipe re-exec resumes instead of
# re-paying every remote compile.
#  Battery-2 facts this builds on: FSUP+AUTOB 81.1 ms/step,
#  +DEC_BF16 70.5 ms (both beat the <=85 ask); L1_DOT flat; fog-scene
#  trained-like legs measured chunk-stop 0.0% (fog can't saturate) —
#  the surface legs below are the real early-termination workload.
set -x
cd /root/repo

# 1. trained-scene bench: fog sweep + SURFACE legs with block_exit A/B
#    (VERDICT r4 #7 — the headline-vs-100FPS debate's missing data)
timeout 3600 python scripts/trained_scene_bench.py 2>&1 | grep -v WARNING | tail -25
# 2. 1080p/1M: trained + surface legs (VERDICT r4 #5)
timeout 3600 python scripts/bench_1080p.py trained surface 2>&1 | grep -v WARNING | tail -20
# 3. SAM encoder profile (VERDICT #3) — died to tunnel in b1b and b2
timeout 3000 python scripts/sam_profile.py 4 bf16 2>&1 | grep -v WARNING | tail -45
# 4. GAS end-to-end per-image wall-clock (VERDICT #3) — 2 images keeps
#    it inside the window even on a cold cache; warm cache from leg 3
timeout 5400 python scripts/gas_bench.py 64 bf16 2 2>&1 | grep -v WARNING | tail -30
