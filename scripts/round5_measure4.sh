#!/bin/bash
# Round-5 battery 4 — CORRECTED exit counters (battery-3's chunk-stop
# numbers came from the unpermuted-table probe bug; the real kernel
# sheds 48.7% of surface-scene chunks at 32x32 on CPU), the tile_cull
# surface variant, the 16x16 exit-granularity A/B, a clean solo
# sam_profile, and a full bench.py rehearsal of the new trained-scene
# headline leg.
set -x
cd /root/repo

# 1. surface legs with REAL counters + exit+cull variant (fog fracs trimmed)
timeout 3600 python scripts/trained_scene_bench.py 0.0 2>&1 | grep -v WARNING | tail -20
# 2. 16x16 tiles on the surface legs: 4x finer tile-exit granularity
GAGS_TSB_TILE=16x16 timeout 3600 python scripts/trained_scene_bench.py 0.0 2>&1 | grep -v WARNING | tail -20
# 3. bench.py end-to-end (fog tune cached; surface leg pays its compiles
#    into the persistent cache so the driver's round-end run is warm)
timeout 3600 python bench.py 2>&1 | tail -12
# 4. SAM encoder profile — SOLO, nothing else on the host core
timeout 3000 python scripts/sam_profile.py 4 bf16 2>&1 | grep -v WARNING | tail -45
