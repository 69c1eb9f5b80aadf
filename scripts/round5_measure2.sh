#!/bin/bash
# Round-5 battery 2 — train-step levers found after battery 1's profiles,
# then the realistic-scale rehearsal (VERDICT r4 #4).
#  Battery-1 facts this builds on: default 107.0 / FSUP 106.2 ms/step
#  (flat-pixel refactor alone ~neutral); FSUP+bf=2.5 96.2 ms (budget trim
#  is the big lever; valid=363k of 750k budget says there's more);
#  FSUP profile: 3x 1.41 ms {1,0}->{0,1} copies on the (HW,512) GT
#  gathers (GAGS_L1_DOT attacks), ~10 ms of decoder conv fusions
#  (GAGS_DEC_BF16 halves their bytes), 2.1 ms reshape+copy on the flat
#  backward output.
set -x
cd /root/repo

# 1. budget floor: auto-tight (valid+2 chunks = ~365k vs 750k at bf=2.5)
timeout 2400 env GAGS_FSUP=1 GAGS_TRAIN_AUTOB=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -7
# 2. decoder mixed precision
timeout 2400 env GAGS_FSUP=1 GAGS_TRAIN_AUTOB=1 GAGS_DEC_BF16=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -7
# 3. channel-L1 as MXU dot (layout-copy kill)
timeout 2400 env GAGS_FSUP=1 GAGS_TRAIN_AUTOB=1 GAGS_L1_DOT=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -7
# 4. all three
timeout 2400 env GAGS_FSUP=1 GAGS_TRAIN_AUTOB=1 GAGS_DEC_BF16=1 GAGS_L1_DOT=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -7
# 5. profile the best-guess combo for the next ledger
timeout 2400 env GAGS_FSUP=1 GAGS_TRAIN_AUTOB=1 GAGS_DEC_BF16=1 GAGS_L1_DOT=1 python scripts/train_profile.py 2>&1 | grep -v WARNING | tail -40
# 6. SAM encoder profile (VERDICT #3) — battery 1b died right here
timeout 2400 python scripts/sam_profile.py 4 bf16 2>&1 | grep -v WARNING | tail -45
# 7. GAS end-to-end per-image wall-clock, encoder/AMG/NMS/CLIP split (VERDICT #3)
timeout 3600 python scripts/gas_bench.py 64 bf16 4 2>&1 | grep -v WARNING | tail -30
# 8. realistic-scale e2e rehearsal (500 iters, 720p/250k/512-dim, M=300)
timeout 5400 python scripts/e2e_rehearsal.py /tmp/gags_rehearsal 500 2>&1 | grep -v WARNING | tail -40
