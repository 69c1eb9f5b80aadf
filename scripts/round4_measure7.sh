#!/bin/bash
# Round-4 seventh battery — decompose the TUNED headline frame.
# Battery 5 left 21.0 ms (32x32, bf16, fused_keys, chunk 256, bf=2.2)
# vs the 16.6 ms speed-of-light ledger: this drain assigns owners to
# the ~4.4 ms gap (permutes vs kernel vs epilogue sub-attribution is
# new in stage_drain.py), plus the same at the 1080p tune (bf=2.7,
# chw) for VERDICT #4's next lever.
set -x
cd /root/repo

timeout 2400 python scripts/stage_drain.py 32 32 bf16 chunk256 fkeys bf=2.2 2>&1 | grep -v WARNING
timeout 2400 python scripts/bin_drain.py 2>&1 | grep -v WARNING | tail -25
