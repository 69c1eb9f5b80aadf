#!/bin/bash
# Round-5 battery 1 RESUME — the session hosting round5_measure1.sh died
# after the ROWPAD tpu_validate leg; kernel_sweep (all PASS) and
# tpu_validate (flat backward rel err 0.0) are recorded in
# measure_r5_hw1.log. This picks up at train_bench and finishes the
# original plan (VERDICT r4 items #1, #4, #5, #6, #7, #3 in that order).
set -x
cd /root/repo

timeout 2400 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -6
# fused supervision + flat-pixel decode (new this round: the whole loss
# tail runs on (HW, D) 2-D arrays — no 3-D layout copies); A/B vs default
timeout 2400 env GAGS_FSUP=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -6
# training instance-budget trim: every M-length stream (backward chunks,
# u16 grad-table build, reduction gather) scales with it; needs 0 overflow
timeout 2400 env GAGS_FSUP=1 GAGS_TRAIN_BF=2.5 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -6
timeout 2400 python scripts/train_profile.py 2>&1 | grep -v WARNING | tail -40
timeout 2400 env GAGS_FSUP=1 python scripts/train_profile.py 2>&1 | grep -v WARNING | tail -40
timeout 3600 env GAGS_BENCH_RETUNE=1 python bench.py 2>&1 | grep -v WARNING
timeout 2400 python scripts/stage_drain.py tuned 2>&1 | grep -v WARNING
timeout 3600 python scripts/bench_1080p.py 2>&1 | grep -v WARNING
timeout 2400 python scripts/trained_scene_bench.py 2>&1 | grep -v WARNING
timeout 2400 python scripts/sam_profile.py 4 bf16 2>&1 | grep -v WARNING | tail -45
timeout 3600 python scripts/gas_bench.py 64 bf16 4 2>&1 | grep -v WARNING | tail -40
