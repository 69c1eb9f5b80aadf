#!/bin/bash
# Round-4 third battery — A/B the two profile-driven train-step stagings
# (grad_canon: kills the 17.5 ms strided reduction gather; flat-(HW,D)
# fused supervision: kills the 3-D layout copies/converts), re-run the
# GAS end-to-end leg that died on a tunnel broken-pipe in battery 2, and
# re-record the headline. ONE TPU client at a time; legs independent.
set -x
cd /root/repo

timeout 2400 python scripts/tpu_validate.py 2>&1 | grep -v WARNING
timeout 2400 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -4
timeout 2400 env GAGS_GCANON=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -4
timeout 2400 env GAGS_FSUP=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -4
timeout 2400 env GAGS_GCANON=1 GAGS_FSUP=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -4
timeout 3600 python scripts/gas_bench.py 64 bf16 4 2>&1 | grep -v WARNING | tail -25
timeout 1200 python scripts/infer_profile.py tuned 2>&1 | grep -v WARNING | tail -60
timeout 2400 python scripts/tile16_sweep.py 2>&1 | grep -v WARNING
timeout 1800 python scripts/hbm_report.py 2>&1 | grep -v WARNING
timeout 1800 python bench.py 2>&1 | grep -v WARNING | tail -12
timeout 1200 python scripts/slab_probe.py 2>&1 | grep -v WARNING
