#!/bin/bash
# Round-4 sixth battery — after the row-major (M, C) backward output
# (conversion-free grad rows for the reduction gather; grad_canon
# deleted). Gate first, then the train-step before/after (battery-5
# base = 104.4 ms), a fast_fwd_aligned re-A/B on the dieted kernel, a
# profile to confirm fusion.9 is gone, the SAM encoder attribution, and
# a fresh headline (source hash changed -> full retune).
set -x
cd /root/repo

timeout 2400 python scripts/tpu_validate.py 2>&1 | grep -v WARNING
timeout 2400 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -4
timeout 2400 env GAGS_FASTFWD=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -4
timeout 2400 python scripts/train_profile.py 2>&1 | grep -v WARNING | tail -40
timeout 2400 python scripts/sam_profile.py 4 bf16 2>&1 | grep -v WARNING | tail -45
# VERDICT #6: full AMG+CLIP per-image wall-clock (died twice on tunnel
# broken pipes; gas_bench now retries with backoff).
timeout 3000 python scripts/gas_bench.py 64 bf16 4 2>&1 | grep -v WARNING | tail -30
# VERDICT #7: realistic-scale synthetic e2e rehearsal (720p/250k/512-d,
# GAS npy -> 500 GAD iters -> render/evaluate/relevancy CLIs).
timeout 3600 python scripts/e2e_rehearsal.py /tmp/gags_rehearsal 500 2>&1 | grep -v WARNING | tail -40
timeout 2400 python bench.py 2>&1 | grep -v WARNING | tail -16
