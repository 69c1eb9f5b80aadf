#!/bin/bash
# Round-4 fifth battery — after the blend op-diet (negated-coefficient
# exponent fold, elementwise-f32 bf16 pipeline with a strict-tri second
# MXU pass), the kernel_relayout/packed_out deletion, the Pallas
# canonical_rows grad_canon, and the chunk-256 candidate. Gates first,
# then a FRESH bench tune (source hash changed), 1080p ladder, the
# train-step grad_canon A/B, the GAS end-to-end leg (now with transient-
# tunnel retries), and a tuned profile to re-attribute the frame.
# ONE TPU client at a time.
set -x
cd /root/repo

timeout 2400 python scripts/tpu_validate.py 2>&1 | grep -v WARNING
timeout 2400 env GAGS_BENCH_RETUNE=1 python bench.py 2>&1 | grep -v WARNING | tail -16
timeout 1200 python scripts/stage_drain.py 32 32 bf16 2>&1 | grep -v WARNING | tail -8
timeout 1200 python scripts/stage_drain.py 32 32 bf16 chunk256 2>&1 | grep -v WARNING | tail -8
timeout 2400 python scripts/bench_1080p.py 2>&1 | grep -v WARNING
timeout 2400 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -4
timeout 2400 env GAGS_GCANON=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -4
timeout 3600 python scripts/gas_bench.py 64 bf16 4 2>&1 | grep -v WARNING | tail -25
timeout 1200 python scripts/infer_profile.py tuned 2>&1 | grep -v WARNING | tail -40
