#!/bin/bash
# Round-5 first battery — the VERDICT r4 list, in dependency order.
#  1. kernel_sweep: NEW hardware compile gate over every Pallas kernel x
#     flag combination the CLIs can reach (r4 hit four Mosaic failures
#     that only manifest on-device; tpu_validate alone missed them).
#  2. tpu_validate both backward layouts: the flat view is now packed by
#     exact selection matmuls (_flat_pack) instead of the Mosaic-rejected
#     value reshape; ROWPAD stays the explicit fallback.
#  3. train_bench + train_profile: flat default should delete the 960 us
#     broadcast_in_dim f32[1230720,128] (the rowpad alias donor) and the
#     ~8x cotangent chunk-matmul flops (~-2 ms/step target).
#  4. fresh retune + median-of-3 k=60 headline with printed spread
#     (VERDICT #1a), then stage_drain 'tuned' re-derives the
#     speed-of-light ledger at the SHIPPED config (VERDICT #1b).
#  5. bench_1080p: tile-shape pair-count attack + trained-stats legs
#     (VERDICT #5, #7).
#  6. trained_scene_bench: saturating-opacity headline counterpart.
#  7. sam_profile + gas_bench: GAS hardware numbers with the fresh-process
#     re-exec retry (VERDICT #3; two r4 batteries died on tunnel pipes).
set -x
cd /root/repo

timeout 3600 python scripts/kernel_sweep.py 2>&1 | grep -v WARNING
timeout 2400 python scripts/tpu_validate.py 2>&1 | grep -v WARNING | tail -14
timeout 1500 env GAGS_BWD_ROWPAD=1 python scripts/tpu_validate.py 2>&1 | grep -v WARNING | grep "binned colour grad"
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
