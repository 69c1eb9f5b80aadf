#!/bin/bash
# Serialized round-3/4 measurement battery — ONE TPU client at a time.
#
# Ordering principle: correctness gate first, then the HEADLINE BENCH
# immediately (a number on record beats a perfect number never taken —
# the tunnel has died mid-session before), then the decision sweeps,
# then the secondary benches. Every leg is timeout-bounded so one hung
# leg (dead tunnel hangs native device discovery >7 min) cannot starve
# the rest; legs are independent (set -e NOT used).
set -x
cd /root/repo

# 1) correctness gates (on-device bit-exactness of kernel variants,
#    precision-pin audit — the ONLY place these can be caught)
timeout 2400 python scripts/tpu_validate.py 2>&1 | grep -v WARNING

# 2) headline bench (self-tunes {fkeys, chunk, chw, soa, shapes}
#    with parity guards; prints chosen flags on stderr)
timeout 2400 python bench.py
timeout 1800 env GAGS_T16=1 python bench.py

# 3) layout/microarch probes that decide follow-up engineering
timeout 1800 python scripts/layout_probe.py 2>&1 | grep -v WARNING
timeout 1200 python scripts/slab_probe.py 2>&1 | grep -v WARNING
timeout 2400 python scripts/bf16_sweep.py 2>&1 | grep -v WARNING

# 4) stage-level attribution for the winning pipeline
timeout 1200 python scripts/stage_drain.py 2>&1 | grep -v WARNING
timeout 1200 python scripts/stage_drain.py 32 32 bf16 2>&1 | grep -v WARNING
timeout 1200 python scripts/stage_drain.py 32 32 bf16 fkeys 2>&1 | grep -v WARNING
timeout 1200 python scripts/stage_drain.py 32 32 bf16 fkeys chunk256 2>&1 | grep -v WARNING
timeout 1200 python scripts/stage_drain.py 32 32 bf16 fkeys chw 2>&1 | grep -v WARNING
timeout 1200 python scripts/stage_drain.py 32 32 bf16 fkeys chw soa 2>&1 | grep -v WARNING
timeout 1200 python scripts/bin_drain.py 2>&1 | grep -v WARNING

# 5) secondary benches
timeout 2400 python scripts/bench_1080p.py 2>&1 | grep -v WARNING
timeout 1800 python scripts/sam_bench.py 1 2>&1 | grep -v WARNING | tail -3
timeout 1800 python scripts/sam_bench.py 4 bf16 2>&1 | grep -v WARNING | tail -3
timeout 1800 python scripts/sam_bench.py 8 bf16 2>&1 | grep -v WARNING | tail -3
timeout 2400 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -5
timeout 2400 env GAGS_FASTFWD=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -5
timeout 2400 env GAGS_FASTFWD=1 GAGS_FSUP=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -5
timeout 2400 python scripts/train_profile.py 2>&1 | grep -v WARNING | tail -30
