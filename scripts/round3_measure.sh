#!/bin/bash
# Serialized round-3 measurement battery — ONE TPU client at a time.
# Order: correctness gates first, then the decision sweeps, then benches.
set -x
cd /root/repo
python scripts/tpu_validate.py 2>&1 | grep -v WARNING
python scripts/layout_probe.py 2>&1 | grep -v WARNING
python scripts/slab_probe.py 2>&1 | grep -v WARNING
python scripts/bf16_sweep.py 2>&1 | grep -v WARNING
# bench.py self-tunes {kernel_relayout, fused_keys} with parity guards and
# prints the chosen flags on stderr; the T16 leg still needs the env A/B
python bench.py 2>&1 | grep -v WARNING
GAGS_T16=1 python bench.py 2>&1 | grep -v WARNING
python scripts/stage_drain.py 2>&1 | grep -v WARNING
python scripts/stage_drain.py 32 32 bf16 2>&1 | grep -v WARNING
python scripts/stage_drain.py 32 32 bf16 krel fkeys 2>&1 | grep -v WARNING
python scripts/stage_drain.py 32 32 bf16 krel fkeys packed 2>&1 | grep -v WARNING
python scripts/stage_drain.py 32 32 bf16 krel fkeys packed chw 2>&1 | grep -v WARNING
python scripts/stage_drain.py 32 32 bf16 krel fkeys packed chw soa 2>&1 | grep -v WARNING
python scripts/bin_drain.py 2>&1 | grep -v WARNING
python scripts/bench_1080p.py 2>&1 | grep -v WARNING
python scripts/sam_bench.py 1 2>&1 | grep -v WARNING | tail -3
python scripts/sam_bench.py 4 bf16 2>&1 | grep -v WARNING | tail -3
python scripts/sam_bench.py 8 bf16 2>&1 | grep -v WARNING | tail -3
python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -5
GAGS_FASTFWD=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -5
python scripts/train_profile.py 2>&1 | grep -v WARNING | tail -30
