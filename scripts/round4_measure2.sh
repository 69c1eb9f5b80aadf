#!/bin/bash
# Round-4 second battery — the legs the first battery left unresolved,
# ordered by VERDICT value so a wall-clock cut still lands the big ones:
#   1. 1080p/1M with fractional budgets + fused_keys (VERDICT #4)
#   2. train_profile with enough lines to account the full step (#5)
#   3. GAS end-to-end per-image pipeline (#6)
#   4. realistic-scale e2e rehearsal (#7)
#   5. diagnostics: tuned-frame HLO profile, bin_drain on the no-cull
#      base (first run timed the cull kernel inside the "fused" leg),
#      slab_probe bf16 (first run hit the packed-bf16 cmpf Mosaic bug)
# ONE TPU client at a time; every leg timeout-bounded; legs independent.
set -x
cd /root/repo

timeout 2400 python scripts/bench_1080p.py 2>&1 | grep -v WARNING
timeout 2400 python scripts/train_profile.py 2>&1 | grep -v WARNING | tail -100
timeout 3600 python scripts/gas_bench.py 64 bf16 4 2>&1 | grep -v WARNING | tail -25
timeout 5400 python scripts/e2e_rehearsal.py /tmp/gags_rehearsal 500 2>&1 | grep -v WARNING | tail -40
timeout 1200 python scripts/infer_profile.py tuned 2>&1 | grep -v WARNING | tail -60
timeout 1200 python scripts/bin_drain.py 2>&1 | grep -v WARNING
timeout 1200 python scripts/slab_probe.py 2>&1 | grep -v WARNING
