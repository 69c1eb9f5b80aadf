#!/bin/bash
# Round-4 fourth battery — after the candidate deletion + Pallas
# grad_canon landed: re-gate the kernels, A/B the Pallas canonical-copy
# grad_canon (the identity-dot variant measured FLAT — XLA propagated
# the gather's lane-major layout backward through it), profile it, and
# re-record the headline with the new source hash (tune cache re-keys).
set -x
cd /root/repo

timeout 2400 python scripts/tpu_validate.py 2>&1 | grep -v WARNING
timeout 2400 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -4
timeout 2400 env GAGS_GCANON=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -4
timeout 2400 env GAGS_GCANON=1 python scripts/train_profile.py 2>&1 | grep -v WARNING | tail -40
timeout 1800 python bench.py 2>&1 | grep -v WARNING | tail -12
