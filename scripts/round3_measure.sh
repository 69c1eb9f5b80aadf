#!/bin/bash
# Serialized round-3 measurement battery — ONE TPU client at a time.
set -x
cd /root/repo
python bench.py 2>&1 | grep -v WARNING
python scripts/stage_drain.py 2>&1 | grep -v WARNING
python scripts/bench_1080p.py 2>&1 | grep -v WARNING
python scripts/tpu_validate.py 2>&1 | grep -v WARNING
python scripts/sam_bench.py 1 2>&1 | grep -v WARNING | tail -3
python scripts/sam_bench.py 4 bf16 2>&1 | grep -v WARNING | tail -3
