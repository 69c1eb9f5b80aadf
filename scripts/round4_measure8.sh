#!/bin/bash
# Round-4 eighth battery — re-run of battery-6's casualties + the drains.
# Battery 6 got through tpu_validate (parity OK, untuned 25.8 ms) but the
# row-major backward tripped Mosaic's minor-dim tiling rule TWICE:
#   * (2, G, C) gcol stack sliced at a traced slot ("dimension 2 ... is
#     16") — fixed by two predicated refs (43e24f4);
#   * the (G, C) window of the (M, C) HBM output itself ("dimension 1 ...
#     is 16") — fixed by emitting into the flat row-major (M*C/128, 128)
#     view (bit-identical bytes, whole-tile windows). The in-kernel
#     (G, C)->(G*C/128, 128) reshape is the remaining Mosaic-risk; leg 2
#     proves the GAGS_BWD_ROWPAD=1 lane-pad fallback in the same visit.
# sam_profile died on a transient tunnel broken pipe — retried here.
# Then the battery-7 drains: decompose the TUNED 21.0 ms headline frame
# vs the 16.6 ms speed-of-light ledger (permute/kernel/epilogue
# sub-attribution is new in stage_drain.py), plus bin_drain for the
# bin-chain tail items, and the trained-statistics scene (early
# termination live) for an apples-to-apples view of the reference's
# interactive-rate regime.
set -x
cd /root/repo

timeout 2400 python scripts/tpu_validate.py 2>&1 | grep -v WARNING | tail -14
timeout 1200 env GAGS_BWD_ROWPAD=1 python scripts/tpu_validate.py 2>&1 | grep -v WARNING | grep "binned colour grad"
timeout 2400 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -6
timeout 2400 env GAGS_FASTFWD=1 python scripts/train_bench.py 2>&1 | grep -v WARNING | tail -6
timeout 2400 python scripts/train_profile.py 2>&1 | grep -v WARNING | tail -40
timeout 2400 python scripts/sam_profile.py 4 bf16 2>&1 | grep -v WARNING | tail -45
# VERDICT #6 (died on tunnel pipes twice; gas_bench retries with backoff)
timeout 3000 python scripts/gas_bench.py 64 bf16 4 2>&1 | grep -v WARNING | tail -30
# VERDICT #7 (died on the dim-1 Mosaic bug at iter 0 — re-run post-fix)
timeout 3600 python scripts/e2e_rehearsal.py /tmp/gags_rehearsal 500 2>&1 | grep -v WARNING | tail -40
timeout 2400 python scripts/stage_drain.py 32 32 bf16 chunk256 fkeys bf=2.2 2>&1 | grep -v WARNING
timeout 2400 python scripts/bin_drain.py 2>&1 | grep -v WARNING | tail -25
# apples-to-apples: trained-statistics opacities (early termination live)
timeout 2400 python scripts/trained_scene_bench.py 2>&1 | grep -v WARNING
timeout 2400 python bench.py 2>&1 | grep -v WARNING | tail -16
