"""Re-key persisted tune-cache records to the CURRENT splat fingerprint.

The winner caches (.gags_bench_tune.json, .gags_tune_cache.json) embed a
hash of gags_tpu/splat/*.py so stale winners are never trusted after a
kernel change. Edits that do NOT change kernel semantics for the cached
shapes (candidate-list trims, comments, assert relaxations) still rotate
the hash and would force a ~25-min retune; this tool re-keys the records
instead. Only run it when the edit is provably behavior-preserving for
the cached shapes — after a REAL kernel change, retune.

Usage: python scripts/rekey_tune_cache.py
"""
import glob
import hashlib
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fingerprint(trunc=None):
    h = hashlib.sha256()
    for path in sorted(glob.glob(os.path.join(ROOT, "gags_tpu/splat/*.py"))):
        with open(path, "rb") as f:
            h.update(f.read())
    d = h.hexdigest()
    return d[:trunc] if trunc else d


def rekey(path, pattern, new_fp):
    if not os.path.exists(path):
        print(f"{path}: absent")
        return
    with open(path) as f:
        store = json.load(f)
    out, changed = {}, 0
    for k, v in store.items():
        nk = re.sub(pattern, new_fp, k)
        if nk != k:
            changed += 1
        out[nk] = v
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{path}: {changed} key(s) re-keyed")


# bench.py: single record {"key": {..., "splat": <16-hex>}, "config": {...}}
bench_path = os.path.join(ROOT, ".gags_bench_tune.json")
if os.path.exists(bench_path):
    with open(bench_path) as f:
        rec = json.load(f)
    if isinstance(rec.get("key"), dict) and "splat" in rec["key"]:
        old = rec["key"]["splat"]
        rec["key"]["splat"] = fingerprint(len(old))
        with open(bench_path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"{bench_path}: splat {old} -> {rec['key']['splat']}")
else:
    print(f"{bench_path}: absent")

# autotune.py store keys: "WxH_nN_cC_<backend>_<16-hex>" suffix
rekey(
    os.path.join(ROOT, ".gags_tune_cache.json"),
    r"[0-9a-f]{16}$",
    fingerprint(16),
)
