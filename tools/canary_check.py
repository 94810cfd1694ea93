#!/usr/bin/env python3
"""Scale-canary check: compare a canary bench summary (N x replicated
corpus, see graft.examples.CanaryGen) against the base-SF summary and
emit CANARY_sf1.json with per-query ratios.

Pass criteria: failed == [] on the canary run, and no query slower than
RATIO_MAX x its base time (default 10, the replication factor -- linear
scaling; sub-second base times are floored to avoid fixed-overhead
noise dominating the ratio).

Usage: canary_check.py <canary_summary.json> <base_summary.json> [out]
"""
import json
import sys

RATIO_MAX = 10.0
BASE_FLOOR_S = 0.5  # fixed per-query overhead floor for tiny baselines


def main() -> int:
    canary_path, base_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "CANARY_sf1.json"
    with open(canary_path) as f:
        canary = json.load(f)
    with open(base_path) as f:
        base = json.load(f)

    ratios = {}
    slow = []
    for name, ct in sorted(canary["queries"].items()):
        bt = base["queries"].get(name)
        if bt is None or bt < 0 or ct < 0:
            continue
        ratio = ct / max(bt, BASE_FLOOR_S)
        ratios[name] = {"base_s": round(bt, 3), "canary_s": round(ct, 3),
                        "ratio": round(ratio, 2)}
        if ratio > RATIO_MAX:
            slow.append(name)

    result = {
        "canary_sf": canary.get("sf"),
        "base_sf": base.get("sf"),
        "failed": canary.get("failed", []),
        "total_base_s": round(base.get("value", -1), 1),
        "total_canary_s": round(canary.get("value", -1), 1),
        "ratio_max_allowed": RATIO_MAX,
        "queries_over_ratio": slow,
        "ok": not canary.get("failed") and not slow,
        "queries": ratios,
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"canary: {len(ratios)} compared, failed={result['failed']}, "
          f"over-ratio={slow}, ok={result['ok']}")
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
