#!/usr/bin/env python3
"""Scale-canary check: compare a canary bench summary (N x replicated
corpus, see graft.examples.CanaryGen) against the base-SF summary and
emit CANARY_sf1.json with per-query ratios.

Pass criteria: failed == [] on the canary run, no query slower than
its allowance, and no VACUOUS query.

Allowance: max(ratio_max, output growth). ratio_max (default 10, the
replication factor) asserts ~linear cost in the INPUT; but a query
whose OUTPUT genuinely outgrows the input (sim_approx_join at
threshold 0.4 on Gaussian embeddings, same-sky cross-match replicas)
cannot scale linearly in time -- any join's work is Omega(output) --
so for those the gate becomes "time grows no faster than the answer".
A query with linear output gets no slack from this. Sub-second base
times are floored to avoid fixed-overhead noise dominating the ratio.

Vacuity: when both summaries carry a "rows" map, a query that returns
rows on the base corpus must return rows on the canary too -- a source
that silently matches zero files looks fast, and only the row count
exposes it (the r7 canary streamed zero events without failing).

Usage: canary_check.py <canary_summary.json> <base_summary.json> [out] [ratio_max]

ratio_max defaults to 10 (the 10x replication factor); pass the
replication factor of the corpus under test (e.g. 100 for a 100x run).
"""
import json
import sys

BASE_FLOOR_S = 0.5  # fixed per-query overhead floor for tiny baselines


def main() -> int:
    canary_path, base_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "CANARY_sf1.json"
    ratio_max = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
    with open(canary_path) as f:
        canary = json.load(f)
    with open(base_path) as f:
        base = json.load(f)

    ratios = {}
    slow = []
    vacuous = []
    base_rows = base.get("rows", {})
    canary_rows = canary.get("rows", {})
    for name, ct in sorted(canary["queries"].items()):
        bt = base["queries"].get(name)
        if bt is None or bt < 0 or ct < 0:
            continue
        ratio = ct / max(bt, BASE_FLOOR_S)
        ratios[name] = {"base_s": round(bt, 3), "canary_s": round(ct, 3),
                        "ratio": round(ratio, 2)}
        allowance = ratio_max
        br, cr = base_rows.get(name), canary_rows.get(name)
        if br is not None and cr is not None:
            ratios[name]["base_rows"] = br
            ratios[name]["canary_rows"] = cr
            if br > 0 and cr == 0:
                vacuous.append(name)
            if br > 0 and cr / br > allowance:
                # superlinear OUTPUT: gate on it instead -- capped at
                # ratio_max^2 (pairwise output can't legitimately outgrow
                # the input squared, and an uncapped allowance taken from
                # the canary's own rows would let a duplicate-emitting
                # regression self-certify; exactly-once invariants are
                # additionally spec-gated engine-side)
                allowance = min(cr / br, ratio_max * ratio_max)
                ratios[name]["allowed_ratio"] = round(allowance, 2)
        if ratio > allowance:
            slow.append(name)

    result = {
        "canary_sf": canary.get("sf"),
        "base_sf": base.get("sf"),
        "failed": canary.get("failed", []),
        "total_base_s": round(base.get("value", -1), 1),
        "total_canary_s": round(canary.get("value", -1), 1),
        "ratio_max_allowed": ratio_max,
        "queries_over_ratio": slow,
        "queries_vacuous": vacuous,
        "ok": not canary.get("failed") and not slow and not vacuous,
        "queries": ratios,
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"canary: {len(ratios)} compared, failed={result['failed']}, "
          f"over-ratio={slow}, vacuous={vacuous}, ok={result['ok']}")
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
