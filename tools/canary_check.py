#!/usr/bin/env python3
"""Scale-canary check: compare a canary bench summary (N x replicated
corpus, see graft.examples.CanaryGen) against the base-SF summary and
emit CANARY_sf1.json with per-query ratios.

Pass criteria: failed == [] on the canary run, no query slower than
its allowance, no VACUOUS query, and no declared-quadratic query whose
output deviates from its analytic growth model.

Allowance: ratio_max (default 10, the replication factor) asserts
~linear cost in the INPUT for every query EXCEPT the two CanaryGen
deliberately makes output-quadratic (same-sky cross-match replicas,
sim_approx_join at threshold 0.4): any join's work is Omega(output),
so those are gated against the DECLARED growth model reps^2 instead.
The model is declared HERE, mirroring CanaryGen's documented
semantics -- NOT taken from the canary run's own measured rows: an
allowance derived from measured output would let a regression that
inflates both runtime and rows (e.g. a broken exactly-once emitting
duplicate pairs) raise its own allowance and self-certify. Instead the
measured rows are cross-checked AGAINST the model: a declared-quadratic
query must land in [ratio_max/2, 1.5 * ratio_max^2] x base rows --
duplicate-emission (>= 2x model) and collapse (sub-linear) both fail.

Vacuity: a query that returns rows on the base corpus must return rows
on the canary too -- a source that silently matches zero files looks
fast, and only the row count exposes it (the r7 canary streamed zero
events without failing). Applied to EVERY query with row counts, even
one with no usable base timing.

Coverage: queries skipped from the timing comparison (missing or
negative base time -- a query newly added since the base summary, or
one that failed on base) are listed in "queries_uncompared" instead of
silently vanishing from the report.

Usage: canary_check.py <canary_summary.json> <base_summary.json> [out] [ratio_max]

ratio_max defaults to 10 (the 10x replication factor); pass the
replication factor of the corpus under test (e.g. 100 for a 100x run).
"""
import json
import sys

BASE_FLOOR_S = 0.5  # fixed per-query overhead floor for tiny baselines

# Queries whose OUTPUT grows ~reps^2 by CanaryGen's design (replicas
# overlay the same sky / the cosine-0.4 pair graph spans replicas).
# Declared growth model: rows scale ~ratio_max^2, so time is allowed
# to as well. Everything else must stay ~linear -- no escape hatch.
QUADRATIC_OUTPUT = {"q26_crossmatch", "sim_approx_join"}
MODEL_SLACK_HIGH = 1.5  # measured rows above 1.5x model => anomalous
MODEL_SLACK_LOW = 0.5   # below 0.5x linear growth => anomalous


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
    anomalous = []
    uncompared = []
    base_rows = base.get("rows", {})
    canary_rows = canary.get("rows", {})
    for name, ct in sorted(canary["queries"].items()):
        br, cr = base_rows.get(name), canary_rows.get(name)
        # vacuity + growth-model checks run on row counts alone, so a
        # query with no usable base timing is still row-gated
        if br is not None and cr is not None:
            if br > 0 and cr == 0:
                vacuous.append(name)
            if name in QUADRATIC_OUTPUT and br > 0:
                growth = cr / br
                if (growth > MODEL_SLACK_HIGH * ratio_max * ratio_max
                        or growth < MODEL_SLACK_LOW * ratio_max):
                    anomalous.append(name)
        bt = base["queries"].get(name)
        if bt is None or bt < 0 or ct < 0:
            uncompared.append(name)
            continue
        ratio = ct / max(bt, BASE_FLOOR_S)
        ratios[name] = {"base_s": round(bt, 3), "canary_s": round(ct, 3),
                        "ratio": round(ratio, 2)}
        if br is not None and cr is not None:
            ratios[name]["base_rows"] = br
            ratios[name]["canary_rows"] = cr
        # DECLARED model, not measured rows: quadratic-output queries
        # get ratio_max^2, everything else must scale ~linearly
        allowance = ratio_max
        if name in QUADRATIC_OUTPUT:
            allowance = ratio_max * ratio_max
            ratios[name]["allowed_ratio"] = round(allowance, 2)
        if ratio > allowance:
            slow.append(name)

    # A key present in the base summary but absent from the canary run
    # entirely (dropped from the registry, truncated summary) would
    # otherwise never be compared and never listed -- a silently
    # vanished key must FAIL the gate, not evade it.
    vanished = sorted(set(base["queries"]) - set(canary["queries"]))

    result = {
        "canary_sf": canary.get("sf"),
        "base_sf": base.get("sf"),
        "failed": canary.get("failed", []),
        "total_base_s": round(base.get("value", -1), 1),
        "total_canary_s": round(canary.get("value", -1), 1),
        "ratio_max_allowed": ratio_max,
        "queries_over_ratio": slow,
        "queries_vacuous": vacuous,
        "queries_output_anomalous": anomalous,
        "queries_uncompared": uncompared,
        "queries_missing_from_canary": vanished,
        "ok": (not canary.get("failed") and not slow and not vacuous
               and not anomalous and not vanished),
        "queries": ratios,
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"canary: {len(ratios)} compared, failed={result['failed']}, "
          f"over-ratio={slow}, vacuous={vacuous}, anomalous={anomalous}, "
          f"uncompared={uncompared}, missing={vanished}, ok={result['ok']}")
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
