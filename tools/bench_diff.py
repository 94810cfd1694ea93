#!/usr/bin/env python3
"""Per-key diff of two bench records (BENCH_HISTORY.jsonl lines,
BENCH_SUMMARY.json files, or any file holding one bench JSON object).

Selects records by run label or file path and prints keys whose time
moved more than a threshold, plus added/removed keys — the
round-over-round regression view the r12 verdict asked for.

Usage:
  bench_diff.py <old> <new> [min_ratio] [min_abs_s]
    <old>/<new>: a path to a JSON file, OR a run label looked up in
    BENCH_HISTORY.jsonl (latest record with that label wins).
  min_ratio  — report keys with new/old outside [1/r, r] (default 1.5)
  min_abs_s  — ignore moves smaller than this many seconds (default 0.3)
"""
import json
import os
import sys


def load(spec):
    if os.path.exists(spec):
        with open(spec) as f:
            if spec.endswith(".jsonl"):
                sys.exit(f"{spec} is a history file - pass a run label "
                         "from it, or a single-record JSON file")
            try:
                return json.load(f)
            except json.JSONDecodeError as e:
                sys.exit(f"{spec}: not a single JSON record ({e})")
    # run label in history
    if not os.path.exists("BENCH_HISTORY.jsonl"):
        sys.exit(f"{spec!r} is not a file and no BENCH_HISTORY.jsonl "
                 "exists to look the label up in (run a bench first)")
    hit = None
    with open("BENCH_HISTORY.jsonl") as f:
        for n, line in enumerate(f, 1):
            if not line.strip():
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                # the Bench append is non-atomic; skip a truncated
                # trailing line instead of crashing the diff
                print(f"warning: BENCH_HISTORY.jsonl line {n} is not "
                      f"valid JSON - skipped", file=sys.stderr)
                continue
            if rec.get("run") == spec:
                hit = rec
    if hit is None:
        sys.exit(f"no record with run label {spec!r} in BENCH_HISTORY.jsonl")
    return hit


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    min_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    min_abs = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"old: run={old.get('run')} ts={old.get('ts')} "
          f"total={old.get('value')}s keys={len(oq)}")
    print(f"new: run={new.get('run')} ts={new.get('ts')} "
          f"total={new.get('value')}s keys={len(nq)}")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:  " + ", ".join(f"{k} ({nq[k]:.2f}s)" for k in added))
    if removed:
        print("removed: " + ", ".join(f"{k} ({oq[k]:.2f}s)" for k in removed))
    moved = []
    for k in sorted(set(oq) & set(nq)):
        a, b = oq[k], nq[k]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        if abs(b - a) >= min_abs and (ratio >= min_ratio or ratio <= 1 / min_ratio):
            moved.append((ratio, k, a, b))
    if moved:
        print(f"moved (>|{min_ratio}x| and >{min_abs}s):")
        for ratio, k, a, b in sorted(moved, reverse=True):
            print(f"  {k}: {a:.2f}s -> {b:.2f}s ({ratio:.2f}x)")
    else:
        print("no per-key move beyond thresholds")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        pass  # output piped into head etc.
