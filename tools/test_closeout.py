#!/usr/bin/env python3
"""Unit test for tools/closeout.py (r17 verdict ask #8): the per-key
regression gate must refuse an injected synthetic regression and pass a
clean A/B. Runs in a temp dir with synthetic artifacts; wired into
`sbt test` via BenchSpec so the discipline is mechanical every round.

Exit 0 = all assertions hold.
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
CLOSEOUT = os.path.join(HERE, "closeout.py")


def bench_record(run, ts, queries, degraded=False):
    return {
        "metric": "total", "value": sum(queries.values()), "unit": "sec",
        "run": run, "ts": ts, "queries": queries, "failed": [],
        "degraded": degraded, "degraded_probes": [],
        "fits_scan_mb_s": 2000.0,
    }


def write_artifacts(d, summary_queries):
    for name in ("CANARY_sf1.json", "CANARY_sf10.json",
                 "CANARY_sf1_values.json", "CANARY_sf10_values.json"):
        with open(os.path.join(d, name), "w") as f:
            json.dump({"ok": True, "queries": {}}, f)
    with open(os.path.join(d, "LEAKCHECK.json"), "w") as f:
        json.dump({"n_hits": 0}, f)
    with open(os.path.join(d, "selfcheck.json"), "w") as f:
        json.dump({"ok": True, "queries": {"q1": {"match": True}}}, f)
    with open(os.path.join(d, "sbt_test.log"), "w") as f:
        f.write("[info] Suites: completed 44, aborted 0\n"
                "[info] Tests: succeeded 379, failed 0, canceled 0\n")
    base = bench_record("rX-base", "2026-01-01T00:00:00Z",
                        {"q1": 1.0, "q2": 2.0, "q3": 3.0})
    with open(os.path.join(d, "BENCH_HISTORY.jsonl"), "w") as f:
        f.write(json.dumps(base) + "\n")
    cur = bench_record("rY-base", "2026-01-02T00:00:00Z", summary_queries)
    with open(os.path.join(d, "BENCH_SUMMARY.json"), "w") as f:
        json.dump(cur, f)
    with open(os.path.join(d, "BENCH_HISTORY.jsonl"), "a") as f:
        f.write(json.dumps(cur) + "\n")


def run_closeout(d):
    return subprocess.run(
        [sys.executable, CLOSEOUT, "--verify", "selfcheck.json",
         "--tests", "sbt_test.log", "--skip-docs"],
        cwd=d, capture_output=True, text=True)


def main():
    # clean A/B: same keys, small moves below both thresholds -> green
    with tempfile.TemporaryDirectory() as d:
        write_artifacts(d, {"q1": 1.2, "q2": 2.2, "q3": 2.0})
        r = run_closeout(d)
        assert r.returncode == 0, f"clean A/B went red:\n{r.stderr}"
        assert "no regression" in r.stdout, r.stdout

    # injected synthetic regression: q2 2.0 -> 3.5 (1.75x, +1.5s) -> red
    with tempfile.TemporaryDirectory() as d:
        write_artifacts(d, {"q1": 1.0, "q2": 3.5, "q3": 3.0})
        r = run_closeout(d)
        assert r.returncode != 0, "regression was not refused"
        assert "per-key regression" in r.stderr, r.stderr
        assert "q2" in r.stderr, r.stderr

    # key count changed (new key this round): the gate abstains, green
    with tempfile.TemporaryDirectory() as d:
        write_artifacts(d, {"q1": 1.0, "q2": 9.0, "q3": 3.0, "q4": 1.0})
        r = run_closeout(d)
        assert r.returncode == 0, f"abstain case went red:\n{r.stderr}"
        assert "abstains" in r.stdout, r.stdout

    # same COUNT but a swapped key: a different surface — the gate must
    # abstain, not silently shrink the compared set
    with tempfile.TemporaryDirectory() as d:
        write_artifacts(d, {"q1": 1.0, "q2": 9.0, "q9": 3.0})
        r = run_closeout(d)
        assert r.returncode == 0, f"swap case went red:\n{r.stderr}"
        assert "abstains" in r.stdout, r.stdout

    print("test_closeout: ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
