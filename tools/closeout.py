#!/usr/bin/env python3
"""Round close-out gate: read the COMMITTED artifacts at HEAD, emit the
closing-evidence block from them, and exit nonzero if ANY gate is red.

Why this exists (r15 verdict ask #2): two consecutive rounds shipped a
hand-written close-out narrative that had drifted from the committed
artifacts by final commit — r14's red q33 and r15's red
CANARY_sf1_values.json both rode into history under an "all green"
claim. The fix is mechanical: the numbers in COVERAGE.md's close-out
block must BE this script's output, and the builder must see a nonzero
exit for any red `ok`/`degraded`/leak/copy flag before committing.

Checks (each one that is missing is reported, not silently skipped):
  - CANARY_sf1.json / CANARY_sf10.json          -> ok == true
  - CANARY_sf1_values.json / CANARY_sf10_values.json -> ok == true
  - BENCH_SUMMARY.json  -> degraded == false, failed == [], labeled run
  - LEAKCHECK.json      -> n_hits == 0
  - COPYCHECK.json      -> flagged == []
  - optional --verify <selfcheck artifact> -> ok == true
  - optional --tests <sbt test log>        -> parses "Tests: succeeded N,
    failed M" lines; M must be 0 on every suite block

  - per-key A/B (r17 verdict ask #8): BENCH_SUMMARY.json vs the latest
    PRIOR labeled non-degraded BENCH_HISTORY.jsonl record with the same
    key count; any key slower than both 1.5x and +0.3s (bench_diff.py's
    reporting thresholds) is a red gate. No same-key-count prior base
    (keys added this round) -> the gate abstains with a note.

Usage: closeout.py [--verify selfcheck.json] [--tests sbt_test.log]
                   [--skip-docs]
Run it from the repo root. Output is the close-out markdown on stdout;
paste it verbatim into COVERAGE.md. --skip-docs drops the generated-docs
sync check (for the tool's own unit test, which runs in a temp dir).
"""
import json
import os
import re
import sys


def load(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def main() -> int:
    args = sys.argv[1:]
    verify_path = tests_path = None
    skip_docs = False
    i = 0
    while i < len(args):
        if args[i] == "--verify":
            verify_path = args[i + 1]; i += 2
        elif args[i] == "--tests":
            tests_path = args[i + 1]; i += 2
        elif args[i] == "--skip-docs":
            skip_docs = True; i += 1
        else:
            print(f"unknown arg {args[i]}", file=sys.stderr)
            return 2

    red = []     # gate failures -> nonzero exit
    lines = []   # the close-out block

    # --- tests ---------------------------------------------------------
    if tests_path and os.path.exists(tests_path):
        log = open(tests_path, errors="replace").read()
        totals = re.findall(
            r"Tests: succeeded (\d+), failed (\d+), canceled (\d+)", log)
        # suite count from the SAME parse target as the test count (r16
        # verdict #6: a name-pattern grep missed non-*Spec suites and
        # drifted 42-vs-43): sbt's own "Suites: completed N" lines
        suites = sum(int(n) for n in
                     re.findall(r"Suites: completed (\d+)", log))
        if not totals:
            red.append(f"--tests {tests_path}: no 'Tests:' summary found")
        else:
            succ = sum(int(a) for a, b, c in totals)
            fail = sum(int(b) for a, b, c in totals)
            if fail:
                red.append(f"sbt test: {fail} FAILED")
            lines.append(
                f"- `sbt test`: **{succ}/{succ + fail} green, "
                f"{suites} suites** (script-counted from {tests_path}).")
    else:
        lines.append("- `sbt test`: NOT CHECKED (pass --tests <log>).")
        red.append("no sbt test log provided")

    # --- verify/selfcheck ---------------------------------------------
    if verify_path:
        v = load(verify_path)
        if v is None:
            red.append(f"--verify {verify_path}: missing")
        else:
            n = len(v.get("queries", {}))
            bad = [k for k, q in v.get("queries", {}).items()
                   if not q.get("match", False)]
            if not v.get("ok", False):
                red.append(f"selfcheck {verify_path}: ok=false ({bad})")
            lines.append(
                f"- Full Verify + DuckDB selfcheck: **{n - len(bad)}/{n} "
                f"green** ({verify_path}{'' if not bad else f'; RED: {bad}'}).")
    else:
        lines.append("- Verify/selfcheck: NOT CHECKED "
                     "(pass --verify <artifact>).")
        red.append("no selfcheck artifact provided")

    # --- canaries ------------------------------------------------------
    for path, what in [("CANARY_sf1.json", "10x ratio canary"),
                       ("CANARY_sf10.json", "100x ratio canary"),
                       ("CANARY_sf1_values.json", "10x planted values"),
                       ("CANARY_sf10_values.json", "100x planted values")]:
        d = load(path)
        if d is None:
            red.append(f"{path}: missing")
            lines.append(f"- {what}: **MISSING** ({path}).")
            continue
        ok = d.get("ok", False)
        if not ok:
            detail = ""
            if "queries" in d and isinstance(d["queries"], dict):
                bad = [k for k, q in d["queries"].items()
                       if isinstance(q, dict) and q.get("match") is False]
                over = d.get("queries_over_ratio", [])
                vac = d.get("queries_vacuous", [])
                miss = d.get("queries_missing_from_canary", [])
                detail = f" RED: match-fail={bad} over={over} " \
                         f"vacuous={vac} missing={miss}"
            red.append(f"{path}: ok=false.{detail}")
        n = len(d.get("queries", {}))
        lines.append(f"- {what}: **ok={str(ok).lower()}** over {n} keys "
                     f"({path}).")

    # --- bench summary -------------------------------------------------
    b = load("BENCH_SUMMARY.json")
    if b is None:
        red.append("BENCH_SUMMARY.json: missing")
        lines.append("- Bench: **MISSING** (BENCH_SUMMARY.json).")
    else:
        deg = b.get("degraded", True)
        degp = b.get("degraded_probes", [])
        run = b.get("run", "unlabeled")
        failed = b.get("failed", [])
        if deg:
            red.append(f"BENCH_SUMMARY.json: degraded=true (probes={degp})")
        if failed:
            red.append(f"BENCH_SUMMARY.json: failed={failed}")
        if run in ("unlabeled", "driver"):
            red.append(f"BENCH_SUMMARY.json: run is '{run}' — commit a "
                       "labeled quiet run (SPARK_GRAFT_RUN=...)")
        scan = b.get("fits_scan_mb_s")
        # a crashed probe omits its field (supported case, BenchSpec):
        # say so explicitly and go red — never render "None MB/s" into
        # an otherwise-green evidence block
        if scan is None:
            red.append("BENCH_SUMMARY.json: fits_scan_mb_s probe absent")
            probe_txt = "scan probe ABSENT (probe crashed?)"
        else:
            probe_txt = (f"scan probe {scan} MB/s ≈ {scan / 32:.0f} "
                         f"MB/s/task vs the reference's 16 MB/s/task")
        lines.append(
            f"- Quiet base bench: **{b.get('value', -1):.1f} s / "
            f"{len(b.get('queries', {}))} keys** (run `{run}`, "
            f"degraded={str(deg).lower()}); {probe_txt}.")

    # --- per-key regression gate (r17 verdict ask #8) -------------------
    # Mechanize the round's A/B discipline: the committed quiet base vs
    # the latest PRIOR labeled non-degraded history record at the SAME
    # key count. Regressions beyond bench_diff.py's reporting
    # thresholds (>=1.5x AND >=0.3s slower) are red, not narrative.
    if b is not None and os.path.exists("BENCH_HISTORY.jsonl"):
        cur_key = (b.get("run"), b.get("ts"))
        nq = b.get("queries", {})
        base = None
        with open("BENCH_HISTORY.jsonl") as f:
            for line in f:
                if not line.strip():
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("run") in ("driver", "unlabeled", None):
                    continue
                if rec.get("degraded", True):
                    continue
                if (rec.get("run"), rec.get("ts")) == cur_key:
                    continue
                if rec.get("ts", "") >= (b.get("ts") or ""):
                    continue
                # key SET, not count: a same-count key rename/swap is a
                # different surface — comparing it would silently drop
                # the swapped key from the A/B instead of abstaining
                if set(rec.get("queries", {})) != set(nq):
                    continue
                base = rec  # latest prior wins (file is append-ordered)
        if base is None:
            lines.append("- Per-key A/B gate: no prior same-key-set "
                         "quiet base in history (keys changed this "
                         "round) — gate abstains.")
        else:
            oq = base.get("queries", {})
            regs = []
            for k in sorted(set(oq) & set(nq)):
                a, n = oq[k], nq[k]
                if a <= 0 or n <= 0:
                    continue
                if n - a >= 0.3 and n / a >= 1.5:
                    regs.append(f"{k} {a:.2f}s->{n:.2f}s ({n / a:.2f}x)")
            if regs:
                red.append("per-key regression vs quiet base "
                           f"`{base.get('run')}`: {regs}")
            lines.append(
                f"- Per-key A/B vs `{base.get('run')}`: "
                + (f"**{len(regs)} regression(s)**: {regs}" if regs
                   else f"**no regression** beyond 1.5x/0.3s over "
                        f"{len(set(oq) & set(nq))} shared keys."))

    # --- leak / copy ---------------------------------------------------
    leak = load("LEAKCHECK.json")
    if leak is None or leak.get("n_hits", 1) != 0:
        red.append(f"LEAKCHECK.json: {leak and leak.get('n_hits')} hits")
    # COPYCHECK.json is written by the DRIVER after the round closes —
    # it is never present at builder commit time, so missing is a note,
    # not a red gate (a present-and-flagged one still is).
    copy = load("COPYCHECK.json")
    if copy is not None and copy.get("flagged"):
        red.append(f"COPYCHECK.json: flagged={copy.get('flagged')}")
    # a MISSING leak check must never read as "0 hits" in the pasted
    # evidence block — that is exactly the drift this script prevents
    lines.append(
        ("- LEAKCHECK **MISSING**; " if leak is None
         else f"- LEAKCHECK {leak.get('n_hits')} hits; ")
        + ("COPYCHECK pending (driver-side artifact)." if copy is None
           else f"COPYCHECK flagged={copy.get('flagged')}."))

    # --- generated docs stay in sync with the registries ---------------
    if not skip_docs:
        import subprocess
        here = os.path.dirname(os.path.abspath(__file__))
        gen = subprocess.run(
            [sys.executable, os.path.join(here, "gen_docs.py"), "--check"],
            capture_output=True, text=True)
        if gen.returncode != 0:
            red.append("docs/operator-reference.md is stale — run "
                       "tools/gen_docs.py")
        lines.append(
            "- docs/operator-reference.md "
            + ("in sync with the query registries." if gen.returncode == 0
               else "STALE."))

    print("### Round closing evidence (script-emitted by tools/closeout.py "
          "from the artifacts at HEAD)\n")
    print("\n".join(lines))
    if red:
        print("\nRED GATES — DO NOT COMMIT THIS AS A CLEAN ROUND:",
              file=sys.stderr)
        for r in red:
            print(f"  !! {r}", file=sys.stderr)
        return 1
    print("\nAll gates green.", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
