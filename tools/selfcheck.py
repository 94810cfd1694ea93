#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
scale-factor parquet tables, loads the engine's parquet dump for the same
query, sorts columns by name (like the driver) and rows by all columns,
then compares values exactly. Usage:

    python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out

Optional third arg: a JSON artifact path — per-key verdicts are written
there ({key: {"match": bool, "rows": n, "detail": str}}), plus a top-
level "ok". Used by the 100x planted-key value-verification flow (the
full sketch oracles cap out near 10x in DuckDB, but the planted/gate
keys have bounded, cheap-to-replay oracles at ANY scale — run
graft.Verify with the key-subset arg, then this with the artifact arg).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # decimals etc -> string canonical form; floats kept as floats
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    import os
    con = duckdb.connect()
    for t in TABLES:
        # TESTDATA ships single-file tables; CanaryGen (and any
        # Spark-written dataset) ships a DIRECTORY of part files under
        # the same name — glob in that case so the 10x/100x corpora can
        # be hash-verified, not just row-gated
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    verdicts = {}
    for name, sql in sorted(oracle_sql.items()):
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            failures += 1
            verdicts[name] = {"match": False, "rows": -1,
                              "detail": f"oracle errored: {e}"}
            continue
        try:
            engine = duckdb.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: engine output missing: {e}")
            failures += 1
            verdicts[name] = {"match": False, "rows": -1,
                              "detail": "engine output missing"}
            continue
        o, e = canon(oracle), canon(engine)
        if list(o.columns) != list(e.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} engine={list(e.columns)}")
            failures += 1
            verdicts[name] = {"match": False, "rows": int(e.shape[0]),
                              "detail": "column mismatch"}
            continue
        if o.shape != e.shape:
            print(f"FAIL {name}: shape oracle={o.shape} engine={e.shape}")
            failures += 1
            verdicts[name] = {"match": False, "rows": int(e.shape[0]),
                              "detail": f"shape oracle={o.shape} engine={e.shape}"}
            continue
        diffs = []
        for c in o.columns:
            oc, ec = o[c], e[c]
            if pd.api.types.is_float_dtype(oc) or pd.api.types.is_float_dtype(ec):
                neq = ~((oc.isna() & ec.isna()) | (oc.astype(float) == ec.astype(float)))
            else:
                neq = ~((oc.isna() & ec.isna()) | (oc.astype(str) == ec.astype(str)))
            if neq.any():
                i = int(neq.idxmax())
                diffs.append(f"{c}[{i}]: oracle={oc[i]!r} engine={ec[i]!r} (n={int(neq.sum())})")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]))
            failures += 1
            verdicts[name] = {"match": False, "rows": int(e.shape[0]),
                              "detail": "; ".join(diffs[:3])}
        else:
            print(f"ok   {name}: {o.shape[0]} rows x {o.shape[1]} cols")
            verdicts[name] = {"match": True, "rows": int(o.shape[0]),
                              "detail": "hash-equal"}
    # rows-only queries (no oracle). approx_keys.json (written by
    # Verify from SparkEntry.approxKeys) declares which of these are
    # approximate BY DESIGN — those report as such and land in the
    # verdicts map; an oracle-less key NOT on the list is a drift error.
    import glob, os
    approx = set()
    approx_path = f"{out_dir}/approx_keys.json"
    if os.path.exists(approx_path):
        approx = set(json.load(open(approx_path)))
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle_sql:
            try:
                n = duckdb.sql(
                    f"SELECT COUNT(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
            except Exception as ex:
                print(f"FAIL {name}: rows-only read error: {ex}")
                failures += 1
                verdicts[name] = {"match": False, "rows": -1,
                                  "detail": f"rows-only read error: {ex}"}
                continue
            if name in approx:
                print(f"ok   {name}: rows-only-by-design, {n} rows")
                verdicts[name] = {"match": n > 0, "rows": int(n),
                                  "detail": "rows_only_by_design"}
                if n == 0:
                    print(f"FAIL {name}: rows-only-by-design but EMPTY")
                    failures += 1
            elif os.path.exists(approx_path):
                print(f"FAIL {name}: no oracle and not in approx_keys.json")
                failures += 1
                verdicts[name] = {"match": False, "rows": int(n),
                                  "detail": "undeclared rows-only key"}
            else:
                print(f"ok?  {name}: rows-only, {n} rows")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "ok": failures == 0, "queries": verdicts}, f,
                      indent=1, sort_keys=True)
        print(f"verdicts -> {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
