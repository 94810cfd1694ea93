#!/usr/bin/env python3
"""100x planted-key VALUE verification (r12 verdict ask #1).

The DuckDB selfcheck replays every oracle at the graded SFs and holds
to ~10x (full sketch replays are quadratic-ish in DuckDB); past that,
canaries were ratio/row-gated only. This tool closes that boundary
with the cheapest possible oracle: the planted/gate keys have
expected outputs that are either corpus-independent (the planted
query-id lists pin to replica 0 because CanaryGen shifts keys by
replica x 100M, so `vec_id < 10000`-style predicates match only the
original rows) or derivable by a single filter scan (the planted-pair
lists). Run graft.Verify with the key-subset arg on the canary corpus
first, then this.

Two verification modes, chosen per key:

  full    — the whole engine output must hash-equal a cheap oracle
            (filter scans, no joins; valid at ANY scale).
  planted — only the engine rows with b - a == 10,000,000 (the planted
            id offset) are compared, against the planted-pair list.
            Used for dedup_embed_planted / dedup_simhash_planted,
            whose FULL oracles join all pairs (fine at the graded SFs,
            quadratic in DuckDB at 100x) and whose organic rows are
            corpus-dependent: on a replicated corpus, two base docs
            from one exact-dup cluster can land in the same replica's
            mod-101 slice and legitimately add organic pairs. No
            organic pair can have offset exactly 10M (base ids < 1M),
            so the projection is exact, and the planted rows are the
            whole point of these gates — they detect banding/sketch
            collapse.

Usage: planted_check.py <canaryDir> <verifyOutDir> [artifact.json]
"""
import json
import os
import sys

import duckdb

OFF = 10000000  # planted id offset (Dedup.scala / Similarity.scala)

# key -> (mode, oracle_sql, engine_projection_sql_or_None)
# Oracle SQL runs over views named after the tables; engine projection
# runs over a view `engine` loaded from the Verify parquet dump.
CHECKS = {
    # corpus-independent planted query-id lists (replica-0 only by the
    # CanaryGen key-shift construction)
    "sim_lsh_planted": ("full", """
        SELECT vec_id + 1000000000 AS q_id FROM embeddings
        WHERE vec_id % 97 = 3 AND vec_id < 10000
          AND list_max(list_transform(embedding, x -> abs(x))) > 0
        ORDER BY q_id""", None),
    "sim_ivf_planted": ("full", """
        SELECT vec_id + 1000000000 AS q_id FROM embeddings
        WHERE vec_id % 97 = 3 AND vec_id < 10000
          AND list_max(list_transform(embedding, x -> abs(x))) > 0
        ORDER BY q_id""", None),
    "sim_approx_planted": ("full", """
        SELECT vec_id FROM embeddings
        WHERE vec_id % 97 = 3 AND vec_id < 10000
          AND list_max(list_transform(embedding, x -> abs(x))) > 0
        ORDER BY vec_id""", None),
    "sim_lsh_recall": ("full", """
        SELECT vec_id AS q_id FROM embeddings
        WHERE vec_id < 5 ORDER BY q_id""", None),
    # cutout band over the replica-0 (doc_id < 1M) reference image:
    # constant-size at every canary scale, every pixel value-checked
    "q35_fits_cutout": ("full", """
        WITH d AS (
          SELECT doc_id, substr(text, 1, 636) AS t,
                 row_number() OVER (ORDER BY doc_id) - 1 AS img_line
          FROM documents WHERE doc_id < 1000000)
        SELECT img_line, doc_id,
          array_to_string(list_transform(range(1, 637),
            j -> CAST(CASE WHEN j <= len(t) THEN ord(substr(t, j, 1))
                      ELSE 0 END AS BIGINT)), ',') AS px_csv
        FROM d WHERE img_line BETWEEN 100 AND 299
        ORDER BY img_line""", None),
    # r18: the fixture write is parallel and lines self-identify, so
    # the replay keys on the DECODED doc_id (order-independent)
    "q39_fits_cutout2d": ("full", """
        SELECT doc_id,
          array_to_string(list_transform(range(1, 101),
            j -> CAST(CASE WHEN j <= len(t) THEN ord(substr(t, j, 1))
                      ELSE 0 END AS BIGINT)), ',') AS px_csv
        FROM (SELECT doc_id, substr(text, 1, 100) AS t FROM documents
              WHERE doc_id < 1000000)
        WHERE doc_id BETWEEN 100 AND 299
        ORDER BY doc_id""", None),
    # value-domain data skipping (r18): bounded band replay — skipping
    # must never change the result; valid at any scale (replica-0 pin)
    "q41_fits_skip": ("full", """
        SELECT event_id, user_id, value FROM events
        WHERE event_id < 1000000 AND event_id BETWEEN 100 AND 299
          AND value > -1e18
        ORDER BY event_id""", None),
    # multi-HDU MEF union (r18): each row's _hdu is its mod-3 slice + 1
    "q42_fits_multihdu": ("full", """
        SELECT event_id, user_id,
          CAST(event_id % 3 + 1 AS INTEGER) AS hdu
        FROM events WHERE event_id < 1000000
        ORDER BY event_id""", None),
    "q40_fits_tdim": ("full", """
        SELECT doc_id, CAST(2 AS INT) AS d2, CAST(3 AS INT) AS d1,
          array_to_string(list_transform(range(1, 7),
            j -> CAST(CASE WHEN j <= len(text) THEN ord(substr(text, j, 1))
                      ELSE 0 END AS BIGINT)), ',') AS mat_csv
        FROM documents WHERE doc_id < 1000000
        ORDER BY doc_id""", None),
    "sim_ivf_recall": ("full", """
        SELECT vec_id AS q_id FROM embeddings
        WHERE vec_id < 5 ORDER BY q_id""", None),
    # linear-scan oracles, cheap at any scale
    "text_langid_planted": ("full", """
        SELECT doc_id,
          CASE CAST(doc_id % 5 AS INTEGER)
            WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
            WHEN 3 THEN 'es' ELSE 'zh' END AS lang
        FROM documents ORDER BY doc_id""", None),
    # jpeg planted twin: every feature is doc_id arithmetic (uniform
    # q1.0 gray-8 jpeg is DC-only and decodes bit-exactly), so the
    # full real-codec round trip value-verifies at any corpus scale
    "mm_jpeg_planted": ("full", """
        SELECT doc_id AS media_id,
          CAST(32 + doc_id % 97 AS BIGINT) AS n_px,
          CAST(30 + doc_id % 201 AS BIGINT) AS px_min,
          CAST(30 + doc_id % 201 AS BIGINT) AS px_max,
          CAST((32 + doc_id % 97) * (30 + doc_id % 201) AS BIGINT)
            AS px_sum
        FROM documents ORDER BY media_id""", None),
    # FITS write->read round trips: linear per-row replays, cheap at
    # any scale — value-verifies the writer (fixed-width AND heap
    # var-length paths) over the full canary corpus
    "q32_fits_roundtrip": ("full", """
        SELECT event_id, user_id, event_type, value,
          epoch_us(ts) AS ts_us
        FROM events ORDER BY event_id""", None),
    # streaming FITS ingestion: hourly rollup, linear replay — value-
    # verifies the micro-batch FITS source over the full canary corpus
    "stream_fits_ingest": ("full", """
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, event_type,
          COUNT(*) AS cnt, CAST(SUM(event_id) AS BIGINT) AS sum_id
        FROM events GROUP BY h, event_type
        ORDER BY h, event_type""", None),
    "q33_fits_varlen": ("full", """
        SELECT doc_id, text,
          array_to_string(list_transform(regexp_split_to_array(text, ' '),
                                         w -> CAST(len(w) AS INTEGER)),
                          ',') AS word_lens_csv
        FROM documents ORDER BY doc_id""", None),
    # RICE_1 tile-compressed image round trip: every decompressed pixel
    # replays as ord() over the ASCII doc bytes (linear scan, any scale)
    "q34_fits_tilecomp": ("full", """
        SELECT doc_id,
          array_to_string(list_transform(range(1, 637),
            j -> CAST(CASE WHEN j <= len(t) THEN ord(substr(t, j, 1))
                      ELSE 0 END AS BIGINT)), ',') AS px_csv
        FROM (SELECT doc_id, substr(text, 1, 636) AS t FROM documents)
        ORDER BY doc_id""", None),
    # metadata-column invariants (r16): the emitted totals collapse to
    # count(*)/sums only when every file's _row_index set is dense
    # 0..cnt-1 and every row reports _hdu = 1 — layout-independent,
    # one aggregation scan, valid at any scale
    "q36_fits_metadata": ("full", """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS rows_via_index,
          CAST(count(*) AS BIGINT) AS rows_via_distinct,
          CAST(0 AS BIGINT) AS bad_files,
          CAST(sum(event_id) AS BIGINT) AS sum_event_id,
          CAST(sum(user_id) AS BIGINT) AS sum_user_id
        FROM events""", None),
    # runtime-filtered join (r16): bounded sorted corpus, row_number
    # replay — pruning must never change the result; valid at any scale
    # because doc_id < 1M pins replica 0 (CanaryGen key-shift)
    "q37_fits_rtjoin": ("full", """
        WITH d AS (
          SELECT doc_id, lang,
                 row_number() OVER (ORDER BY doc_id) - 1 AS ri
          FROM documents WHERE doc_id < 1000000)
        SELECT doc_id, lang, ri FROM d
        WHERE ri BETWEEN 50 AND 149 AND ri % 7 = 3
        ORDER BY ri""", None),
    # metadata-answered extent (r16): header-derived count/max vs a
    # full-scan count over a bounded single-file corpus
    "q38_fits_extent": ("full", """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_via_max,
          CAST(count(*) AS BIGINT) AS n_scanned
        FROM events WHERE event_id < 1000000""", None),
    "q31_bloom": ("full", """
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        ORDER BY o_orderkey""", None),
    "q19_approx_gate": ("full", """
        SELECT DISTINCT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
          AS o_year, o_orderpriority
        FROM orders ORDER BY 1, 2""", None),
    # planted-pair projections (see module docstring)
    "dedup_embed_planted": ("planted", f"""
        SELECT vec_id AS a_vid, vec_id + {OFF} AS b_vid FROM embeddings
        WHERE vec_id % 101 = 0
          AND list_max(list_transform(embedding, x -> abs(x))) > 0
        ORDER BY a_vid""", f"""
        SELECT a_vid, b_vid FROM engine
        WHERE b_vid - a_vid = {OFF} ORDER BY a_vid"""),
    # planted docs pair at jaccard exactly 1.0 (verbatim copy); docs
    # with < 3 words have no 3-gram shingles and produce no pair
    "dedup_simhash_planted": ("planted", f"""
        SELECT doc_id AS a_id, doc_id + {OFF} AS b_id, 1.0 AS jac
        FROM documents
        WHERE doc_id % 101 = 0
          AND len(regexp_split_to_array(TRIM(text), '\\s+')) >= 3
        ORDER BY a_id""", f"""
        SELECT a_id, b_id, jac FROM engine
        WHERE b_id - a_id = {OFF} ORDER BY a_id"""),
}

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main(sf_dir, out_dir, artifact=None):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    failures = 0
    verdicts = {}
    for name, (mode, oracle_sql, proj_sql) in sorted(CHECKS.items()):
        dump = f"{out_dir}/{name}"
        if not os.path.isdir(dump):
            print(f"skip {name}: no engine dump")
            continue
        try:
            con.execute("DROP VIEW IF EXISTS engine")
            con.execute(f"CREATE VIEW engine AS SELECT * "
                        f"FROM read_parquet('{dump}/*.parquet')")
            want = con.execute(oracle_sql).fetchall()
            # full mode selects the engine columns BY the oracle's
            # column names, so the row tuples align positionally even
            # if the parquet dump's physical column order differs; a
            # missing column fails loudly in DuckDB
            oracle_cols = [d[0] for d in con.description]
            # strict schema gate (matches selfcheck.py): the engine
            # dump's column SET must equal the oracle's, so an added
            # or renamed engine column can't pass silently
            if not proj_sql:
                eng_cols = [r[1] for r in con.execute(
                    "PRAGMA table_info('engine')").fetchall()]
                if sorted(eng_cols) != sorted(oracle_cols):
                    raise RuntimeError(
                        f"column-set mismatch: engine={sorted(eng_cols)} "
                        f"oracle={sorted(oracle_cols)}")
            got = con.execute(
                proj_sql if proj_sql else
                f"SELECT {', '.join(oracle_cols)} FROM engine "
                f"ORDER BY ALL").fetchall()
        except Exception as ex:
            print(f"FAIL {name}: {ex}")
            failures += 1
            verdicts[name] = {"match": False, "mode": mode, "rows": -1,
                              "detail": str(ex)}
            continue
        # rows align positionally (engine columns selected by the
        # oracle's names above); values compare as strings
        def canon(rows):
            return sorted(tuple(str(v) for v in r) for r in rows)
        ok = canon(got) == canon(want)
        # a planted gate must never verify vacuously: zero expected
        # rows would pass any collapse
        if ok and len(want) == 0:
            ok = False
            detail = "VACUOUS: oracle expects 0 rows"
        elif ok:
            detail = f"value-equal ({mode})"
        else:
            wset, gset = set(canon(want)), set(canon(got))
            detail = (f"missing={len(wset - gset)} "
                      f"extra={len(gset - wset)} "
                      f"(want {len(want)} rows, got {len(got)})")
            # r15 lesson: a red recall row said only "missing=1" and the
            # diagnosis had to be re-derived by hand. Verify dumps the
            # per-query (q_id, hits) audit as <key>_diag — fold it into
            # the failure detail so the artifact names the collapsed
            # query and its hit count.
            diag_dir = f"{out_dir.rstrip('/')}_diag/{name}_diag"
            if os.path.isdir(diag_dir):
                try:
                    diag_rows = con.execute(
                        f"SELECT * FROM read_parquet('{diag_dir}/*.parquet') "
                        f"ORDER BY ALL").fetchall()
                    detail += f"; diag={diag_rows}"
                except Exception as dex:
                    detail += f"; diag unreadable: {dex}"
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {len(got)} rows "
              f"[{mode}] {'' if ok else detail}")
        if not ok:
            failures += 1
        verdicts[name] = {"match": ok, "mode": mode, "rows": len(got),
                          "detail": detail}
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    if artifact:
        with open(artifact, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "ok": failures == 0 and len(verdicts) > 0,
                       "queries": verdicts}, f, indent=1, sort_keys=True)
        print(f"verdicts -> {artifact}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
