package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench `degraded` heuristic (r15 verdict ask #3): the driver's
  * r15 artifact shipped every throughput probe ~5× down on unchanged
  * code with `degraded:false`, because load average alone never
  * tripped. These tests replay that exact run against the committed
  * labeled history and require the flag to trip — and require healthy
  * history (including its honest 0.48× dips) NOT to trip it. Pure
  * functions, no SparkSession.
  */
class BenchSpec extends AnyFunSuite {

  // shapes lifted from BENCH_HISTORY.jsonl (labeled, degraded:false)
  private def line(run: String, degraded: Boolean, scan: Double,
      varlen: Double, hcomp: Double, write: Double): String =
    s"""{"metric":"total","run":"$run","degraded":$degraded,""" +
      s""""machine_cpus":32,""" +
      s""""fits_scan_mb_s":$scan,"fits_varlen_mb_s":$varlen,""" +
      s""""fits_hcomp_mb_s":$hcomp,"fits_write_mb_s":$write}"""

  private val history = Seq(
    line("r14-base", degraded = false, 1965.2, 2089.6, 302.7, 749.1),
    line("r14-base2", degraded = false, 2386.5, 2167.0, 368.6, 825.7),
    line("r15-base2", degraded = false, 2220.2, 2112.8, 389.4, 665.3),
    line("r15-base3", degraded = false, 2227.3, 1874.7, 366.9, 741.3),
    line("r15-base4", degraded = false, 1654.8, 1987.1, 335.5, 560.8),
    // the r15 false-negative itself: unlabeled AND mislabeled clean —
    // both filters must keep it out of the median basis
    line("unlabeled", degraded = false, 437.2, 1772.2, 46.6, 447.9),
    // a correctly-flagged run is excluded by the degraded filter
    line("r13-canary100x", degraded = true, 100.0, 100.0, 10.0, 10.0),
  )

  test("stdout summary carries every declared key inside the driver's " +
    "tail window (r18 verdict ask #2)") {
    // the REAL registry's key names (their summed length is what blew
    // the old seconds-precision line), at the r18 DRIVER host's shape —
    // the slowest committed environment: 72.3 s over 110 keys, ~1/3 of
    // keys above 1 s (4-digit ms). Values chosen to reproduce that
    // digit mix with ~20% slack on top.
    val keys = SparkEntry.queries.keySet.toSeq.sorted
    val vals = keys.zipWithIndex.map { case (k, i) =>
      k -> (if (i % 3 == 0) 2.345 else 0.456)
    }
    val line = Bench.stdoutSummary("99.999",
      vals, "/root/testdata/sf0.1", "[]", "FALLBACK")
    assert(line != "FALLBACK",
      s"compact line overflowed the guard at ${keys.size} keys")
    assert(line.length <= 2345, s"line is ${line.length} chars")
    // every key present, values integer ms, valid JSON framing
    assert(line.contains("\"" + keys.head + "\":2345"), line.take(200))
    keys.foreach(k => assert(line.contains("\"" + k + "\":"), k))
    assert(line.startsWith("""{"metric":"total","value":99.999"""))
    assert(line.endsWith(""""failed":[]}"""))
    // a failed key reports -1, like the file record
    val failed = Bench.stdoutSummary("1.000",
      Seq("q01_project" -> -1.0), "/x", """["q01_project"]""", "FB")
    assert(failed.contains(""""q01_project":-1"""))
    // and the guard still falls back rather than truncating mid-JSON
    val huge = (1 to 400).map(i => s"key_$i" -> 1.0)
    assert(Bench.stdoutSummary("1.000", huge, "/x", "[]", "FB") == "FB")
  }

  test("probeValues extracts every probe field from a summary line") {
    val v = Bench.probeValues(history.head)
    assert(v == Map("fits_scan_mb_s" -> 1965.2, "fits_varlen_mb_s" -> 2089.6,
      "fits_hcomp_mb_s" -> 302.7, "fits_write_mb_s" -> 749.1))
    // partial lines (failed probes omit their fields) parse partially
    assert(Bench.probeValues("""{"fits_scan_mb_s":12.5}""") ==
      Map("fits_scan_mb_s" -> 12.5))
    assert(Bench.probeValues("{}") == Map.empty)
  }

  test("the r15 degraded run trips the history-median check") {
    // the exact probe values the driver's r15 artifact carried with
    // degraded:false — scan 0.20× and hcomp 0.13× of the labeled median
    val r15 = Map("fits_scan_mb_s" -> 437.2, "fits_varlen_mb_s" -> 1772.2,
      "fits_hcomp_mb_s" -> 46.6, "fits_write_mb_s" -> 447.9)
    val lagging = Bench.laggingProbes(history, r15, machineCpus = 32)
    assert(lagging.contains("fits_scan_mb_s"), lagging)
    assert(lagging.contains("fits_hcomp_mb_s"), lagging)
    // varlen/write were within normal noise that run — a tripped flag
    // must name only the probes that actually collapsed
    assert(!lagging.contains("fits_varlen_mb_s"), lagging)
  }

  test("healthy runs — including honest 0.48x dips — do not trip") {
    // every labeled history run must pass against the basis it's in
    history.filter(l => l.contains("\"degraded\":false") &&
        !l.contains("unlabeled")).foreach { l =>
      val lagging = Bench.laggingProbes(history, Bench.probeValues(l), machineCpus = 32)
      assert(lagging.isEmpty, s"$l -> $lagging")
    }
    // the documented calibration case: varlen at 0.48x median (the
    // r14-dev-smoke cold start) stays green under factor 0.4
    val dip = Map("fits_scan_mb_s" -> 1678.1, "fits_varlen_mb_s" -> 1017.5,
      "fits_hcomp_mb_s" -> 250.5, "fits_write_mb_s" -> 601.9)
    assert(Bench.laggingProbes(history, dip, machineCpus = 32).isEmpty)
  }

  test("empty or unusable history disables the check, never crashes") {
    val cur = Map("fits_scan_mb_s" -> 1.0)
    assert(Bench.laggingProbes(Seq.empty, cur).isEmpty)
    assert(Bench.laggingProbes(Seq("not json at all"), cur).isEmpty)
    // history of only unlabeled/degraded runs contributes no basis
    assert(Bench.laggingProbes(Seq(
      line("unlabeled", degraded = false, 2000, 2000, 300, 700),
      line("x", degraded = true, 2000, 2000, 300, 700)), cur,
      machineCpus = 32).isEmpty)
    // history from a DIFFERENT machine shape contributes no basis: a
    // smaller host must not be judged against the driver box's medians
    // (that would make the close-out gate permanently unpassable there)
    assert(Bench.laggingProbes(history,
      Map("fits_scan_mb_s" -> 100.0), machineCpus = 8).isEmpty)
    // a probe missing from the current run (probe crashed → field
    // absent) is not judged
    assert(Bench.laggingProbes(history,
      Map("fits_varlen_mb_s" -> 2000.0), machineCpus = 32).isEmpty)
  }

  test("machine-shape match is delimiter-anchored: cpus=8 ignores cpus=80 " +
      "history; driver-stamped runs contribute no basis") {
    // r16 advice: a substring match made "machine_cpus":8 also match
    // "machine_cpus":80 lines — a digit-prefix false positive that
    // re-admits cross-shape medians
    val h80 = Seq(
      """{"run":"big-box","degraded":false,"machine_cpus":80,""" +
        """"fits_scan_mb_s":5000.0,"fits_varlen_mb_s":5000.0,""" +
        """"fits_hcomp_mb_s":900.0,"fits_write_mb_s":2000.0}""")
    assert(Bench.laggingProbes(h80,
      Map("fits_scan_mb_s" -> 100.0), machineCpus = 8).isEmpty)
    // the driver's no-env default label is excluded exactly like
    // "unlabeled": driver runs are co-load-suspect by construction
    assert(Bench.laggingProbes(
      Seq(line("driver", degraded = false, 2000, 2000, 300, 700)),
      Map("fits_scan_mb_s" -> 100.0), machineCpus = 32).isEmpty)
  }

  test("quietBase: latest prior labeled non-degraded same-key-count run") {
    def rec(run: String, ts: String, total: Double, nKeys: Int,
        degraded: Boolean = false): String = {
      val qs = (1 to nKeys).map(i => s""""q$i":1.0""").mkString(",")
      s"""{"metric":"total","value":$total,"unit":"sec","run":"$run",""" +
        s""""ts":"$ts","queries":{$qs},"degraded":$degraded}"""
    }
    val history = Seq(
      rec("r17-base1", "2026-08-01T00:00:00Z", 50.0, 3),
      rec("r17-base2", "2026-08-02T00:00:00Z", 51.0, 3),
      rec("r17-busy", "2026-08-03T00:00:00Z", 80.0, 3, degraded = true),
      rec("driver", "2026-08-04T00:00:00Z", 81.0, 3),
      rec("r17-other-count", "2026-08-05T00:00:00Z", 52.0, 4))
    val k3 = Set("q1", "q2", "q3")
    // latest prior quiet base with the same key SET = base2 (busy is
    // degraded, driver is excluded, other-count has 4 keys)
    assert(Bench.quietBase(history, k3, "2026-08-10T00:00:00Z") ==
      Some(("r17-base2", 51.0)))
    // key-SET mismatch → no base: new keys this round abstains …
    assert(Bench.quietBase(history, k3 + "q5",
      "2026-08-10T00:00:00Z").isEmpty)
    // … and so does a same-COUNT rename/swap (different surface)
    assert(Bench.quietBase(history, Set("q1", "q2", "q9"),
      "2026-08-10T00:00:00Z").isEmpty)
    // only strictly-older records qualify (self-exclusion by ts)
    assert(Bench.quietBase(history, k3, "2026-08-01T12:00:00Z") ==
      Some(("r17-base1", 50.0)))
    // empty history abstains
    assert(Bench.quietBase(Nil, k3, "2026-08-10T00:00:00Z").isEmpty)
  }

  test("closeout.py refuses an injected per-key regression (tool unit test)") {
    import scala.sys.process._
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/test_closeout.py"))
      .!(ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code == 0, out.toString)
    assert(out.toString.contains("ALL GREEN"), out.toString)
  }
}
