package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Text-analysis surface over the `documents` table (north-star
  * extension operators, SURVEY §2 end — the building blocks of an LLM
  * training-data pipeline at 100 TB).
  *
  * Everything here is per-row (embarrassingly parallel — no shuffle at
  * all): built-in codegen'd functions where possible, native Catalyst
  * expressions (graft.functions) for lang-id and fingerprints.
  */
object TextOps {

  type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val stops = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / punctuation runs). */
  val text_tokens: Q = (s, dir) =>
    docs(s, dir).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))).as("bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Quality scoring from length / stopword / alphabetic ratios. */
  val text_quality: Q = (s, dir) => {
    val words = split(trim(col("text")), "\\s+")
    val nWords = size(words).cast("double")
    val wordChars = length(regexp_replace(col("text"), "\\s", "")).cast("double")
    val stopHits = size(filter(words, w => w.isin(stops.map(x => x: Any): _*)))
      .cast("double")
    val alphaChars = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
      .cast("double")
    val textLen = length(col("text")).cast("double")
    val score = least(lit(1.0), nWords / 200.0) * 0.5 +
      (stopHits / nWords) * 0.3 + (alphaChars / textLen) * 0.2
    docs(s, dir).select(
      col("doc_id"),
      size(words).as("n_words"),
      round(wordChars / nWords, 5).as("mean_word_len"),
      round(stopHits / nWords, 5).as("stop_ratio"),
      round(alphaChars / textLen, 5).as("alpha_ratio"),
      round(score, 5).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Heuristic language ID (native Catalyst expression). The synthetic
    * documents' `lang` labels are random metadata on identical English
    * word-salad, so no heuristic can recover them — accuracy on real
    * multilingual text is asserted in TextOpsSpec instead. */
  val text_langid: Q = (s, dir) =>
    docs(s, dir).select(
      col("doc_id"),
      GraftFunctions.lang_id(col("text")).as("pred_lang"),
      col("lang"))
      .orderBy(col("doc_id"))

  /** Fixed sentences the lang-id heuristic must classify correctly —
    * stopword-bearing text per supported language (zh via the CJK-ratio
    * shortcut). Engine-side only; the oracle never sees the text. */
  private val plantedLangText: Seq[(String, String)] = Seq(
    "en" -> "The quick brown fox jumps over the lazy dog and it is fast",
    "de" -> "Der Hund ist nicht mit der Katze und das Haus ist gross",
    "fr" -> "Le chat est dans la maison et les enfants sont pour la plage",
    "es" -> "Los ninos y las casas son grandes es una ciudad mas bonita",
    "zh" -> "这是一个中文句子用于测试语言识别功能")

  /** Driver-oracled lang-id gate (r11 ask #4): the organic `text_langid`
    * key can only be rows-only (the synthetic corpus carries random
    * `lang` labels on English word-salad), so this key PLANTS the
    * signal — each doc_id is assigned a language by doc_id % 5 and the
    * matching fixed sentence, lang_id runs over the planted text, and
    * only correctly-classified rows are emitted. The oracle is the full
    * (doc_id, language) assignment, so ANY misclassification drops a
    * row and turns the driver's hash red. Per-row, no shuffle — the
    * same 100 TB shape as the organic key. */
  val text_langid_planted: Q = (s, dir) => {
    val slot = (col("doc_id") % 5).cast("int")
    val textBySlot = element_at(
      array(plantedLangText.map(p => lit(p._2)): _*), slot + 1)
    val expectedBySlot = element_at(
      array(plantedLangText.map(p => lit(p._1)): _*), slot + 1)
    docs(s, dir)
      .select(col("doc_id"), textBySlot.as("planted_text"),
        expectedBySlot.as("lang"))
      .filter(GraftFunctions.lang_id(col("planted_text")) === col("lang"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprints: whole-text rolling hash, winnowing-style
    * min-k-gram fingerprint, and 64-bit SimHash.
    *
    * Driver-oracled (r12): all three hashes are pure mod-2^64 integer
    * recurrences over UTF-16 code units, which DuckDB can replay
    * exactly with HUGEINT arithmetic (see the oracle below) — so this
    * key is hash-compared value-for-value, not rows-only. The ASCII
    * guard (`length = octet_length`) pins the one semantic the two
    * engines could disagree on: Java hashes UTF-16 units while the
    * oracle walks codepoints — identical on ASCII, divergent past the
    * BMP. Today's corpus is all-ASCII so the filter drops nothing; if
    * a future TESTDATA regen adds non-ASCII docs, both sides skip
    * them the same way instead of silently diverging (the r11 events
    * lesson). */
  val text_fingerprint: Q = (s, dir) =>
    docs(s, dir)
      .filter(expr("length(text) = octet_length(text)"))
      .select(
        col("doc_id"),
        GraftFunctions.rolling_hash(col("text")).as("full_hash"),
        GraftFunctions.doc_fingerprint(col("text")).as("fingerprint"),
        GraftFunctions.simhash64(col("text")).as("simhash"))
      .orderBy(col("doc_id"))

  /** Corpus-weighted term rarity per document (the tf-idf-shaped
    * keyword/quality signal an LLM-data pipeline runs to spot documents
    * carried by rare vocabulary): for each document, the count of its
    * near-hapax terms (document frequency ≤ 2 in the corpus) and its
    * single rarest term with a rarity score.
    *
    * Score = `tf · (N+1)/(df+1)` — idf as a RATIONAL rarity ratio, not
    * `log`: rank-equivalent (log is monotone) but every arithmetic step
    * is an exactly-rounded IEEE op on integer-valued inputs, so Spark
    * and DuckDB produce bit-identical doubles and the driver can hash-
    * compare values; a `log`-based score would differ in the last ulp
    * between libm implementations. No float SUMs either — the per-doc
    * reductions are an integer count and a MAX (order-independent), so
    * distributed reduction order cannot change the answer.
    *
    * Plan shape at 100 TB: TF is computed IN-ROW by the native
    * [[GraftFunctions.token_tf]] expression (only distinct (doc, term)
    * pairs leave the scan — no shuffle of raw token occurrences), DF is
    * one hash aggregation on term, the DF join is a plain shuffled hash
    * join on term (no broadcast of an unbounded vocabulary), and the
    * per-doc argmax is `min(struct(-score, term))` inside a hash
    * aggregate — comparisons only, no Window funnel, no collect_list.
    * Tie-break on equal score: lexicographically smallest term (binary
    * order — identical in Spark and DuckDB under the ASCII guard). */
  val text_rarity: Q = (s, dir) => {
    val d = docs(s, dir).filter(expr("length(text) = octet_length(text)"))
    val n = d.count() // metadata-only count job (parquet row counts)
    // measured-and-rejected (r18 opt round): Par.spread(d) before the
    // token explode — best-of-3 subset A/B 0.78→0.83 s; the token_tf
    // pass is too cheap here for the exchange to pay off
    val tf = d
      .select(col("doc_id"),
        explode(GraftFunctions.token_tf(col("text"))).as("t"))
      .select(col("doc_id"), col("t.term").as("term"), col("t.tf").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .withColumn("score",
        col("tf") * lit((n + 1).toDouble) / (col("df") + lit(1)))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("df") <= 2, 1).otherwise(0)).as("n_rare"),
        min(struct((-col("score")).as("ns"), col("term").as("term"))).as("top"))
      .select(col("doc_id"), col("n_rare"),
        col("top.term").as("top_term"),
        round(-col("top.ns"), 4).as("top_score"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-level top-50 bigram frequencies, hash-first in two passes:
    * pass 1 counts 64-bit bigram hashes (the native one-pass
    * word_ngram_hashes expression — no per-bigram string allocation,
    * and the group-by shuffles 8-byte longs instead of strings); pass 2
    * re-reads the corpus through word_ngram_filter, which binary-
    * searches each n-gram HASH against the ~50 candidates and
    * materializes a string only on match — the non-winning 99.99% of
    * bigram occurrences never allocate, never leave their partition.
    * The candidate set is every hash with cnt ≥ the 50th-highest
    * count, so string-order tie breaks at rank 50 stay exact. */
  val text_bigrams: Q = (s, dir) => {
    import s.implicits._
    // measured-and-rejected (r18 opt round): Par.spread(d) — both
    // passes re-pay the exchange and the n-gram hash is cheaper than
    // it (best-of-3: 0.74→1.08 s)
    val d = docs(s, dir)
    val hashCounts = d
      .select(explode(GraftFunctions.word_ngram_hashes(col("text"), 2)).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .cache()
    val top50 = hashCounts.orderBy(col("cnt").desc, col("h")).limit(50)
      .agg(min(col("cnt"))).collect()(0)
    val thresh = if (top50.isNullAt(0)) Long.MaxValue else top50.getLong(0)
    // candidate (hash, cnt) rows are top-50-plus-ties — driver-small by
    // construction; the hash array rides into the scan expression and
    // the counts come back via a broadcast join of a local frame
    val candRows = hashCounts.filter(col("cnt") >= thresh).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keep = candRows.map(_._1).sorted
    val cands = candRows.toSeq.toDF("h", "cnt")
    d.select(explode(GraftFunctions.word_ngram_filter(col("text"), 2, keep))
        .as("bigram"))
      .dropDuplicates("bigram")
      // a bigram string is itself a 2-token text whose single 2-gram
      // hash equals the corpus-side hash of that bigram occurrence
      .withColumn("h",
        element_at(GraftFunctions.word_ngram_hashes(col("bigram"), 2), 1))
      .join(broadcast(cands), Seq("h"))
      .select(col("bigram"), col("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(50)
  }

  /** End-to-end corpus cleaning: quality filter × near-dup survivor
    * join — the operators composing into one pipeline plan. Keeps
    * documents that are their component's survivor AND meet the
    * quality bar. */
  val pipeline_clean: Q = (s, dir) => {
    val words = split(trim(col("text")), "\\s+")
    val nWords = size(words).cast("double")
    val stopHits = size(filter(words, w => w.isin(stops.map(x => x: Any): _*)))
      .cast("double")
    val quality = (stopHits / nWords)
    // shares the memoized (checkpoint-backed) component labeling with
    // dedup_survivors instead of recomputing the whole Jaccard+CC DAG
    val survivors = Dedup.survivorLabels(s, dir)
      .filter(col("doc_id") === col("label"))
      .select(col("doc_id"))
    docs(s, dir)
      .join(survivors, Seq("doc_id"))
      .filter(quality >= 0.05)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination: the n-gram-collision check an LLM
    * training pipeline runs against its eval suites before training —
    * emit (doc_id, bench_id, shared) for every corpus document sharing
    * at least `minShared` distinct 3-word shingles with a benchmark
    * document. [[pipeline_decontam]] binds the declared corpus with
    * doc_id ≡ 0 (mod 97) as the benchmark suite; this is the general
    * two-frame operator over (doc_id, h) shingle frames.
    *
    * Scale shape (100 TB): a benchmark suite is tiny next to the
    * corpus, so its shingle frame is broadcast and the corpus side
    * NEVER shuffles for the match; the group-by shuffles only matched
    * (doc, bench) pairs with map-side partial counts. Past ~10⁸
    * benchmark shingles drop the broadcast hint and this becomes a
    * plain shingle-hash equi-join like the dedup family (same
    * hot-shingle discipline: a stop-shingle in the benchmark fans out
    * to its corpus df — cap with `spark.graft.dedup.maxShingleDf` in
    * production; uncapped here so the oracle is exact). */
  private[operators] def decontamFromShingles(corpus: DataFrame,
      bench: DataFrame, minShared: Int): DataFrame =
    corpus.join(broadcast(bench), Seq("h"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .orderBy(col("doc_id"), col("bench_id"))

  /** Spec-facing variant over two (doc_id, text) frames. */
  private[operators] def decontamPairs(corpus: DataFrame, bench: DataFrame,
      minShared: Int): DataFrame = {
    def sh(d: DataFrame) = d.select(col("doc_id"),
      explode(GraftFunctions.word_shingle_hashes(col("text"), 3)).as("h"))
    decontamFromShingles(sh(corpus),
      sh(bench).withColumnRenamed("doc_id", "bench_id"), minShared)
  }

  /** Declared decontamination query: benchmark = doc_id ≡ 0 (mod 97),
    * minShared = `spark.graft.decontam.minShared` (default 3 ≈ a
    * shared 5-word contiguous span). Rides the dedup family's
    * memoized shingle pass — one corpus shingle scan serves all six
    * shingle consumers. */
  val pipeline_decontam: Q = (s, dir) => {
    val minShared = s.conf.getOption("spark.graft.decontam.minShared")
      .map(_.toInt).getOrElse(3)
    val sh = Dedup.shingleHashesFor(s, dir)
    decontamFromShingles(
      sh.filter(col("doc_id") % 97 =!= 0),
      sh.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("bench_id"), col("h")),
      minShared)
  }

  /** Sliding-window word chunking — the RAG-indexing / training-
    * sequence-packing primitive: split each document into windows of
    * `windowWords` words advancing by `windowWords - overlapWords`,
    * emitting (doc_id, chunk_id, n_chunk_words, chunk). The tail chunk
    * may be shorter than the window; every word lands in ≥ 1 chunk.
    *
    * Scale shape (100 TB): pure per-row explode over codegen'd array
    * built-ins (split/sequence/slice/array_join) — no shuffle, no UDF,
    * output rows ≈ corpus_words / step (linear). The final orderBy
    * exists only for the deterministic driver dump; a production write
    * stays partition-local without it. */
  private[operators] def chunkWordsRaw(d: DataFrame, windowWords: Int,
      overlapWords: Int): DataFrame = {
    require(overlapWords >= 0 && overlapWords < windowWords,
      s"need 0 <= overlap < window, got $overlapWords/$windowWords")
    val step = windowWords - overlapWords
    d.select(col("doc_id"), split(trim(col("text")), "\\s+").as("wds"))
      .select(col("doc_id"), col("wds"),
        posexplode(sequence(lit(1), size(col("wds")), lit(step))))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "start")
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        least(lit(windowWords), size(col("wds")) - col("start") + 1)
          .cast("long").as("n_chunk_words"),
        array_join(slice(col("wds"), col("start"), lit(windowWords)), " ")
          .as("chunk"))
  }

  private[operators] def chunkWords(d: DataFrame, windowWords: Int,
      overlapWords: Int): DataFrame =
    chunkWordsRaw(d, windowWords, overlapWords)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Declared chunking query: window/overlap from
    * `spark.graft.chunk.{words,overlap}` (defaults 64/16 → step 48). */
  val pipeline_chunk: Q = (s, dir) => {
    val w = s.conf.getOption("spark.graft.chunk.words").map(_.toInt)
      .getOrElse(64)
    val o = s.conf.getOption("spark.graft.chunk.overlap").map(_.toInt)
      .getOrElse(16)
    chunkWords(docs(s, dir), w, o)
  }

  /** Chunk-level exact dedup — the RAG-granularity dedup pass:
    * identical sliding-window chunks (pipeline_chunk's geometry)
    * collapse to one survivor, the lexicographically smallest
    * (doc_id, chunk_id), carrying the duplicate count. Duplicate
    * documents make their every chunk a duplicate, so an index built
    * on the survivors embeds each passage once.
    *
    * Scale shape (100 TB): one group-by on the chunk text (the same
    * shuffle discipline as dedup_exact's full-text grouping; a
    * production variant groups on a 128-bit chunk hash to shuffle
    * 16-byte keys instead of strings — same plan shape); min(struct)
    * gives the survivor with map-side partial aggregation, no window. */
  private[operators] def chunkDedup(d: DataFrame, windowWords: Int,
      overlapWords: Int): DataFrame =
    chunkWordsRaw(d, windowWords, overlapWords)
      .groupBy(col("chunk"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("k"),
        count(lit(1)).as("cnt"))
      .select(col("k.doc_id").as("doc_id"), col("k.chunk_id").as("chunk_id"),
        col("cnt"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Chunk-level exact dedup over [[pipeline_chunk]]'s output: chunks
    * group by content hash and only one survivor per hash keeps its
    * (doc_id, chunk_id) identity — dedup at the unit that actually
    * enters training, not the whole document. */
  val pipeline_chunk_dedup: Q = (s, dir) => {
    val w = s.conf.getOption("spark.graft.chunk.words").map(_.toInt)
      .getOrElse(64)
    val o = s.conf.getOption("spark.graft.chunk.overlap").map(_.toInt)
      .getOrElse(16)
    chunkDedup(docs(s, dir), w, o)
  }

  /** Within-document repetition scoring — the boilerplate/template
    * signal of the published LLM quality-filter stacks (fraction of
    * duplicate word n-grams inside each document; high values mean
    * machine-generated or scraped-template text). Emits per doc the
    * total and distinct bigram/trigram counts plus the duplicate
    * fractions, rounded to 5 decimals.
    *
    * Scale shape (100 TB): pure per-row array builtins (split /
    * sequence / transform / array_distinct) — codegen'd, no shuffle,
    * no UDF; the n-gram arrays live only inside the projection. The
    * orderBy exists for the deterministic driver dump. */
  private[operators] def repetitionStats(d: DataFrame): DataFrame = {
    val wds = split(trim(col("text")), "\\s+")
    // n-gram string array, empty when the doc has fewer than n words
    // (sequence(1, 0) would count DOWN, so the short case is explicit)
    def grams(n: Int): Column =
      when(size(col("wds")) >= n,
        transform(sequence(lit(1), size(col("wds")) - (n - 1)), i =>
          concat_ws(" ", (0 until n).map(j => element_at(col("wds"), i + j)): _*)))
        .otherwise(array().cast("array<string>"))
    def dupFrac(tot: Column, dis: Column): Column =
      when(tot > 0,
        round((tot - dis).cast("double") / tot.cast("double"), 5))
        .otherwise(lit(0.0))
    d.select(col("doc_id"), col("text")).withColumn("wds", wds)
      .withColumn("bi", grams(2)).withColumn("tri", grams(3))
      .select(col("doc_id"), size(col("wds")).as("n_words"),
        size(col("bi")).as("n_bigrams"),
        size(array_distinct(col("bi"))).as("n_distinct_bigrams"),
        size(col("tri")).as("n_trigrams"),
        size(array_distinct(col("tri"))).as("n_distinct_trigrams"))
      .withColumn("dup_bigram_frac",
        dupFrac(col("n_bigrams"), col("n_distinct_bigrams")))
      .withColumn("dup_trigram_frac",
        dupFrac(col("n_trigrams"), col("n_distinct_trigrams")))
      .orderBy(col("doc_id"))
  }

  /** Repetition diagnostics per document — repeated-line and
    * repeated-n-gram mass ratios, the standard boilerplate/spam signal
    * a corpus-quality pass filters on (see [[repetitionStats]] for the
    * exact measures and their map-only plan). */
  val text_repetition: Q = (s, dir) => repetitionStats(docs(s, dir))

  // PII patterns — identical semantics under Java regex (Spark) and
  // RE2 (DuckDB): ASCII classes, bounded repetition, \b, no lookaround.
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val LongNumPat = "\\b\\d{7,}\\b"

  /** PII redaction — the scrubbing pass a training pipeline runs before
    * anything leaves the ingest zone: mask emails, IPv4 addresses and
    * long digit runs (phone/account numbers), and count what was hit
    * per category. Counts are taken on the raw text; replacement is
    * sequential email → ip → number (the categories are disjoint by
    * construction: an email's local part never contains 7+ digit runs
    * bounded by \b and never parses as a dotted quad).
    *
    * Scale shape (100 TB): per-row codegen'd regexp builtins — no
    * shuffle, no UDF; regex cost is linear in text length. */
  private[operators] def redactPii(d: DataFrame): DataFrame = {
    val red = regexp_replace(regexp_replace(regexp_replace(col("text"),
      EmailPat, "<EMAIL>"), Ipv4Pat, "<IP>"), LongNumPat, "<NUM>")
    d.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Pat), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("text"), lit(LongNumPat), lit(0))).as("n_longnums"),
      red.as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Declared redaction query. The synthetic corpus is digit-free word
    * salad, so a bare redact over it would be a vacuous identity
    * (0 == 0 proves nothing — the dedup_embed lesson). The declared
    * query therefore PLANTS deterministic PII derived from doc_id via
    * the same concat on both engines — every row carries an email, a
    * dotted-quad and a 10-digit number (plus a second email on
    * doc_id ≡ 0 mod 3 so the counts vary), and the oracle checks the
    * full redacted text hash. [[redactPii]] stays the general operator
    * for real corpora. */
  val pipeline_redact: Q = (s, dir) => {
    val aug = concat(col("text"),
      lit(" contact u"), col("doc_id").cast("string"),
      lit("@ex.com from 10.0."), (col("doc_id") % 256).cast("string"),
      lit("."), (col("doc_id") % 97).cast("string"),
      when(col("doc_id") % 3 === 0, lit(" cc admin@site.org")).otherwise(lit("")),
      lit(" ref "), (col("doc_id") + 7770000000L).cast("string"))
    redactPii(docs(s, dir).withColumn("text", aug))
  }

  /** Token-budget sequence packing — the step that lays documents
    * end-to-end into fixed-size training sequences: each doc is
    * assigned the pack where its start offset lands (start = running
    * token count of its predecessors in the shard), emitting
    * (doc_id, shard, pack_id, offset, n_tokens).
    *
    * Scale shape (100 TB): packing is inherently sequential WITHIN a
    * pack, so the shard count is the parallelism knob — docs are
    * sharded by `doc_id % shards` and the running sum is a window
    * partitioned by shard (one hash exchange, no global sort before
    * the dump ordering). 64 shards covers local[32]; a production run
    * raises `spark.graft.pack.shards` until a shard's token stream
    * fits an executor (e.g. 10k shards ≈ 10 GB each at 100 TB). */
  private[operators] def packTokens(d: DataFrame, shards: Int,
      budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.select(col("doc_id"),
        pmod(col("doc_id"), lit(shards)).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"),
        floor(col("start") / budget).cast("long").as("pack_id"),
        (col("start") % budget).as("offset"),
        col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Declared packing query: shards/budget from
    * `spark.graft.pack.{shards,budget}` (defaults 64 / 2048 tokens). */
  val pipeline_pack: Q = (s, dir) => {
    val shards = s.conf.getOption("spark.graft.pack.shards").map(_.toInt)
      .getOrElse(64)
    val budget = s.conf.getOption("spark.graft.pack.budget").map(_.toInt)
      .getOrElse(2048)
    packTokens(docs(s, dir), shards, budget)
  }

  val queries: Map[String, Q] = Map(
    "text_tokens" -> text_tokens,
    "text_quality" -> text_quality,
    "text_langid" -> text_langid,
    "text_langid_planted" -> text_langid_planted,
    "text_fingerprint" -> text_fingerprint,
    "text_rarity" -> text_rarity,
    "text_bigrams" -> text_bigrams,
    "pipeline_clean" -> pipeline_clean,
    "pipeline_decontam" -> pipeline_decontam,
    "pipeline_chunk" -> pipeline_chunk,
    "pipeline_pack" -> pipeline_pack,
    "text_repetition" -> text_repetition,
    "pipeline_redact" -> pipeline_redact,
    "pipeline_chunk_dedup" -> pipeline_chunk_dedup,
  )

  /** pipeline_clean rides Dedup's session-lifetime survivor memo,
    * pipeline_decontam its shingle memo (see Dedup.memoBacked for the
    * rationale of declaring this here). */
  val memoBacked: Set[String] = Set("pipeline_clean", "pipeline_decontam")

  /** Of those, only pipeline_clean needs the survivor-labeling memo. */
  val ccBacked: Set[String] = Set("pipeline_clean")

  private val stopsSql = stops.map(s => s"'$s'").mkString(", ")

  /** Shared DuckDB CTE chain: whitespace tokens → seeded rolling hash
    * → fmix64 → per-bit majority vote → unsigned SimHash residue per
    * doc as `sigu(doc_id, u)`. Assumes a CTE `d(doc_id, text)` is in
    * scope; docs whose every token is empty fall out (callers LEFT
    * JOIN and treat absence as signature 0, the engine's all-zero
    * majority vote). Reused by Dedup's simhash oracle. Magic numbers:
    * 18446744073709551616 = 2^64, 9223372036854775808 = 2^63,
    * 8589934592 = 2^33 (the fmix64 shift as a divide on the unsigned
    * residue), 4294967296 = 2^32, and the two fmix64 multipliers
    * 0xff51afd7ed558ccd / 0xc4ceb9fe1a85ec53 as unsigned decimals. */
  private[operators] val simhashSigCtes: String =
    """toks AS (
      |  SELECT doc_id, t AS tok
      |  FROM d, UNNEST(string_split(text, ' ')) AS u(t) WHERE t <> ''
      |),
      |th AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(1125899906842597::HUGEINT,
      |        list_transform(range(1, length(tok)+1),
      |          i -> unicode(substr(tok, CAST(i AS INTEGER), 1))::HUGEINT)),
      |      (h, c) -> (31*h + c) % 18446744073709551616::HUGEINT) AS u
      |  FROM toks
      |),
      |m1 AS (SELECT doc_id, xor(u, u // 8589934592::HUGEINT) AS x FROM th),
      |m2 AS (SELECT doc_id,
      |         ((((x // 4294967296::HUGEINT) * 18397679294719823053::HUGEINT) % 4294967296::HUGEINT)
      |            * 4294967296::HUGEINT
      |          + ((x % 4294967296::HUGEINT) * 18397679294719823053::HUGEINT))
      |         % 18446744073709551616::HUGEINT AS x
      |       FROM m1),
      |m3 AS (SELECT doc_id, xor(x, x // 8589934592::HUGEINT) AS x FROM m2),
      |m4 AS (SELECT doc_id,
      |         ((((x // 4294967296::HUGEINT) * 14181476777654086739::HUGEINT) % 4294967296::HUGEINT)
      |            * 4294967296::HUGEINT
      |          + ((x % 4294967296::HUGEINT) * 14181476777654086739::HUGEINT))
      |         % 18446744073709551616::HUGEINT AS x
      |       FROM m3),
      |fm AS (SELECT doc_id, xor(x, x // 8589934592::HUGEINT) AS u FROM m4),
      |bits AS (
      |  SELECT doc_id, CAST(b AS INTEGER) AS b,
      |    SUM(CASE WHEN (u // (2::HUGEINT ^ b)::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM fm, UNNEST(range(0, 64)) AS r(b)
      |  GROUP BY doc_id, b
      |),
      |sigu AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN vote > 0 THEN (2::HUGEINT ^ b)::HUGEINT ELSE 0::HUGEINT END) AS u
      |  FROM bits GROUP BY doc_id
      |)""".stripMargin

  /** Exact DuckDB replay of TextAlgo.{rollingHash,docFingerprint,
    * simHash64} — see the scaladoc on [[oracles]] for the arithmetic;
    * the SimHash leg is the shared [[simhashSigCtes]] chain. */
  private val textFingerprintOracle: String =
    s"""WITH d AS (
      |  SELECT doc_id, text FROM documents WHERE length(text) = strlen(text)
      |),
      |$simhashSigCtes,
      |a AS (
      |  SELECT doc_id, length(text) AS n,
      |    list_transform(range(1, length(text)+1),
      |      i -> unicode(substr(text, CAST(i AS INTEGER), 1))::HUGEINT) AS cs
      |  FROM d
      |),
      |b AS (
      |  SELECT doc_id, n,
      |    list_reduce(list_prepend(1125899906842597::HUGEINT, cs),
      |      (h, c) -> (31*h + c) % 18446744073709551616::HUGEINT) AS sr,
      |    CASE WHEN n >= 16 THEN
      |      list_transform(range(1, n - 14),
      |        i -> list_reduce(list_prepend(0::HUGEINT, cs[i:i+15]),
      |               (h, c) -> (31*h + c) % 18446744073709551616::HUGEINT))
      |    END AS wins
      |  FROM a
      |),
      |fps AS (
      |  SELECT doc_id,
      |    CAST(sr - CASE WHEN sr >= 9223372036854775808::HUGEINT
      |        THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS full_hash,
      |    CASE WHEN n < 16 THEN
      |      CAST(sr - CASE WHEN sr >= 9223372036854775808::HUGEINT
      |          THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)
      |    ELSE
      |      list_min(list_transform(wins,
      |        w -> CAST(w - CASE WHEN w >= 9223372036854775808::HUGEINT
      |            THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)))
      |    END AS fingerprint
      |  FROM b
      |),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(u - CASE WHEN u >= 9223372036854775808::HUGEINT
      |        THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS simhash
      |  FROM sigu
      |)
      |SELECT f.doc_id, f.full_hash, f.fingerprint,
      |       COALESCE(s.simhash, 0) AS simhash
      |FROM fps f LEFT JOIN sh s USING (doc_id)
      |ORDER BY f.doc_id""".stripMargin

  /** lang-id is not SQL-expressible in DuckDB → rows-only (the planted
    * lang-id gate IS oracled: its oracle asserts the full planted
    * assignment, not the heuristic itself). The fingerprint key IS
    * oracled (r12): DuckDB replays the three hash recurrences exactly
    * in HUGEINT mod-2^64 arithmetic — `list_reduce` for the rolling
    * hash, windowed `list_transform`+`list_min` for the winnowing
    * fingerprint, and split 32×64-bit multiplies + `xor` for fmix64 in
    * the SimHash path (a HUGEINT is a signed int128, so a raw 64×64
    * product would overflow; `hi*c mod 2^32 · 2^32 + lo*c` stays under
    * 2^97). Signed/unsigned bridging: the oracle tracks every hash as
    * an unsigned residue in [0, 2^64) and converts to Java's signed
    * Long (`u − 2^64` when u ≥ 2^63) only where the engine compares or
    * emits — the winnowing min is taken over SIGNED values, matching
    * `if (h < min)` on Long. */
  /** Exact replay of text_rarity: same rational score on the same
    * integer inputs (bit-identical doubles — see the operator's
    * scaladoc), argmax via ROW_NUMBER (score DESC, term) ≡ the engine's
    * min(struct(-score, term)), and the near-hapax count cast to BIGINT
    * (DuckDB SUM(CASE) is HUGEINT — the pipeline_pack lesson). */
  private val textRarityOracle: String =
    """WITH d AS (
      |  SELECT doc_id, text FROM documents WHERE length(text) = strlen(text)
      |),
      |tok AS (
      |  SELECT doc_id, t AS term
      |  FROM d, UNNEST(regexp_split_to_array(TRIM(text), '\s+')) u(t)
      |  WHERE t <> ''
      |),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |s AS (
      |  SELECT t.doc_id, t.term, t.tf, f.df,
      |    t.tf * ((SELECT COUNT(*) FROM d) + 1.0) / (f.df + 1) AS score
      |  FROM tf t JOIN df f USING (term)
      |),
      |r AS (
      |  SELECT doc_id, term, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      |  FROM s
      |),
      |rare AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
      |  FROM s GROUP BY doc_id
      |)
      |SELECT r.doc_id, rare.n_rare, r.term AS top_term,
      |       ROUND(r.score, 4) AS top_score
      |FROM r JOIN rare USING (doc_id)
      |WHERE rn = 1 ORDER BY r.doc_id""".stripMargin

  /** Approximate-by-design key: text_langid's heuristic labels are
    * rows-only; the planted twin text_langid_planted is hash-oracled. */
  val approxKeys: Set[String] = Set("text_langid")

  val oracles: Map[String, String] = Map(
    "text_fingerprint" -> textFingerprintOracle,
    "text_rarity" -> textRarityOracle,
    "text_langid_planted" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INTEGER)
        |    WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
        |    WHEN 3 THEN 'es' ELSE 'zh' END AS lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipeline_chunk" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS wds
        |           FROM documents)
        |SELECT doc_id, (start - 1) // 48 AS chunk_id,
        |       LEAST(64, len(wds) - start + 1) AS n_chunk_words,
        |       array_to_string(wds[start:start+63], ' ') AS chunk
        |FROM w, UNNEST(range(1, len(wds) + 1, 48)) AS t(start)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "pipeline_pack" ->
      """WITH t AS (SELECT doc_id, doc_id % 64 AS shard,
        |                  len(regexp_split_to_array(TRIM(text), '\s+')) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               - n_tokens AS start
        |      FROM t)
        |SELECT doc_id, shard, CAST(start // 2048 AS BIGINT) AS pack_id,
        |       CAST(start % 2048 AS BIGINT) AS offset, n_tokens
        |FROM c ORDER BY doc_id""".stripMargin,
    "pipeline_decontam" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS wds
        |           FROM documents),
        |sh AS (SELECT DISTINCT doc_id, wds[i] || ' ' || wds[i+1] || ' ' || wds[i+2] AS s
        |       FROM w, UNNEST(range(1, len(wds)-1)) AS t(i)),
        |hits AS (SELECT c.doc_id AS doc_id, b.doc_id AS bench_id, COUNT(*) AS shared
        |         FROM sh c JOIN sh b ON c.s = b.s
        |         WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
        |         GROUP BY 1, 2)
        |SELECT doc_id, bench_id, shared FROM hits
        |WHERE shared >= 3 ORDER BY doc_id, bench_id""".stripMargin,
    "text_bigrams" ->
      """WITH w AS (SELECT regexp_split_to_array(TRIM(text), '\s+') AS wds
        |           FROM documents),
        |bg AS (SELECT wds[i] || ' ' || wds[i+1] AS bigram
        |       FROM w, UNNEST(range(1, len(wds))) AS t(i))
        |SELECT bigram, COUNT(*) AS cnt FROM bg
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin,
    "pipeline_clean" -> {
      val pairsSql = Dedup.jaccardOracle.replace("ORDER BY a_id, b_id", "")
      s"""WITH RECURSIVE pr AS ($pairsSql),
         |edges AS (SELECT a_id AS s, b_id AS d FROM pr
         |          UNION ALL SELECT b_id, a_id FROM pr),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s),
         |surv AS (SELECT id AS doc_id, MIN(r) AS keep_id FROM reach GROUP BY id),
         |q AS (SELECT doc_id, n_chars,
         |  CAST(LEN(list_filter(regexp_split_to_array(TRIM(text), '\\s+'),
         |    x -> x IN ($stopsSql))) AS DOUBLE)
         |    / LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS qual
         |  FROM documents)
         |SELECT q.doc_id, q.n_chars
         |FROM q JOIN surv ON q.doc_id = surv.doc_id
         |WHERE surv.doc_id = surv.keep_id AND q.qual >= 0.05
         |ORDER BY q.doc_id""".stripMargin
    },
    "pipeline_chunk_dedup" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS wds
        |           FROM documents),
        |c AS (SELECT doc_id, CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
        |             array_to_string(wds[start:start+63], ' ') AS chunk
        |      FROM w, UNNEST(range(1, len(wds) + 1, 48)) AS t(start)),
        |g AS (SELECT chunk, MIN({'doc_id': doc_id, 'chunk_id': chunk_id}) AS k,
        |             COUNT(*) AS cnt
        |      FROM c GROUP BY chunk)
        |SELECT k.doc_id AS doc_id, k.chunk_id AS chunk_id, cnt
        |FROM g ORDER BY doc_id, chunk_id""".stripMargin,
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS wds
        |           FROM documents),
        |bi AS (SELECT doc_id, COUNT(*) AS tot,
        |              COUNT(DISTINCT wds[i] || ' ' || wds[i+1]) AS dis
        |       FROM w, UNNEST(range(1, len(wds))) AS t(i) GROUP BY 1),
        |tri AS (SELECT doc_id, COUNT(*) AS tot,
        |               COUNT(DISTINCT wds[i] || ' ' || wds[i+1] || ' ' || wds[i+2]) AS dis
        |        FROM w, UNNEST(range(1, len(wds) - 1)) AS t(i) GROUP BY 1)
        |SELECT w.doc_id, CAST(len(wds) AS INTEGER) AS n_words,
        |  CAST(COALESCE(bi.tot, 0) AS INTEGER) AS n_bigrams,
        |  CAST(COALESCE(bi.dis, 0) AS INTEGER) AS n_distinct_bigrams,
        |  CAST(COALESCE(tri.tot, 0) AS INTEGER) AS n_trigrams,
        |  CAST(COALESCE(tri.dis, 0) AS INTEGER) AS n_distinct_trigrams,
        |  CASE WHEN COALESCE(bi.tot, 0) > 0
        |       THEN ROUND(CAST(bi.tot - bi.dis AS DOUBLE) / bi.tot, 5)
        |       ELSE 0.0 END AS dup_bigram_frac,
        |  CASE WHEN COALESCE(tri.tot, 0) > 0
        |       THEN ROUND(CAST(tri.tot - tri.dis AS DOUBLE) / tri.tot, 5)
        |       ELSE 0.0 END AS dup_trigram_frac
        |FROM w LEFT JOIN bi USING (doc_id) LEFT JOIN tri USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "pipeline_redact" ->
      """WITH aug AS (SELECT doc_id,
        |  text || ' contact u' || doc_id || '@ex.com from 10.0.'
        |       || (doc_id % 256) || '.' || (doc_id % 97)
        |       || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@site.org' ELSE '' END
        |       || ' ref ' || (doc_id + 7770000000) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '\b\d{7,}\b')) AS INTEGER) AS n_longnums,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{7,}\b', '<NUM>', 'g') AS redacted
        |FROM aug ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS INTEGER) AS ws_tokens,
        |  CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS INTEGER) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH w AS (SELECT doc_id, text,
        |    regexp_split_to_array(TRIM(text), '\s+') AS words FROM documents)
        |SELECT doc_id,
        |  CAST(LEN(words) AS INTEGER) AS n_words,
        |  ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS DOUBLE) / LEN(words), 5) AS mean_word_len,
        |  ROUND(CAST(LEN(list_filter(words, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / LEN(words), 5) AS stop_ratio,
        |  ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / LENGTH(text), 5) AS alpha_ratio,
        |  ROUND(LEAST(1.0, LEN(words)/200.0)*0.5
        |      + (CAST(LEN(list_filter(words, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)/LEN(words))*0.3
        |      + (CAST(LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)/LENGTH(text))*0.2, 5) AS quality_score
        |FROM w ORDER BY doc_id""".stripMargin,
  )
}
