package graft.functions

/** Deterministic text algorithms used by the custom Catalyst expressions.
  *
  * Declared as a companion object of a class so Scala emits static
  * forwarders — generated whole-stage code can call
  * `graft.functions.TextAlgo.rollingHash(...)` as a plain static method.
  */
class TextAlgo private ()

object TextAlgo {

  /** Polynomial rolling hash (Rabin–Karp, base 31, 64-bit wraparound)
    * of the whole string. */
  def rollingHash(s: String): Long = {
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  /** Document fingerprint: minimum rolling hash over all character
    * k-grams (k=16) — a 1-element winnowing sketch. Equal fingerprints
    * ⇒ the documents share at least one 16-char window; stable under
    * appends far from the minimizing window. */
  def docFingerprint(s: String): Long = {
    val k = 16
    if (s.length < k) return rollingHash(s)
    // precompute 31^(k-1) for the rolling update
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= 31; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = 31 * h + s.charAt(i); i += 1 }
    var min = h
    i = k
    while (i < s.length) {
      h = 31 * (h - s.charAt(i - k) * pow) + s.charAt(i)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** 64-bit SimHash over whitespace tokens: each token hashes to 64
    * bits; bit-wise majority vote forms the signature. Near-identical
    * token multisets ⇒ small Hamming distance. */
  def simHash64(s: String): Long = {
    val counts = new Array[Int](64)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          var h = 1125899906842597L
          var j = start
          while (j < i) { h = 31 * h + s.charAt(j); j += 1 }
          // finalize (splitmix64) so low-entropy token hashes spread
          h = fmix64(h)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  @inline def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Per-position hashes of the k-word shingles of a whitespace-
    * tokenized string, in one pass with no per-shingle string
    * materialization. Token hashes roll over the text; a shingle hash
    * is the order-sensitive combination of k consecutive token hashes.
    * Keeps multiplicity and order (n-gram frequency counting).
    */
  def wordNgramHashes(s: String, k: Int): Array[Long] = {
    // token hashes
    val tokens = new scala.collection.mutable.ArrayBuffer[Long](64)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(s.charAt(i))) {
        if (i > start) {
          var h = 1125899906842597L
          var j = start
          while (j < i) { h = 31 * h + s.charAt(j); j += 1 }
          tokens += fmix64(h)
        }
        start = i + 1
      }
      i += 1
    }
    val m = tokens.length - k + 1
    if (m <= 0) return Array.empty
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = fmix64(h ^ tokens(i + j)) ^ (j + 1); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** The k-word n-grams of `s` whose hash (same scheme as
    * [[wordNgramHashes]]) is in `sortedKeep`, as single-space-joined
    * strings. One pass; strings are materialized ONLY for matches —
    * with |keep| ≈ 50 candidates out of millions of corpus n-grams,
    * the non-candidate 99.99% never allocates anything. Lookup is
    * binary search (no boxing) on the sorted candidate array. */
  def wordNgramFiltered(s: String, k: Int, sortedKeep: Array[Long]): Array[String] = {
    // token hashes + char offsets, one scan
    val hashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(s.charAt(i))) {
        if (i > start) {
          var h = 1125899906842597L
          var j = start
          while (j < i) { h = 31 * h + s.charAt(j); j += 1 }
          hashes += fmix64(h); starts += start; ends += i
        }
        start = i + 1
      }
      i += 1
    }
    val m = hashes.length - k + 1
    if (m <= 0) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[String](4)
    i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = fmix64(h ^ hashes(i + j)) ^ (j + 1); j += 1 }
      if (java.util.Arrays.binarySearch(sortedKeep, h) >= 0) {
        val sb = new java.lang.StringBuilder(ends(i + k - 1) - starts(i))
        j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(s, starts(i + j), ends(i + j))
          j += 1
        }
        out += sb.toString
      }
      i += 1
    }
    out.toArray
  }

  /** [[wordNgramFiltered]] with UTF8String elements, for direct use
    * from generated code (`new GenericArrayData(...)` over the result). */
  def wordNgramFilteredUtf8(s: String, k: Int,
      sortedKeep: Array[Long]): Array[AnyRef] = {
    val strs = wordNgramFiltered(s, k, sortedKeep)
    val out = new Array[AnyRef](strs.length)
    var i = 0
    while (i < strs.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(strs(i))
      i += 1
    }
    out
  }

  /** Distinct variant of [[wordNgramHashes]], sorted-distinct (set
    * semantics for Jaccard). */
  /** Distinct whitespace tokens of `s` with their in-document counts,
    * sorted by token (deterministic output order). One pass over the
    * text — the per-document TF side of corpus-weighted term scoring
    * ([[graft.operators.TextOps.text_rarity]]) without shuffling every
    * token occurrence. Tokenization matches [[wordNgramHashes]]
    * (`Character.isWhitespace` runs, empties skipped). */
  def tokenTf(s: String): Array[(String, Int)] = {
    val counts = new scala.collection.mutable.HashMap[String, Int]()
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(s.charAt(i))) {
        if (i > start) {
          val t = s.substring(start, i)
          counts.update(t, counts.getOrElse(t, 0) + 1)
        }
        start = i + 1
      }
      i += 1
    }
    counts.toArray.sortBy(_._1)
  }

  def wordShingleHashes(s: String, k: Int): Array[Long] = {
    val out = wordNgramHashes(s, k)
    val m = out.length
    if (m == 0) return out
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var w = 0
    var i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    if (w == m) out else java.util.Arrays.copyOf(out, w)
  }

  // ------------------------------------------------------------ lang-id

  private val stopwords: Map[String, Map[String, Double]] = Map(
    "en" -> weight("the", "and", "of", "to", "is", "in", "that", "it",
      "for", "was", "with", "are", "this", "not", "you"),
    "de" -> weight("der", "die", "das", "und", "ist", "nicht", "mit",
      "ein", "eine", "zu", "den", "von", "sich", "auf", "für"),
    "fr" -> weight("le", "les", "et", "est", "une", "des", "que", "pour",
      "dans", "qui", "pas", "sur", "au", "avec", "ne"),
    "es" -> weight("el", "los", "las", "y", "es", "una", "que", "por",
      "con", "para", "su", "se", "lo", "como", "más"))
  // "la","un","de","en" are ambiguous across fr/es/en — excluded.

  private def weight(ws: String*): Map[String, Double] =
    ws.map(_ -> 1.0).toMap

  /** Heuristic language ID: CJK-ratio shortcut for zh, else stopword
    * vote across {en, de, fr, es}; "und" (unknown) when no evidence. */
  def langId(s: String): String = {
    if (s == null || s.isEmpty) return "und"
    var cjk = 0
    var letters = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val block = Character.UnicodeBlock.of(c)
        if (block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
          block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
          block == Character.UnicodeBlock.HIRAGANA ||
          block == Character.UnicodeBlock.KATAKANA) cjk += 1
      }
      i += 1
    }
    if (letters > 0 && cjk.toDouble / letters > 0.2) return "zh"
    val scores = scala.collection.mutable.Map("en" -> 0.0, "de" -> 0.0,
      "fr" -> 0.0, "es" -> 0.0)
    s.toLowerCase.split("[^\\p{L}']+").foreach { w =>
      stopwords.foreach { case (lang, ws) =>
        ws.get(w).foreach(v => scores(lang) += v)
      }
    }
    val (best, score) = scores.maxBy(_._2)
    if (score == 0.0) "und" else best
  }
}
