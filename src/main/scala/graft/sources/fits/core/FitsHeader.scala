package graft.sources.fits.core

import scala.collection.immutable.ListMap

/** One parsed FITS header: ordered keyword → raw value text, plus
  * comments. FITS headers are ASCII, 80-byte cards, 2880-byte blocks,
  * terminated by an `END` card (FITS 4.0 standard §4.4; reference
  * behavior: FitsLib.scala:93-156, 513-605).
  *
  * Parsing is from the published FITS standard, with the quirks the
  * reference's tests rely on kept intact:
  *   - string values are single-quoted with `''` escaping
  *     (`OBSERVER= 'Toto l''asticot'` → `Toto l'asticot`);
  *   - the comment separator `/` is only recognized outside quotes, so
  *     column names containing `/` survive (colnames_with_slash.fits);
  *   - keyword = first 8 bytes, right-trimmed.
  */
final case class FitsHeader(
    cards: Vector[FitsCard]) {

  /** keyword → parsed value text (quotes stripped, comment removed);
    * last occurrence wins, like a plain Map built in card order. */
  val values: Map[String, String] =
    ListMap(cards.collect {
      case FitsCard(k, Some(v), _) => k -> v
    }: _*)

  /** keyword → comment (only cards that had one). */
  val comments: Map[String, String] =
    ListMap(cards.collect {
      case FitsCard(k, _, Some(c)) => k -> c
    }: _*)

  def get(key: String): Option[String] = values.get(key)
  def apply(key: String): String = values.getOrElse(key,
    throw new NoSuchElementException(
      s"FITS header has no keyword '$key' (keys: ${values.keys.mkString(", ")})"))

  def getInt(key: String): Option[Int] = get(key).map(_.trim.toInt)
  def getLong(key: String): Option[Long] = get(key).map(_.trim.toLong)
  def getBoolean(key: String): Option[Boolean] = get(key).map(_.trim == "T")
  def getDouble(key: String): Option[Double] = get(key).map(_.trim.toDouble)

  def intOr(key: String, default: Int): Int = getInt(key).getOrElse(default)
  def longOr(key: String, default: Long): Long = getLong(key).getOrElse(default)
  def doubleOr(key: String, default: Double): Double =
    getDouble(key).getOrElse(default)

  def contains(key: String): Boolean = values.contains(key)

  /** NAXISn values, 1-based, length NAXIS. */
  def axes: Vector[Long] = {
    val n = intOr("NAXIS", 0)
    (1 to n).map(i => longOr(s"NAXIS$i", 0L)).toVector
  }
}

/** One 80-byte card: keyword, optional value, optional comment. */
final case class FitsCard(
    keyword: String,
    value: Option[String],
    comment: Option[String])

object FitsHeader {
  val BlockSize = 2880
  val CardSize = 80
  val MaxKeywordSize = 8

  /** Parses raw header bytes (whole 2880-blocks, END included). */
  def parse(raw: Array[Byte]): FitsHeader = {
    val cards = Vector.newBuilder[FitsCard]
    var i = 0
    var done = false
    while (!done && i + CardSize <= raw.length) {
      val line = new String(raw, i, CardSize, "US-ASCII")
      val keyword = line.substring(0, MaxKeywordSize).trim
      if (keyword == "END") done = true
      else if (keyword.nonEmpty) cards += parseCard(keyword, line)
      i += CardSize
    }
    FitsHeader(mergeContinuations(cards.result()))
  }

  /** OGIP long-string convention (FITS 4.0 §4.2.1.2): a quoted value
    * ending in `&` is continued by the following CONTINUE card(s); the
    * `&` is dropped and the continuation text appended. An `&`-less
    * value followed by CONTINUE, or an orphan CONTINUE, is left as-is. */
  private def mergeContinuations(cards: Vector[FitsCard]): Vector[FitsCard] = {
    val out = Vector.newBuilder[FitsCard]
    var idx = 0
    while (idx < cards.length) {
      val c = cards(idx)
      if (c.value.exists(_.endsWith("&")) && idx + 1 < cards.length &&
        cards(idx + 1).keyword == "CONTINUE") {
        var v = c.value.get
        var com = c.comment
        var j = idx + 1
        while (v.endsWith("&") && j < cards.length &&
          cards(j).keyword == "CONTINUE") {
          val (cv, cc) = splitValueComment(cards(j).comment.getOrElse(""))
          v = v.dropRight(1) + cv
          if (cc.isDefined) com = cc
          j += 1
        }
        out += FitsCard(c.keyword, Some(v), com)
        idx = j
      } else {
        out += c
        idx += 1
      }
    }
    out.result()
  }

  /** Commentary keywords never carry a value indicator (FITS 4.0
    * §4.4.2.4) — `COMMENT = like this` is free text starting with '='. */
  private val commentaryKeywords = Set("COMMENT", "HISTORY", "CONTINUE")

  private def parseCard(keyword: String, line: String): FitsCard = {
    // Value indicator: "= " at bytes 8-9 (fixed by the standard).
    if (!commentaryKeywords.contains(keyword) && keyword != "HIERARCH" &&
      line.length > 10 && line.charAt(8) == '=') {
      val field = line.substring(10)
      val (value, comment) = splitValueComment(field)
      FitsCard(keyword, Some(value), comment)
    } else if (keyword == "HIERARCH" && line.indexOf('=') > MaxKeywordSize) {
      // ESO HIERARCH convention: the real (long, space-separated)
      // keyword runs from byte 8 to the `=`; stored without the
      // HIERARCH prefix, astropy-style ("ESO TEL AIRM START").
      val eq = line.indexOf('=')
      val key = line.substring(MaxKeywordSize, eq).trim
      val (value, comment) = splitValueComment(line.substring(eq + 1))
      FitsCard(key, Some(value), comment)
    } else {
      // COMMENT / HISTORY / blank-keyword cards: free text, no value.
      FitsCard(keyword, None, Some(line.substring(MaxKeywordSize).trim))
    }
  }

  /** Splits the value field from its `/ comment`, honoring quoting. */
  private[core] def splitValueComment(field: String): (String, Option[String]) = {
    val s = field
    var i = 0
    while (i < s.length && s.charAt(i) == ' ') i += 1
    if (i < s.length && s.charAt(i) == '\'') {
      // Quoted string; '' is an escaped quote.
      val sb = new StringBuilder
      var j = i + 1
      var closed = false
      while (!closed && j < s.length) {
        val c = s.charAt(j)
        if (c == '\'') {
          if (j + 1 < s.length && s.charAt(j + 1) == '\'') { sb += '\''; j += 2 }
          else { closed = true; j += 1 }
        } else { sb += c; j += 1 }
      }
      val comment = commentAfter(s, j)
      // FITS pads string values with trailing blanks: trim right only.
      (trimRight(sb.result()), comment)
    } else {
      val slash = s.indexOf('/')
      if (slash >= 0)
        (s.substring(0, slash).trim,
          Some(s.substring(slash + 1).trim).filter(_.nonEmpty))
      else (s.trim, None)
    }
  }

  private def commentAfter(s: String, from: Int): Option[String] = {
    val slash = s.indexOf('/', from)
    if (slash >= 0) Some(s.substring(slash + 1).trim).filter(_.nonEmpty)
    else None
  }

  private def trimRight(s: String): String = {
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == ' ') end -= 1
    s.substring(0, end)
  }
}
