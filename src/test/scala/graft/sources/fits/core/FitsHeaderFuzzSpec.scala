package graft.sources.fits.core

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial header-card parsing: embedded quotes, slashes inside
  * strings vs comment separators, value/comment ambiguity, blank and
  * overlong fields — the cases the reference's parser is known to be
  * fragile on (FitsLib.scala:93-140).
  */
class FitsHeaderFuzzSpec extends AnyFunSuite {

  private def pad(s: String, n: Int): String =
    if (s.length >= n) s.take(n) else s + " " * (n - s.length)

  private def mkHeader(cards: Seq[String]): FitsHeader = {
    val all = (cards :+ pad("END", 80)).map(pad(_, 80)).mkString
    val padded = all + " " * ((2880 - all.length % 2880) % 2880)
    FitsHeader.parse(padded.getBytes("US-ASCII"))
  }

  test("escaped quotes inside strings") {
    val h = mkHeader(Seq(
      pad("OBSERVER", 8) + "= 'Toto l''asticot'",
      pad("WEIRD", 8) + "= '''lead' / trailing quote comment",
      pad("EMPTY", 8) + "= ''",
      pad("BLANKS", 8) + "= '  padded   '"))
    assert(h("OBSERVER") == "Toto l'asticot")
    assert(h("WEIRD") == "'lead")
    assert(h.comments("WEIRD") == "trailing quote comment")
    assert(h("EMPTY") == "")
    assert(h("BLANKS") == "  padded") // right-trim only, per FITS
  }

  test("slashes inside quoted strings are not comment separators") {
    val h = mkHeader(Seq(
      pad("TTYPE1", 8) + "= 'RA/deg  '",
      pad("TTYPE2", 8) + "= 'a/b/c   ' / real comment"))
    assert(h("TTYPE1") == "RA/deg")
    assert(h("TTYPE2") == "a/b/c")
    assert(h.comments("TTYPE2") == "real comment")
  }

  test("numeric, boolean and comment-only values") {
    val h = mkHeader(Seq(
      pad("BITPIX", 8) + "= 8 / bits",
      pad("SCALE", 8) + "= -1.5E-3",
      pad("FLAG", 8) + "= T",
      pad("NOVAL", 8) + "=",
      "COMMENT here is free text / with a slash",
      "HISTORY processed twice"))
    assert(h.getInt("BITPIX").contains(8))
    assert(h("SCALE") == "-1.5E-3")
    assert(h.getBoolean("FLAG").contains(true))
    assert(h("NOVAL") == "")
    // commentary keywords carry no value but are retained as cards
    assert(h.cards.exists(c => c.keyword == "COMMENT" &&
      c.comment.exists(_.contains("free text"))))
  }

  test("duplicate keywords: last occurrence wins") {
    val h = mkHeader(Seq(
      pad("KEY", 8) + "= 1",
      pad("KEY", 8) + "= 2"))
    assert(h("KEY") == "2")
  }

  test("multi-block header (END in the second block)") {
    val cards = (1 to 40).map(i => pad(f"K$i%03d", 8) + s"= $i")
    val h = mkHeader(cards)
    assert(h.values.size == 40)
    assert(h("K040") == "40")
  }

  test("random printable values round-trip as raw text") {
    val rnd = new scala.util.Random(11)
    val safe = (' ' to '~').filterNot(c => c == '\'' || c == '/')
    val values = (0 until 30).map { _ =>
      (0 until rnd.nextInt(18)).map(_ => safe(rnd.nextInt(safe.length)))
        .mkString.trim
    }
    val cards = values.zipWithIndex.map { case (v, i) =>
      pad(f"V$i%03d", 8) + s"= '$v'"
    }
    val h = mkHeader(cards)
    values.zipWithIndex.foreach { case (v, i) =>
      assert(h(f"V$i%03d") == v, s"value '$v'")
    }
  }
}
