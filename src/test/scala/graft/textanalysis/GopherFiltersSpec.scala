package graft.textanalysis

import graft.SparkSuite
import org.apache.spark.sql.Row

/** Rule-by-rule behavior of the C4/Gopher quality battery on synthetic
  * documents — the fixture corpus is single-line, so the line-based rules
  * (bullets, ellipses) are exercised here with real multi-line text. */
class GopherFiltersSpec extends SparkSuite {

  private val goodText =
    (("the data and that of a pipeline have run with care " * 6).trim)

  private def run(docs: Seq[(Long, String)]): Map[Long, Row] = {
    import spark.implicits._
    TextAnalysis.gopherFilters(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
  }

  private def flag(r: Row, name: String): Boolean =
    r.getBoolean(r.fieldIndex(name))

  test("a clean document passes every rule") {
    val r = run(Seq(1L -> goodText))(1L)
    Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_bullet",
      "r_ellipsis", "r_alpha", "r_stopword", "pass_gopher")
      .foreach(f => assert(flag(r, f), s"$f unexpectedly false"))
  }

  test("word-count band rejects too-short documents") {
    val r = run(Seq(1L -> "the and of short"))(1L)
    assert(!flag(r, "r_word_count"))
    assert(!flag(r, "pass_gopher"))
  }

  test("mean-word-length band rejects strings of one-char words and of very long words") {
    val short = run(Seq(1L -> ("a b c d e " * 12).trim))(1L)
    assert(!flag(short, "r_mean_word_len"))
    val long = run(Seq(
      1L -> (("supercalifragilistic " * 55).trim)))(1L)
    assert(!flag(long, "r_mean_word_len"))
  }

  test("symbol-to-word ratio rejects hash/ellipsis-riddled text") {
    val r = run(Seq(1L -> ((goodText.split(" ").take(60)
      .map(w => s"$w ##") mkString " "))))(1L)
    assert(!flag(r, "r_symbol_ratio"))
  }

  test("bullet-line fraction rejects documents that are almost all bullets") {
    // 10 lines, 10 bullets: 100% > 90% threshold.
    val bullets = (1 to 10).map(i => s"- ${goodText.take(60)}").mkString("\n")
    val r = run(Seq(1L -> bullets))(1L)
    assert(!flag(r, "r_bullet"))
    // 9 of 10 bullet lines is exactly at the ≤90% boundary: passes.
    val nine = ((1 to 9).map(_ => s"* item of the list") :+ "a closing line")
      .mkString("\n")
    assert(flag(run(Seq(2L -> nine))(2L), "r_bullet"))
  }

  test("ellipsis-line fraction rejects trailing-ellipsis listicles") {
    val dots = (1 to 10).map(_ => s"read more about the thing...")
      .mkString("\n")
    val r = run(Seq(1L -> dots))(1L)
    assert(!flag(r, "r_ellipsis"))
    // Unicode ellipsis counts too.
    val uni = (1 to 10).map(_ => s"read more about the thing…").mkString("\n")
    assert(!flag(run(Seq(2L -> uni))(2L), "r_ellipsis"))
    // 3 of 10 is at the ≤30% boundary: passes.
    val three = ((1 to 3).map(_ => "teaser...") ++
      (1 to 7).map(_ => "a normal line of the text")).mkString("\n")
    assert(flag(run(Seq(3L -> three))(3L), "r_ellipsis"))
  }

  test("alphabetic-word fraction rejects number-dominated text") {
    val nums = (1 to 100).map(_.toString).mkString(" ")
    val r = run(Seq(1L -> nums))(1L)
    assert(!flag(r, "r_alpha"))
  }

  test("stopword rule needs at least two distinct Gopher stopwords") {
    // "the" alone (1 distinct stopword) fails; counts are presence, not
    // occurrences.
    val onlyThe = ("the " * 60).trim
    assert(!flag(run(Seq(1L -> onlyThe))(1L), "r_stopword"))
    val two = (("the quick brown fox jumped with vigor " * 8).trim)
    assert(flag(run(Seq(2L -> two))(2L), "r_stopword"))
  }

  test("counts are exact on a known document") {
    val text = "- one of the...\n* two with the…\nplain and final line"
    val r = run(Seq(1L -> text))(1L)
    assert(r.getLong(r.fieldIndex("n_lines")) == 3L)
    assert(r.getLong(r.fieldIndex("n_bullet_lines")) == 2L)
    assert(r.getLong(r.fieldIndex("n_ellipsis_lines")) == 2L)
    assert(r.getLong(r.fieldIndex("n_words")) == 12L)
  }
}
