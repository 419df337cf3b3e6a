package graft.textanalysis

import graft.SparkSuite
import org.apache.spark.sql.Row

/** Rule-by-rule behavior of the Gopher repetition battery on synthetic
  * documents, plus the interval-union no-double-counting property the
  * duplicate-gram rules depend on. */
class RepetitionSpec extends SparkSuite {

  // 60 distinct words over 6 lines — no repeated line, no repeated gram.
  private val cleanText = (0 until 60)
    .map(i => s"w$i")
    .grouped(10)
    .map(_.mkString(" "))
    .mkString("\n")

  private def run(
      docs: Seq[(Long, String)],
      topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5, 10)): Map[Long, Row] = {
    import spark.implicits._
    Repetition
      .repetitionFilters(docs.toDF("doc_id", "text"), "doc_id", "text",
        topNs, dupNs)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
  }

  private def flag(r: Row, name: String): Boolean =
    r.getBoolean(r.fieldIndex(name))
  private def n(r: Row, name: String): Long =
    r.getLong(r.fieldIndex(name))

  test("a repetition-free document passes every rule with zero counts") {
    val r = run(Seq(1L -> cleanText))(1L)
    assert(n(r, "n_words") === 60L)
    assert(n(r, "n_lines") === 6L)
    assert(n(r, "n_dup_lines") === 0L)
    assert(n(r, "dup_line_chars") === 0L)
    assert(n(r, "top2_cnt") === 1L)
    assert(n(r, "dup5_tokens") === 0L)
    assert(n(r, "dup10_tokens") === 0L)
    Seq("r_dup_line", "r_dup_line_char", "r_top2", "r_top3", "r_top4",
      "r_dup5", "r_dup10", "pass_repetition")
      .foreach(f => assert(flag(r, f), s"$f unexpectedly false"))
  }

  test("duplicate-line fraction counts every occurrence and trips at >30%") {
    // 4 lines, two of them identical: 2/4 = 50% duplicate lines.
    val text = Seq("same line here", "unique one", "same line here", "other")
      .mkString("\n")
    val r = run(Seq(1L -> text))(1L)
    assert(n(r, "n_lines") === 4L)
    assert(n(r, "n_dup_lines") === 2L)
    assert(n(r, "dup_line_chars") === 2L * "same line here".length)
    assert(!flag(r, "r_dup_line"))
    assert(!flag(r, "pass_repetition"))
  }

  test("duplicate-line CHAR fraction can trip while the line fraction passes") {
    // 10 lines, 2 duplicates (20% ≤ 30% → line rule passes) but the
    // duplicated line is huge: char rule fails.
    val big = "x".*(200)
    val text = (Seq(big, big) ++ (0 until 8).map(i => s"s$i")).mkString("\n")
    val r = run(Seq(1L -> text))(1L)
    assert(flag(r, "r_dup_line"))
    assert(!flag(r, "r_dup_line_char"))
  }

  test("top-2-gram coverage trips on a dominant bigram") {
    // "ab ab ab ..." — the bigram "ab_ab" occurs 19 times in 20 words;
    // coverage 19*2/20 >> 20%.
    val text = Seq.fill(20)("ab").mkString(" ")
    val r = run(Seq(1L -> text))(1L)
    assert(n(r, "top2_cnt") === 19L)
    assert(!flag(r, "r_top2"))
    assert(!flag(r, "pass_repetition"))
  }

  test("duplicate-5-gram coverage merges overlapping occurrences (interval union)") {
    // 'a b c d e f' twice + 55 unique filler words: every 5-window inside
    // each copy repeats, but union coverage is exactly 2×6 = 12 tokens.
    val span = "a b c d e f"
    val filler = (0 until 55).map(i => s"u$i").mkString(" ")
    val text = s"$span $filler $span"
    val r = run(Seq(1L -> text))(1L)
    assert(n(r, "n_words") === 67L)
    assert(n(r, "dup5_tokens") === 12L)
    // 12/67 ≈ 17.9% > 15% → rule fails.
    assert(!flag(r, "r_dup5"))
    // no repeated 10-gram anywhere.
    assert(n(r, "dup10_tokens") === 0L)
    assert(flag(r, "r_dup10"))
  }

  test("documents shorter than the gram width produce zero counts for it") {
    val r = run(Seq(1L -> "just three words"))(1L)
    assert(n(r, "top4_cnt") === 0L)
    assert(n(r, "dup5_tokens") === 0L)
    // zero-gram rules trivially pass...
    Seq("r_top4", "r_dup5", "r_dup10").foreach(f => assert(flag(r, f)))
    // ...but a tiny doc's single bigram covers 2/3 > 20%: the top rules
    // are only meaningful above the word-count floor (the battery
    // composes with gopherFilters' r_word_count, as in the paper).
    assert(!flag(r, "r_top2"))
  }

  test("stats are per-document: a repeated line across two docs is not a duplicate") {
    val rs = run(Seq(
      1L -> Seq("shared line", "alpha beta", "gamma delta").mkString("\n"),
      2L -> Seq("shared line", "epsilon zeta", "eta theta").mkString("\n")))
    assert(n(rs(1L), "n_dup_lines") === 0L)
    assert(n(rs(2L), "n_dup_lines") === 0L)
    assert(flag(rs(1L), "r_dup_line"))
  }

  test("brute-force cross-check of duplicate-gram union coverage on random docs") {
    val rnd = new scala.util.Random(42)
    // Small vocab forces plenty of repeated grams.
    val docs = (0L until 12L).map { id =>
      id -> (0 until 80).map(_ => s"t${rnd.nextInt(6)}").mkString(" ")
    }
    val got = run(docs, topNs = Seq(2), dupNs = Seq(5))
    docs.foreach { case (id, text) =>
      val wd = text.toLowerCase.split("\\s+").toSeq
      val grams = wd.sliding(5).toSeq.zipWithIndex
        .map { case (g, i) => (g.mkString("_"), i) }
      val counts = grams.groupBy(_._1).view.mapValues(_.size).toMap
      val covered = grams.filter(g => counts(g._1) >= 2)
        .flatMap { case (_, i) => i until i + 5 }.toSet
      assert(n(got(id), "dup5_tokens") === covered.size.toLong,
        s"doc $id union coverage mismatch")
      val top2 = wd.sliding(2).toSeq.groupBy(identity)
        .values.map(_.size).max
      assert(n(got(id), "top2_cnt") === top2.toLong, s"doc $id top2")
    }
  }
}
