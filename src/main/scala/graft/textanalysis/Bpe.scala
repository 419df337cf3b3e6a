package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real byte-pair-encoding with a learned merges table (SURVEY §7.5's
  * tokenizer-parity item; reference analog: the chars/4 estimator at
  * llm_executor.py:389-397 — this goes beyond it as far as offline
  * allows: no tiktoken twin exists on the JVM, so the merges are trained
  * from the corpus itself, the standard subword-nmt recipe).
  *
  * Training (Sennrich et al. 2016, arXiv:1508.07909) runs on the WORD
  * FREQUENCY table, not the raw corpus — that is how production BPE
  * trainers work too, and it is what makes corpus-scale training cheap:
  * the distributed part is one `groupBy(token).count()` (map-side
  * combinable); the driver part iterates over the distinct-type table
  * only (Zipf-bounded, capped at `maxTypes`).
  *
  * Encoding applies merges IN LEARNED ORDER, each as a left-to-right
  * non-overlapping pair substitution — subword-nmt's reference `apply`
  * semantics. The trick that keeps the hot path expression-only (no UDF,
  * no mapPartitions): a token is rendered as its characters each wrapped
  * in a reserved separator (`⟂a⟂⟂b⟂`, ⟂ = U+001F), and one
  * merge (a,b)→ab is then EXACTLY a literal `replace` of
  * `⟂a⟂⟂b⟂` with `⟂ab⟂` — `replace` is left-to-right non-overlapping and
  * never rescans its own output, which is precisely BPE's per-merge pass.
  * Wrapping each symbol in its OWN separator pair (not a shared
  * delimiter) is load-bearing: adjacent matches must not share
  * characters, or `replace` would skip every other occurrence
  * ("a b a b" must become "ab ab", not "ab a b"). The same chain is
  * emitted as DuckDB SQL by [[oracleEncodeSql]], so both engines run the
  * IDENTICAL merge fold — full hash-checkability with zero shared code.
  *
  * Scale shape: encoding cost is per DISTINCT token (types ≪
  * occurrences), joined back to the corpus on the token string; the
  * merges table itself is compiled into the expression (fine for the
  * committed 24-merge table; a 50k-merge production vocab would switch
  * the distinct-type encode to `mapPartitions` over a broadcast ranks
  * map — same join-back shape, documented here as the upgrade path).
  */
object Bpe {

  /** Reserved symbol separator. Tokens are stripped of it pre-encode
    * (both engines), so symbol boundaries can never be forged. U+001F is
    * not matched by `\s`, so the pre-tokenizer could in principle pass it
    * through — the strip closes that hole. */
  val Sep = "\u001f"

  /** Frozen merges, trained from `/root/testdata/sf0.001/documents.parquet`
    * with `trainMergesFromCorpus(docs, 24)` — BpeSpec re-trains and pins
    * this list, so the constant can never drift from the trainer. A
    * fixed (rather than per-run-trained) table is what makes the declared
    * query oracle-checkable at ANY scale factor: both engines must fold
    * the same merges. */
  val MergesV1: Seq[(String, String)] = Seq(
    (" ", "s"),
    ("e", "r"),
    ("o", "r"),
    ("i", "n"),
    ("o", "w"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    (" ", "a"),
    (" ", "v"),
    ("a", "s"),
    (" ", "c"),
    ("m", "er"),
    ("a", "t"),
    (" ", "f"),
    (" ", "t"),
    (" ", "b"),
    ("a", "n"),
    ("c", "an"),
    ("lu", "m"),
    ("lum", "n"),
    ("o", "lumn"),
    ("d", "ow"),
    ("in", "dow")
  )

  /** Classic BPE training over a (token, frequency) table: start from
    * characters, repeatedly merge the globally most frequent adjacent
    * symbol pair. Deterministic tie-break: highest count, then
    * lexicographically smallest (a, b). */
  def trainMerges(
      tokenCounts: Seq[(String, Long)],
      nMerges: Int
  ): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      tokenCounts.map { case (t, c) =>
        (t.replace(Sep, "").map(_.toString).toVector, c)
      }
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) =
          counts.getOrElse((syms(j), syms(j + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val (a, b) = best
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), c)
        }
        i += 1
      }
    }
    merges.result()
  }

  /** Distributed token-frequency count (one map-side-combinable groupBy,
    * top `maxTypes` by count then token — a bounded TakeOrdered, no
    * global sort) feeding the driver-side trainer. */
  def trainMergesFromCorpus(
      docs: DataFrame,
      nMerges: Int,
      maxTypes: Int = 10000
  ): Seq[(String, String)] = {
    val counts = docs
      .select(explode(
        regexp_extract_all(
          col("text"),
          lit(graft.queries.TextQueries.BpePattern), lit(0))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(maxTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainMerges(counts, nMerges)
  }

  /** Encode `tok`: strip the reserved separator, wrap every character in
    * its own separator pair, fold the merges in learned order. The result
    * is the wrapped form: each subword sits between its own `⟂…⟂`. */
  def encodeExpr(tok: Column, merges: Seq[(String, String)]): Column = {
    val wrapped = regexp_replace(
      replace(tok, lit(Sep), lit("")), "(.)", Sep + "$1" + Sep)
    merges.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))
    }
  }

  /** Subword count of an encoded (wrapped) token: every symbol carries
    * exactly two separators. */
  def subwordCount(enc: Column): Column =
    ((length(enc) - length(replace(enc, lit(Sep), lit("")))) / 2)
      .cast("long")

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
  private def sepWrap(sym: String): String =
    s"chr(31)||${sqlLit(sym)}||chr(31)"

  /** The DuckDB twin of [[encodeExpr]] over SQL expression `tokExpr` —
    * same strip, same wrap, same merge fold, generated from the same
    * merges table. */
  def oracleEncodeSql(
      tokExpr: String, merges: Seq[(String, String)]): String = {
    val wrapped =
      s"regexp_replace(replace($tokExpr, chr(31), ''), '(.)', chr(31)||'\\1'||chr(31), 'g')"
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"replace($acc, ${sepWrap(a)}||${sepWrap(b)}, ${sepWrap(a + b)})"
    }
  }

  /** DuckDB subword count over encoded expression `encExpr`. */
  def oracleSubwordCountSql(encExpr: String): String =
    s"(length($encExpr) - length(replace($encExpr, chr(31), ''))) // 2"
}
