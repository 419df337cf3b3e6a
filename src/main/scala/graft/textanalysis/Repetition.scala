package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The REPETITION half of the published Gopher quality battery (Rae et
  * al. 2021, "Scaling Language Models: Methods, Analysis & Insights from
  * Training Gopher", §A1.1 Table A1): documents dominated by repeated
  * lines or n-grams are low-quality boilerplate/spam and measurably hurt
  * LMs. [[TextAnalysis.gopherFilters]] covers the battery's static rules
  * (word count, symbol ratio, bullets, stopwords); this operator covers
  * the repetition rules:
  *
  *  - `r_dup_line`: ≤ 30% of lines are duplicates of another line;
  *  - `r_dup_line_char`: ≤ 20% of characters sit in duplicate lines;
  *  - `r_top{n}` (n = 2,3,4): the most frequent word n-gram covers
  *    ≤ {20,18,16}% of the document (counting overlapping occurrences,
  *    as the paper does for the top-gram rule);
  *  - `r_dup{n}` (n = 5..10): word positions covered by any n-gram that
  *    occurs ≥ 2 times in the document make up ≤ {15,14,13,12,11,10}% —
  *    overlapping occurrences are merged by interval union so each
  *    position counts once (the paper's no-double-counting rule).
  *
  * The paper states the gram rules in characters; this engine states
  * them in word positions (tokens) — the same signal, but exact-integer
  * on both engines (char accounting would need per-position prefix sums
  * for zero additional selectivity). Every threshold is an integer
  * cross-multiplication, so Spark and the DuckDB oracle agree
  * bit-for-bit. As in the paper, the top-gram rules are meaningful only
  * above the word-count floor (a 3-word document's single bigram
  * "covers" 67%); the battery composes with
  * [[TextAnalysis.gopherFilters]]'s `r_word_count`.
  *
  * Scale shape (100 TB): all statistics are PER-DOCUMENT, so every
  * shuffle key is doc-scoped — (id, n, fingerprint) for gram counts,
  * (id, n) for the interval union, (id, line) for line groups — and no
  * two documents ever interact: partition-parallel end to end, no
  * corpus-wide hotspot key, no window wider than one document. Grams are
  * hashed to 60-bit longs pre-shuffle (same md5 slice as the dedup
  * family), so the wide shuffles carry 8-byte keys, not gram strings.
  * The words/lines arrays are materialized once (localCheckpoint) and
  * feed every branch; the exploded gram frame is likewise materialized
  * once for its two consumers (top-gram counts, duplicate-gram islands).
  */
object Repetition {

  /** Gopher Table A1 thresholds, in percent. Top-gram rules: fraction of
    * the document the single most frequent n-gram covers. */
  val TopGramMaxPct: Map[Int, Int] = Map(2 -> 20, 3 -> 18, 4 -> 16)

  /** Duplicate-gram rules: fraction of the document covered by grams
    * occurring more than once (interval-union, counted once). */
  val DupGramMaxPct: Map[Int, Int] =
    Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)

  val DupLineMaxPct = 30
  val DupLineCharMaxPct = 20

  /** Width-tagged positional shingles: `struct(n, pos, s)` per gram, in
    * ONE transform over an already-materialized words array (same
    * discipline as [[Dedup.posShingles]] — n element_at calls per gram,
    * never a nested array rebuild). */
  private def taggedShingles(w: Column, n: Int): Column =
    when(
      size(w) < n,
      expr("CAST(array() AS array<struct<n:int,pos:int,s:string>>)"))
      .otherwise(
        transform(
          sequence(lit(1), size(w) - (n - 1)),
          i => {
            val pieces = (0 until n)
              .map(k => element_at(w, (i + lit(k)).cast("int")))
            struct(
              lit(n).as("n"),
              (i - 1).cast("int").as("pos"),
              concat(pieces.flatMap(p => Seq(p, lit("_"))).dropRight(1): _*)
                .as("s"))
          }))

  /** Per-document repetition statistics + rule verdicts. `topNs` /
    * `dupNs` select which gram rules run (each n is one more explode of
    * the token stream — callers bound cost by choosing the subset they
    * filter on). Output: doc stats, per-rule counts, per-rule booleans,
    * and `pass_repetition` (AND of all selected rules). */
  def repetitionFilters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5, 10)
  ): DataFrame = {
    require(topNs.forall(TopGramMaxPct.contains), s"unsupported topNs $topNs")
    require(dupNs.forall(DupGramMaxPct.contains), s"unsupported dupNs $dupNs")

    // One text scan: chars, lines array, words array — materialized once
    // for the line branch, the gram branch, and the final stats join.
    // Spread before the split-heavy projection (round-16, guide §2.5;
    // see [[Dedup.spreadNarrow]]) — the checkpoint then also holds
    // core-count partitions, so every downstream branch's map side is
    // parallel instead of inheriting the single-file scan's one.
    val base = Dedup.spreadNarrow(df)
      .select(
        col(idCol).as("id"),
        length(col(textCol)).cast("long").as("n_chars"),
        split(col(textCol), "\n").as("ln"),
        Dedup.words(col(textCol)).as("wd"))
      .localCheckpoint(true)

    // Duplicate-line stats: group occurrences of each exact line within a
    // doc; lines whose count ≥ 2 are duplicates (every occurrence counts,
    // as in the paper). Chars of a duplicate line count once per
    // occurrence.
    val lineStats = base
      .select(col("id"), explode(col("ln")).as("line"))
      .groupBy("id", "line")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("id")
      .agg(
        sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("n_dup_lines"),
        sum(
          when(col("cnt") >= 2, col("cnt") * length(col("line")).cast("long"))
            .otherwise(0L)).as("dup_line_chars"))

    // Each branch explodes ONLY its own widths — for the default
    // (disjoint) configuration no gram is generated twice, and nothing
    // gram-sized is ever materialized (an earlier all-widths
    // localCheckpoint went super-linear under storage pressure at the
    // 8× stress scale). Grams: (id, n, pos, fp), hashed to 60 bits
    // pre-shuffle. Each width's array is built by a SINGLE transform
    // over the materialized words column — nesting a transform over
    // [[Dedup.posShingles]]'s output would make Catalyst inline the
    // inner array construction into every element access (the
    // shinglesOfWords pitfall, 20× here), turning gram generation
    // O(G²) per document.
    def gramRows(ns: Seq[Int]): DataFrame =
      base
        .select(
          col("id"),
          explode(
            flatten(array(ns.map(n => taggedShingles(col("wd"), n)): _*)))
            .as("g"))
        .select(
          col("id"),
          col("g.n").as("n"),
          col("g.pos").as("pos"),
          Dedup.hash60(col("g.s")).as("fp"))

    // Top-gram counts: the max per-gram occurrence count per (doc, n).
    // Only the count survives, so gram-identity tie-breaks are moot —
    // and no positions are needed, so this is pure partial-aggregable
    // groupBy (map-side combine before the only shuffle).
    val topCols = topNs.map(n =>
      max(when(col("n") === n, col("top_cnt"))).as(s"top${n}_cnt"))
    val topPivot = gramRows(topNs)
      .groupBy("id", "n", "fp")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("id", "n")
      .agg(max(col("cnt")).as("top_cnt"))
      .groupBy("id")
      .agg(topCols.head, topCols.tail: _*)

    // Duplicate-gram coverage: positions of grams with cnt ≥ 2, merged by
    // interval union per (doc, n) — the same gaps-and-islands shape as
    // [[Dedup.duplicateSpans]], with the gram width as a column. Only
    // this branch needs position-preserving per-gram counts (a window,
    // not a groupBy), and only over the dup widths.
    val dupCols = dupNs.map(n =>
      max(when(col("n") === n, col("dup_tokens"))).as(s"dup${n}_tokens"))
    val ord = Window.partitionBy("id", "n").orderBy("pos")
    val dupPivot = gramRows(dupNs)
      .withColumn(
        "cnt",
        count(lit(1)).over(Window.partitionBy("id", "n", "fp")))
      .filter(col("cnt") >= 2)
      .withColumn(
        "prev_end",
        max(col("pos") + col("n"))
          .over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(
        "opens",
        when(col("prev_end").isNull || col("pos") > col("prev_end"), 1L)
          .otherwise(0L))
      .withColumn(
        "island",
        sum(col("opens")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("id", "n", "island")
      .agg(min(col("pos")).as("s"), max(col("pos") + col("n")).as("e"))
      .groupBy("id", "n")
      .agg(sum(col("e") - col("s")).as("dup_tokens"))
      .groupBy("id")
      .agg(dupCols.head, dupCols.tail: _*)

    val stats = base
      .select(
        col("id"),
        col("n_chars"),
        size(col("ln")).cast("long").as("n_lines"),
        size(col("wd")).cast("long").as("n_words"))
      .join(lineStats, Seq("id"), "left")
      .join(topPivot, Seq("id"), "left")
      .join(dupPivot, Seq("id"), "left")
      .select(
        Seq(
          col("id"),
          col("n_chars"),
          col("n_lines"),
          col("n_words"),
          coalesce(col("n_dup_lines"), lit(0L)).as("n_dup_lines"),
          coalesce(col("dup_line_chars"), lit(0L)).as("dup_line_chars")) ++
          topNs.map(n =>
            coalesce(col(s"top${n}_cnt"), lit(0L)).as(s"top${n}_cnt")) ++
          dupNs.map(n =>
            coalesce(col(s"dup${n}_tokens"), lit(0L)).as(s"dup${n}_tokens"))
          : _*)

    val ruled = stats
      .withColumn(
        "r_dup_line",
        col("n_dup_lines") * 100L <= col("n_lines") * DupLineMaxPct)
      .withColumn(
        "r_dup_line_char",
        col("dup_line_chars") * 100L <= col("n_chars") * DupLineCharMaxPct)
    val withTop = topNs.foldLeft(ruled) { (d, n) =>
      d.withColumn(
        s"r_top$n",
        col(s"top${n}_cnt") * n * 100L <= col("n_words") * TopGramMaxPct(n))
    }
    val withDup = dupNs.foldLeft(withTop) { (d, n) =>
      d.withColumn(
        s"r_dup$n",
        col(s"dup${n}_tokens") * 100L <= col("n_words") * DupGramMaxPct(n))
    }
    val ruleCols = Seq("r_dup_line", "r_dup_line_char") ++
      topNs.map(n => s"r_top$n") ++ dupNs.map(n => s"r_dup$n")
    withDup.withColumn(
      "pass_repetition",
      ruleCols.map(col).reduce(_ && _))
  }
}
