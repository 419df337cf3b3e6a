package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID
  * (stopword n-gram heuristic), quality scoring (length/punctuation/
  * stopword ratios), token counting, and document fingerprinting. All pure
  * Column expressions — codegen'd, pushdown-friendly, and portable to the
  * DuckDB oracle (RE2-safe regexes only: no backreferences, no
  * lookarounds).
  */
object TextAnalysis {

  /** Tiny per-language stopword heads — enough signal for a heuristic
    * classifier, small enough to inline into one regex per language. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "los", "que", "es", "una", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "une"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo")
  )

  def stopwordPattern(lang: String): String =
    "\\b(" + stopwords.toMap.apply(lang).mkString("|") + ")\\b"

  /** Count of stopword hits for one language (regexp_extract_all → size).
    * Cast long: DuckDB's len() is BIGINT. */
  def stopwordHits(text: Column, lang: String): Column =
    size(regexp_extract_all(lower(text), lit(stopwordPattern(lang)), lit(0)))
      .cast("long")

  /** Language ID: argmax of stopword hit counts with a fixed tie-break
    * order (the CASE chain — first language wins ties). Output columns:
    * s_<lang> scores + predicted. */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val langs = stopwords.map(_._1)
    val scored = langs.foldLeft(df) { (d, l) =>
      d.withColumn(s"s_$l", stopwordHits(col(textCol), l))
    }
    val predicted = langs
      .foldRight(lit(langs.last): Column) { (l, elseC) =>
        val isMax = langs
          .filter(_ != l)
          .map(o => col(s"s_$l") >= col(s"s_$o"))
          .reduce(_ && _)
        when(isMax, lit(l)).otherwise(elseC)
      }
    scored.withColumn("predicted", predicted)
  }

  /** The Gopher stopword-presence list (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A1.1.2): a document must contain at
    * least [[GopherMinStopwords]] of these to pass the battery's
    * stopword rule. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinStopwords = 2

  /** Published quality-filter battery — the C4 (Raffel et al. 2020) /
    * Gopher (Rae et al. 2021) rule set users expect to toggle, composed
    * as one verdict frame. Every rule is an EXACT INTEGER comparison
    * (ratios are cross-multiplied: `n_sym * 10 <= n_words` instead of
    * `n_sym / n_words <= 0.1`), so Spark and any oracle engine agree
    * bit-for-bit with no float discipline needed.
    *
    * Rules (document passes when ALL hold):
    *  - `r_word_count`: 50 ≤ word count ≤ 100000 (Gopher);
    *  - `r_mean_word_len`: mean word length in [3, 10] characters
    *    (Gopher), as n_word_chars between 3·n_words and 10·n_words;
    *  - `r_symbol_ratio`: symbols (`#`, `...`, `…`) ≤ 0.1 of words
    *    (Gopher symbol-to-word ratio);
    *  - `r_bullet`: ≤ 90% of lines start with a bullet (`-`, `*`, `•`);
    *  - `r_ellipsis`: ≤ 30% of lines end with an ellipsis;
    *  - `r_alpha`: ≥ 80% of words contain an alphabetic character;
    *  - `r_stopword`: ≥ 2 of the 8 [[GopherStopwords]] appear.
    *
    * All counts are builtin higher-order/regex expressions — codegen'd,
    * no UDFs; the per-line rules run on `split(text, '\n')` arrays so the
    * text is scanned once per rule family, never exploded. `extra` columns
    * (e.g. another text-derived score) ride the SAME projection, so a
    * caller composing the battery with other signals gets one corpus scan
    * instead of a doc-keyed join of two. */
  def gopherFilters(
      df0: DataFrame, idCol: String, textCol: String,
      extra: Seq[Column] = Nil): DataFrame = {
    // Regex-heavy per-row battery over what is typically a one-partition
    // single-file scan — spread to the session's core count first
    // (round-16, guide §2.5; see [[graft.dedup.Dedup.spreadNarrow]]).
    val df = graft.dedup.Dedup.spreadNarrow(df0)
    val t = col(textCol)
    val words = split(trim(t), "\\s+")
    val lines = split(t, "\n")
    val nWords = size(words).cast("long")
    val nWordChars =
      length(regexp_replace(t, "\\s", "")).cast("long")
    val nSym =
      size(regexp_extract_all(t, lit("(#|\\.\\.\\.|…)"), lit(0))).cast("long")
    val nLines = size(lines).cast("long")
    val nBullet =
      size(expr(s"filter(split($textCol, '\\n'), x -> ltrim(x) rlike '^[-*•]')"))
        .cast("long")
    val nEllipsis =
      size(expr(s"filter(split($textCol, '\\n'), x -> rtrim(x) rlike '(\\\\.\\\\.\\\\.|…)$$')"))
        .cast("long")
    val nAlphaWords =
      size(expr(s"filter(split(trim($textCol), '\\\\s+'), x -> x rlike '[A-Za-z]')"))
        .cast("long")
    val nStop = GopherStopwords
      .map(w => when(lower(t).rlike(s"\\b$w\\b"), 1L).otherwise(0L))
      .reduce(_ + _)
    df.select(
        (Seq(
          col(idCol),
          nWords.as("n_words"),
          nWordChars.as("n_word_chars"),
          nSym.as("n_symbols"),
          nLines.as("n_lines"),
          nBullet.as("n_bullet_lines"),
          nEllipsis.as("n_ellipsis_lines"),
          nAlphaWords.as("n_alpha_words"),
          nStop.as("n_stopwords")) ++ extra): _*)
      .withColumn("r_word_count",
        col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("r_mean_word_len",
        col("n_word_chars") >= col("n_words") * 3L &&
          col("n_word_chars") <= col("n_words") * 10L)
      .withColumn("r_symbol_ratio", col("n_symbols") * 10L <= col("n_words"))
      .withColumn("r_bullet",
        col("n_bullet_lines") * 10L <= col("n_lines") * 9L)
      .withColumn("r_ellipsis",
        col("n_ellipsis_lines") * 10L <= col("n_lines") * 3L)
      .withColumn("r_alpha",
        col("n_alpha_words") * 10L >= col("n_words") * 8L)
      .withColumn("r_stopword",
        col("n_stopwords") >= GopherMinStopwords.toLong)
      .withColumn("pass_gopher",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_bullet") && col("r_ellipsis") &&
          col("r_alpha") && col("r_stopword"))
  }

  /** Quality score in [0,1]: blend of length band, word shape, punctuation
    * and stopword density — the standard cheap pre-filter for web-scale
    * corpora. Integer counts ratioed in double → deterministic. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nWords = size(split(trim(text), "\\s+")).cast("double")
    val nPunct =
      size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0))).cast("double")
    val nStop = stopwordHits(text, "en").cast("double")
    val avgWordLen = when(nWords > 0, nChars / nWords).otherwise(0.0)
    val lengthOk =
      when(nChars >= 100 && nChars <= 10000, 1.0).otherwise(0.5)
    val wordShapeOk =
      when(avgWordLen >= 3 && avgWordLen <= 12, 1.0).otherwise(0.5)
    val punctOk =
      when(nChars > 0 && nPunct / nChars <= 0.1, 1.0).otherwise(0.5)
    val stopOk = when(nWords > 0 && nStop / nWords >= 0.05, 1.0).otherwise(0.5)
    round(
      lengthOk * 0.3 + wordShapeOk * 0.3 + punctOk * 0.2 + stopOk * 0.2,
      6)
  }
}
