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
