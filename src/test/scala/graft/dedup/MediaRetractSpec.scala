package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retraction of a perceptual-hash table ([[Dedup.retractHashArtifacts]]):
  * the takedown must be exact (retracted == rebuilt on corpus \ deleted;
  * retract ∘ commit == identity), a no-op for never-stored ids, and must
  * have its operational gate consequence — a twin whose only match was
  * the retracted original re-gates as `new`, and no arrival can GAIN a
  * corpus match from a deletion. */
class MediaRetractSpec extends SparkSuite {

  import spark.implicits._

  private val Bits = 56
  private val MaxHamming = 6
  private val Blocks = 7

  private val farA = 0x00000000000000L
  private val farB = 0xFFFFFFFFFFFFFFL
  private val nearA = 0x00000000000001L
  private val fresh = 0x0F0F0F0F0F0F0FL

  private def frame(rows: (Long, Long)*) =
    rows.toSeq.toDF("id", "simhash")

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("retracted == rebuilt from scratch on corpus \\ deleted") {
    val corpus = frame(1L -> farA, 2L -> farB, 3L -> fresh)
    val retracted =
      Dedup.retractHashArtifacts(corpus, Seq(2L).toDF("id"))
    assert(rows(retracted) == Set(1L -> farA, 3L -> fresh))
  }

  test("retract ∘ commit == identity on the commit's accepted batch") {
    val corpus = frame(1L -> farA, 2L -> farB)
    val c = Dedup.commitHashArtifacts(
      corpus, frame(10L -> nearA, 11L -> fresh), Bits, MaxHamming, Blocks)
    val accepted = c.verdicts
      .filter(col("verdict") === "new").select("id")
    val roundTrip = Dedup.retractHashArtifacts(c.committed, accepted)
    assert(rows(roundTrip) == rows(corpus))
  }

  test("retracting a never-stored id is a no-op") {
    val corpus = frame(1L -> farA, 2L -> farB)
    assert(rows(Dedup.retractHashArtifacts(corpus, Seq(99L).toDF("id")))
      == rows(corpus))
  }

  test("gate consequence: a twin of a retracted original re-gates new; no arrival gains a match") {
    val corpus = frame(1L -> farA, 2L -> farB)
    val twins = frame(10L -> nearA)
    def verdictOf(c: DataFrame) = Dedup
      .commitHashArtifacts(c, twins, Bits, MaxHamming, Blocks)
      .verdicts.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(verdictOf(corpus)(10L) == "dup_corpus")
    val retracted =
      Dedup.retractHashArtifacts(corpus, Seq(1L).toDF("id"))
    assert(verdictOf(retracted)(10L) == "new",
      "with its only match retracted the twin must re-gate as new")
  }

  test("real fixture: q_media_retract flips twins dup_corpus → new, never new → dup_corpus") {
    val d = "/root/testdata/sf0.001"
    val v = graft.queries.PipelineQueries.mediaRetract(spark, d)
      .localCheckpoint(true)
    assert(v.filter(col("verdict_before") === "dup_corpus").count() > 0L)
    assert(v.filter(col("verdict_before") === "dup_corpus" &&
      col("verdict_after") === "new").count() > 0L,
      "at least one twin must lose its match to the takedown")
    // Monotonicity: deleting corpus rows can only LOSE corpus matches.
    assert(v.filter(col("verdict_before") === "new" &&
      col("verdict_after") === "dup_corpus").count() == 0L)
  }
}
