package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Laws of the media hash-table commit ([[Dedup.commitHashArtifacts]]):
  * the committed table is exactly corpus ∪ accepted, the verdict scheme
  * matches its spec on planted literals, re-gating a committed delivery
  * flags every row, and the id-disjointness guard refuses clashes. */
class CommitHashSpec extends SparkSuite {

  import spark.implicits._

  private val Bits = 56
  private val MaxHamming = 6
  private val Blocks = 7

  // Literal 56-bit hashes: two far-apart corpus anchors, then arrivals
  // planted one bit off an anchor (dup_corpus), far from everything
  // (new), and byte-identical to the new one at a higher id (dup_batch).
  private val farA = 0x00000000000000L
  private val farB = 0xFFFFFFFFFFFFFFL // 56 set bits
  private val nearA = 0x00000000000001L // hamming 1 from farA
  private val fresh = 0x0F0F0F0F0F0F0FL // 28 bits from either anchor

  private def frame(rows: (Long, Long)*) =
    rows.toSeq.toDF("id", "simhash")

  test("verdicts: planted dup_corpus / new / dup_batch classify exactly") {
    val c = Dedup.commitHashArtifacts(
      frame(1L -> farA, 2L -> farB),
      frame(10L -> nearA, 11L -> fresh, 12L -> fresh),
      Bits, MaxHamming, Blocks)
    val got = c.verdicts.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(
      10L -> "dup_corpus", 11L -> "new", 12L -> "dup_batch"))
  }

  test("committed table == corpus ∪ accepted rows, nothing else") {
    val c = Dedup.commitHashArtifacts(
      frame(1L -> farA, 2L -> farB),
      frame(10L -> nearA, 11L -> fresh, 12L -> fresh),
      Bits, MaxHamming, Blocks)
    val got = c.committed.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got == Set(1L -> farA, 2L -> farB, 11L -> fresh))
  }

  test("re-gate closure: a re-keyed redelivery of a committed batch is flagged wholesale") {
    val c = Dedup.commitHashArtifacts(
      frame(1L -> farA, 2L -> farB),
      frame(10L -> nearA, 11L -> fresh, 12L -> fresh),
      Bits, MaxHamming, Blocks)
    // The same content arrives again under fresh ids: every row must
    // gate dup_corpus (its own committed hash matches at hamming 0, or
    // its keeper's does within the radius).
    val redelivered = Dedup.commitHashArtifacts(
      c.committed,
      frame(20L -> nearA, 21L -> fresh, 22L -> fresh),
      Bits, MaxHamming, Blocks)
    val verdicts = redelivered.verdicts.collect().map(_.getString(2)).toSet
    assert(verdicts == Set("dup_corpus"),
      "redelivered content must never re-enter the committed table")
    assert(redelivered.committed.count() == c.committed.count())
  }

  test("id-disjointness guard refuses an arrival reusing a corpus id") {
    val e = intercept[IllegalArgumentException] {
      Dedup.commitHashArtifacts(
        frame(1L -> farA),
        frame(1L -> fresh),
        Bits, MaxHamming, Blocks)
    }
    assert(e.getMessage.contains("ids must be disjoint"))
  }

  test("real fixture: q_media_commit accepts exactly the lower-id fresh uploads") {
    val d = "/root/testdata/sf0.001"
    val v = graft.queries.PipelineQueries.mediaCommit(spark, d)
    val byVerdict = v.groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Every planted brightness twin must be caught, every fresh1 pixel
    // chain admitted once, and every fresh2 re-upload suppressed by its
    // lower-id twin: fresh1 count == fresh2 count, both present.
    val fresh2Rows = v.filter(col("id") >=
        graft.queries.PipelineQueries.MediaCommitFresh2)
    assert(byVerdict.getOrElse("dup_corpus", 0L) > 0L)
    assert(byVerdict.getOrElse("new", 0L) > 0L)
    assert(fresh2Rows.count() > 0L)
    assert(fresh2Rows.filter(col("verdict") =!= "dup_batch").count() == 0L,
      "every byte-identical re-upload must defer to its lower-id twin")
  }
}
