package graft.queries

import graft.SparkSuite

/** Laws for the canary scan and the language-consistency check. */
class GovernanceScanSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("canary scan recovers exactly the planted documents with their canary") {
    val P = PipelineQueries
    val hits = P.canaryScan(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("canary"))
    val docs = Tables.documents(spark, d)
      .select("doc_id").collect().map(_.getLong(0))
    val planted = docs.filter(_ % P.CanaryMod == P.CanaryResidue).toSet
    assert(hits.map(_._1).toSet == planted)
    assert(planted.nonEmpty)
    hits.foreach { case (id, c) =>
      assert(c == P.Canaries(((id % 3) + 3).toInt % 3))
    }
    // no false positives: one hit per planted doc
    assert(hits.length == planted.size)
  }

  test("language consistency: off-lang fraction bounded, every doc covered") {
    val rows = PipelineQueries.langConsistency(spark, d).collect()
    assert(rows.length == Tables.documents(spark, d).count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n_sentences")
      val off = r.getAs[Long]("n_off_lang")
      assert(n >= 1 && off >= 0 && off <= n)
      assert(r.getAs[Long]("off_lang_micros") == off * 1000000L / n)
    }
  }
}
