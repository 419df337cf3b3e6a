package graft.queries

import graft.SparkSuite

/** The embedding-quality battery must catch exactly the three planted
  * failure shapes (truncated row, NaN, zero vector) and pass every real
  * fixture vector — the gate's false-positive rate on healthy data is
  * as much a law as its recall on broken rows. */
class EmbeddingQualitySpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("planted broken rows get their verdicts; fixture rows all pass") {
    val P = PipelineQueries
    val rows = P.embeddingQuality(spark, d).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("verdict"))
      .toMap
    assert(rows(P.EmbBadZeroId) == "zero")
    assert(rows(P.EmbBadDimId) == "bad_dim")
    assert(rows(P.EmbBadNanId) == "nan")
    val planted = Set(P.EmbBadZeroId, P.EmbBadDimId, P.EmbBadNanId)
    val real = rows.filterNot { case (id, _) => planted(id) }
    assert(real.nonEmpty)
    assert(real.values.forall(_ == "pass"),
      s"healthy vectors flagged: ${real.filter(_._2 != "pass").take(5)}")
  }

  test("norm is the shared sequential-fold dot product in micros") {
    val P = PipelineQueries
    val row = P.embeddingQuality(spark, d)
      .filter(org.apache.spark.sql.functions.col("vec_id") === P.EmbBadDimId)
      .collect().head
    // 32 components of 0.5: norm = sqrt(32 * 0.25) = 2.8284271...
    assert(row.getAs[Long]("norm_micros") == 2828427L)
    assert(!row.getAs[Boolean]("has_nan"))
    assert(!row.getAs[Boolean]("is_zero"))
  }
}
