package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Cross-source duplication matrix ([[PipelineQueries.sourceOverlapOf]]):
  * a planted mirror document must surface as exact overlap, a planted
  * cross-source near-dup as a pair count, same-source duplication must
  * never leak into the matrix, and pair naming is normalized. */
class SourceOverlapSpec extends SparkSuite {

  import spark.implicits._

  // A mirrored doc across srcA/srcB (exact), its lightly-edited twin in
  // srcC (near-dup of both), an unrelated doc in srcA, and a
  // SAME-SOURCE exact dup inside srcA that must NOT appear.
  private val base = "the quick brown fox jumps over the lazy dog " +
    "and then runs far away into the deep green forest tonight"
  private lazy val docs = Seq(
    (1L, base, "srcA"),
    (2L, base, "srcB"),
    (3L, base.replace("tonight", "tomorrow"), "srcC"),
    (4L, "completely different content about spark query engines " +
      "running distributed shuffles at scale", "srcA"),
    (5L, base, "srcA")
  ).toDF("doc_id", "text", "source")

  private lazy val matrix = PipelineQueries.sourceOverlapOf(docs)
    .collect()
    .map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3)))
    .toMap

  test("a planted cross-source mirror surfaces as exact overlap") {
    assert(matrix(("srcA", "srcB"))._1 == 1L)
  }

  test("a planted cross-source near-dup surfaces as a pair count") {
    assert(matrix(("srcA", "srcC"))._2 >= 1L)
    assert(matrix(("srcB", "srcC"))._2 >= 1L)
  }

  test("same-source duplication never enters the matrix; naming is normalized") {
    assert(!matrix.keySet.exists { case (a, b) => a >= b },
      "every row must be an ordered source_a < source_b pair")
  }

  test("real fixture: near-dup overlap is live and counts are sane") {
    val m = PipelineQueries.sourceOverlap(spark, "/root/testdata/sf0.001")
      .localCheckpoint(true)
    assert(m.count() > 0L)
    assert(m.agg(sum("n_neardup_pairs")).collect()(0).getLong(0) > 0L)
    assert(m.filter(col("n_exact_fps") < 0 ||
      col("n_neardup_pairs") < 0).count() == 0L)
  }
}
