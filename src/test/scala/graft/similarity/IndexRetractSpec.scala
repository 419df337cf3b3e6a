package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retraction face of the PQ index ([[Ivf.retractPqCodes]]): deletion
  * from the posting table must be EXACT — equal to a rebuild from
  * scratch on corpus \ deleted under the same frozen codebooks, the
  * precise inverse of the commit fold on its own accepted batch, and a
  * no-op for ids the table never stored. */
class IndexRetractSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val centroidIds = (0 until 8).map(_ * 37L)
  private lazy val corpus = emb.filter(col("vec_id") % 9 =!= 8)
  private lazy val batch = emb.filter(col("vec_id") % 9 === 8)
  private lazy val artifacts =
    Ivf.pqArtifacts(corpus, centroidIds, dims = 64, m = 4, iters = 2)

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("retract ∘ commit == identity on the commit's own accepted batch") {
    val (cb, codes) = artifacts
    val committed = Ivf.commitPqCodes(codes, cb, batch, dims = 64, m = 4)
    val roundTrip =
      Ivf.retractPqCodes(committed, batch.select("vec_id"))
    assert(rows(roundTrip) == rows(codes))
  }

  test("retracted == rebuilt from scratch on corpus \\ deleted under the frozen codebooks") {
    val (cb, codes) = artifacts
    val committed = Ivf.commitPqCodes(codes, cb, batch, dims = 64, m = 4)
    val del = emb.filter(col("vec_id") % 7 === 3)
    val retracted =
      rows(Ivf.retractPqCodes(committed, del.select("vec_id")))
    val rebuilt = rows(Ivf.encodePq(
      emb.filter(col("vec_id") % 7 =!= 3), cb, dims = 64, m = 4))
    assert(retracted == rebuilt)
    // No deleted vector leaves a single code row behind.
    val deletedIds = del.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(retracted.forall { case (vid, _, _) => !deletedIds.contains(vid) })
  }

  test("retracting ids the table never stored is a no-op") {
    val (_, codes) = artifacts
    import spark.implicits._
    val ghost = Seq(999999999L).toDF("vec_id")
    assert(rows(Ivf.retractPqCodes(codes, ghost)) == rows(codes))
  }

  test("q_index_retract == q_index_commit minus the retracted slice, row-for-row") {
    val d = "/root/testdata/sf0.001"
    val commit = graft.queries.PipelineQueries.indexCommit(spark, d)
    val retract = graft.queries.PipelineQueries.indexRetract(spark, d)
    val expected = rows(commit.filter(
      col("vec_id") % graft.queries.PipelineQueries.RetractMod
        =!= graft.queries.PipelineQueries.RetractResidue))
    assert(rows(retract) == expected)
  }
}
