package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Commit face of the PQ index ([[Ivf.commitPqCodes]]): the committed
  * posting table must obey the same laws as every other committed
  * artifact in the engine — equal to a rebuild from scratch under the
  * same frozen quantizer, invariant to how arrivals are batched, and
  * loudly refusing id collisions instead of conflating vectors. */
class IndexCommitSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val centroidIds = (0 until 8).map(_ * 37L)
  private lazy val corpus = emb.filter(col("vec_id") % 9 =!= 8)
  private lazy val batch = emb.filter(col("vec_id") % 9 === 8)
  private lazy val artifacts =
    Ivf.pqArtifacts(corpus, centroidIds, dims = 64, m = 4, iters = 2)

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("committed == rebuilt from scratch on corpus ∪ accepted under the frozen codebooks") {
    val (cb, codes) = artifacts
    val committed =
      rows(Ivf.commitPqCodes(codes, cb, batch, dims = 64, m = 4))
    val rebuilt = rows(Ivf.encodePq(emb, cb, dims = 64, m = 4))
    assert(committed == rebuilt)
    // The corpus slice of the committed table is the training output
    // itself — the fold never touches stored codes.
    assert(rows(codes).subsetOf(committed))
  }

  test("the fold is batching-invariant: b1 then b2 == b1 ∪ b2") {
    val (cb, codes) = artifacts
    val b1 = batch.filter(col("vec_id") % 2 === 0)
    val b2 = batch.filter(col("vec_id") % 2 =!= 0)
    val twoStep = rows(Ivf.commitPqCodes(
      Ivf.commitPqCodes(codes, cb, b1, dims = 64, m = 4),
      cb, b2, dims = 64, m = 4))
    val oneShot =
      rows(Ivf.commitPqCodes(codes, cb, batch, dims = 64, m = 4))
    assert(twoStep == oneShot)
  }

  test("an arrival reusing a stored vec_id is refused, not conflated") {
    val (cb, codes) = artifacts
    val clash = corpus.limit(1)
    val e = intercept[IllegalArgumentException] {
      Ivf.commitPqCodes(codes, cb, clash, dims = 64, m = 4)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("an empty delivery commits as a no-op") {
    val (cb, codes) = artifacts
    val committed = rows(Ivf.commitPqCodes(
      codes, cb, emb.filter(lit(false)), dims = 64, m = 4))
    assert(committed == rows(codes))
  }
}
