package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** PQ quantization-distortion monitor ([[Ivf.pqDistortion]]): a corpus
  * the codebook can represent exactly must measure zero error, every
  * (vector, subspace) pair is measured exactly once, and error is
  * non-negative by construction. */
class PqDistortionSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val centroidIds = (0 until 8).map(_ * 37L)

  test("a corpus of exactly the seed vectors quantizes with zero error") {
    val seeds = emb.filter(col("vec_id").isin(centroidIds.map(Long.box): _*))
    val (cb, codes) =
      Ivf.pqArtifacts(seeds, centroidIds, dims = 64, m = 4, iters = 2)
    val d = Ivf.pqDistortion(seeds, cb, codes, dims = 64, m = 4)
    assert(d.count() == 4L)
    assert(d.filter(col("sum_sqerr") =!= 0L).count() == 0L,
      "each seed is its own centroid — reconstruction must be exact")
  }

  test("real fixture: every (vector, sub) measured once, errors non-negative, distortion live") {
    val (cb, codes) =
      Ivf.pqArtifacts(emb, centroidIds, dims = 64, m = 4, iters = 2)
    val d = Ivf.pqDistortion(emb, cb, codes, dims = 64, m = 4)
      .localCheckpoint(true)
    val n = emb.count()
    assert(d.agg(sum("n_vecs")).collect()(0).getLong(0) == 4L * n)
    assert(d.filter(col("sum_sqerr") < 0 || col("max_sqerr") < 0)
      .count() == 0L)
    assert(d.filter(col("sum_sqerr") > 0).count() > 0L,
      "a real corpus larger than K must lose information to quantization")
    assert(d.filter(col("max_sqerr") * col("n_vecs") < col("sum_sqerr"))
      .count() == 0L, "max * n bounds the sum")
  }
}
