package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Planted-neighbor sanity for cosine top-k (exact + LSH). */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private lazy val emb = Seq(
    (0L, vec(1, 0, 0, 0)),
    (1L, vec(0.9, 0.1, 0, 0)), // near 0
    (2L, vec(0, 1, 0, 0)),
    (3L, vec(0, 0.95, 0.05, 0)), // near 2
    (4L, vec(0, 0, 1, 0)),
    (5L, vec(-1, 0, 0, 0)) // opposite of 0
  ).toDF("vec_id", "embedding")

  test("cosineTopK ranks the planted neighbor first") {
    val top = Similarity
      .cosineTopK(emb, emb.filter(col("vec_id") === 0), k = 2)
      .collect()
      .sortBy(_.getAs[Long]("rnk"))
    assert(top.head.getAs[Long]("vec_id") == 1L)
    assert(top.head.getAs[Double]("score") > 0.99)
    // Opposite vector is never in the top-k.
    assert(!top.map(_.getAs[Long]("vec_id")).contains(5L))
  }

  test("self-match is excluded") {
    val top = Similarity.cosineTopK(emb, emb, k = 5).collect()
    assert(top.forall(r => r.getAs[Long]("q_vec_id") != r.getAs[Long]("vec_id")))
  }

  test("LSH bucket assignment is deterministic and groups similar vectors") {
    val b = emb
      .select(col("vec_id"),
        expr(Similarity.lshBucketSql("embedding", 4, 8)).as("bucket"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket"))
      .toMap
    // Near-identical vectors land in the same bucket.
    assert(b(0L) == b(1L))
    assert(b(2L) == b(3L))
    // Opposite vectors land in complementary buckets (all 8 signs flip).
    assert(b(0L) != b(5L))
  }

  test("int8-quantized top-k tracks exact cosine within quantization error") {
    val exact = Similarity.cosineTopK(emb, emb, k = 3)
      .collect()
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("score"))
      .toMap
    val q8 = Similarity.cosineTopKQ8(emb, emb, k = 3).collect()
    assert(q8.nonEmpty)
    q8.foreach { r =>
      val key = (r.getAs[Long]("q_vec_id"), r.getAs[Long]("vec_id"))
      val sq = r.getAs[Double]("score_q8")
      assert(sq >= -1.0 - 1e-9 && sq <= 1.0 + 1e-9)
      // Every q8 pair that also appears in the exact top-k scores within
      // int8 quantization error (worst case ~1/127 per component pair).
      exact.get(key).foreach(se =>
        assert(math.abs(se - sq) < 0.02, s"$key exact=$se q8=$sq"))
    }
    // The planted nearest neighbor survives quantization at rank 1.
    val top0 = q8.filter(_.getAs[Long]("q_vec_id") == 0L)
      .minBy(_.getAs[Long]("rnk"))
    assert(top0.getAs[Long]("vec_id") == 1L)
  }

  test("cosineTopKLsh agrees with exact top-1 for in-bucket neighbors") {
    val lsh = Similarity
      .cosineTopKLsh(emb, emb.filter(col("vec_id") === 0), k = 1,
        dims = 4, nBits = 8)
      .collect()
    assert(lsh.length == 1 && lsh.head.getAs[Long]("vec_id") == 1L)
  }

  test("hardNegatives mines nearest CROSS-label vectors only") {
    val labeled = Seq(
      (0L, vec(1, 0, 0, 0), 0),
      (1L, vec(0.95, 0.05, 0, 0), 0), // nearest overall — but same label
      (2L, vec(0.8, 0.2, 0, 0), 1), // nearest cross-label
      (3L, vec(0, 1, 0, 0), 1),
      (4L, vec(-1, 0, 0, 0), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity
      .hardNegatives(labeled, labeled.filter(col("vec_id") === 0), k = 2)
      .collect()
      .sortBy(_.getAs[Long]("rnk"))
    // The same-label near-duplicate (1) must be skipped; the mined
    // negatives are the closest vectors from OTHER classes, in order.
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(2L, 3L))
    assert(got.forall(_.getAs[Int]("label") != 0))
  }
}
