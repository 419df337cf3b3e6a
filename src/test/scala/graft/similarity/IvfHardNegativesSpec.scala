package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Corpus-scale IVF-blocked hard-negative mining vs the exact
  * broadcast-NLJ path on the real embeddings table. */
class IvfHardNegativesSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val centroidIds = (0 until 8).map(_ * 37L)

  test("probing ALL cells reproduces the exact cross-label top-k for every anchor") {
    // nProbe = K: every anchor sees every cell, so cell blocking must be
    // lossless — the IVF route degrades to exact, anchor by anchor. This
    // is the same equality trick IvfSpec uses for trainedTopK, applied to
    // the |Q| = |C| mining regime (every corpus vector is an anchor).
    val ivf = Ivf.hardNegatives(emb, centroidIds, iters = 3, nProbe = 8, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    val exact = Similarity.hardNegatives(emb, emb, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    assert(ivf == exact)
  }

  test("every mined negative has a label different from its anchor") {
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Ivf.hardNegatives(emb, centroidIds, iters = 2, nProbe = 2, k = 5)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(labelOf(r.getLong(0)) != r.getInt(3),
        s"anchor ${r.getLong(0)} mined a same-label negative ${r.getLong(2)}")
    }
    // Ranks are 1..n without gaps per anchor.
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val rnks = rs.map(_.getLong(1)).sorted.toSeq
      assert(rnks == (1L to rnks.size))
    }
  }

  test("partial probing only pairs anchors with candidates in probed cells") {
    import spark.implicits._
    // Two tight clusters with mixed labels; centroids one per cluster.
    // With nProbe = 1 an anchor in cluster A must never surface a
    // cluster-B negative even when B holds the only cross-label vectors
    // at high cosine — blocking is by cell, by construction.
    def v(x: Double, y: Double): Array[Float] =
      Array.fill(4)(0f).updated(0, x.toFloat).updated(1, y.toFloat)
    val corpus = Seq(
      (0L, 0, v(1, 0)), (1L, 1, v(1, 0.01)), (2L, 0, v(0.99, 0.01)),
      (10L, 0, v(-1, 0)), (11L, 1, v(-1, -0.01)), (12L, 1, v(-0.99, 0)))
      .toDF("vec_id", "label", "embedding")
    val out = Ivf.hardNegatives(corpus, Seq(0L, 10L), iters = 1, nProbe = 1, k = 3)
      .collect()
    val cellOf = Map(0L -> 0, 1L -> 0, 2L -> 0, 10L -> 1, 11L -> 1, 12L -> 1)
    out.foreach { r =>
      assert(cellOf(r.getLong(0)) == cellOf(r.getLong(2)),
        s"anchor ${r.getLong(0)} paired across cells with ${r.getLong(2)}")
    }
    // And inside a cell the expected negatives are found: anchor 0 (label
    // 0) finds 1 (label 1); anchor 11 (label 1) finds 10 (label 0).
    val top = out.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top(0L) == 1L)
    assert(top(11L) == 10L)
  }
}
