package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Incremental PQ: frozen-codebook batch encoding semantics. */
class PqIncrementalSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val centroidIds = (0 until 8).map(_ * 37L)
  private lazy val queries = emb.filter(col("vec_id") < 5)

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))

  test("an empty batch reproduces pqTopK exactly") {
    val base = Ivf.pqTopK(emb, queries, centroidIds,
      dims = 64, m = 4, iters = 2, k = 5).collect().map(key).toMap
    val inc = Ivf.pqTopKIncremental(emb, emb.filter(lit(false)), queries,
      centroidIds, dims = 64, m = 4, iters = 2, k = 5)
      .collect().map(key).toMap
    assert(inc == base)
  }

  test("codebooks are frozen: corpus distances are unchanged by an arriving batch") {
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    val batch = emb.filter(col("vec_id") % 9 === 8)
    val corpusOnly = Ivf.pqTopK(corpus, queries, centroidIds,
      dims = 64, m = 4, iters = 2, k = 20).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val inc = Ivf.pqTopKIncremental(corpus, batch, queries, centroidIds,
      dims = 64, m = 4, iters = 2, k = 20).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    // Every corpus candidate surfacing in both result sets scores the
    // SAME integer ADC distance — new arrivals can displace it in rank
    // but can never move it (codes and codebooks are untouched).
    val shared = corpusOnly.keySet
      .filter { case (_, v) => v % 9 != 8 }
      .intersect(inc.keySet)
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(corpusOnly(k) == inc(k), s"distance shifted for $k")
    }
    // And the batch is genuinely searchable: some batch vector ranks.
    assert(inc.keySet.exists { case (_, v) => v % 9 == 8 },
      "no batch vector surfaced in the incremental results")
  }
}
