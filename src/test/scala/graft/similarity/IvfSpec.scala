package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** IVF ANN vs exact brute force on the real embeddings table. */
class IvfSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("probing ALL cells reproduces exact brute-force top-k") {
    val index = Ivf.build(emb, nLists = 8)
    val ivf = Ivf.searchTopK(spark, index, queries, k = 3, nProbe = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val exact = Similarity.cosineTopK(emb, queries, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(ivf == exact)
  }

  test("partial probing returns plausible neighbors with bounded work") {
    val index = Ivf.build(emb, nLists = 8)
    val ivf = Ivf.searchTopK(spark, index, queries, k = 3, nProbe = 2)
      .collect()
    assert(ivf.nonEmpty)
    // Every query got ≤ k results, ranked 1..n without gaps.
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val rnks = rows.map(_.getLong(1)).sorted.toSeq
      assert(rnks == (1L to rnks.size))
    }
    // recall@1 against exact, over 5 queries: with 2/8 cells probed the
    // top neighbor is found for at least one query even on uniform data.
    val exact1 = Similarity.cosineTopK(emb, queries, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ivf1 = ivf.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = exact1.count { case (q, v) => ivf1.get(q).contains(v) }
    assert(hits >= 1, s"recall@1 hits=$hits")
  }

  test("fixed-centroid IVF probing all cells equals exact brute force") {
    val ids = (0 until 8).map(_ * 37L)
    val ivf = Ivf.fixedTopK(emb, queries, ids, nProbe = 8, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val exact = Similarity.cosineTopK(emb, queries, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(ivf == exact)
  }

  test("cell assignment is total and deterministic for a fixed seed") {
    val a = Ivf.build(emb, nLists = 8).assigned
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Ivf.build(emb, nLists = 8).assigned
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    assert(a.size == emb.count())
  }
}
