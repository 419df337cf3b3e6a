package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The laws of the TABLE-BACKED kNN index store ([[KnnStore]]):
  * chained folded deliveries read back EXACTLY the from-scratch graph
  * of corpus ∪ all arrivals (the top-k merge law: arrivals only add
  * candidates, so merged top-k == recomputed top-k), which pins it
  * equal to both the oracle-checked [[Ivf.mutualKnnEdges]] rebuild and
  * the in-memory [[Ivf.knnIndexFold]] twin; plus replay safety by
  * batch id and empty-delivery no-op. */
class KnnStoreSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val centroidIds = (0 until 8).map(_ * 37L)
  private val k = 4

  private def edges(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def mk(corpus: org.apache.spark.sql.DataFrame) =
    new KnnStore(
      spark,
      java.nio.file.Files.createTempDirectory("graft_knnstore_").toString,
      nProbe = 2, k = k)
      .deploy(corpus, centroidIds)

  test("deploy alone reads back the from-scratch graph of the corpus") {
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    assert(edges(mk(corpus).mutualGraph) ==
      edges(Ivf.mutualKnnEdges(corpus, centroidIds, nProbe = 2, k = k)))
  }

  test("three chained deliveries read back the from-scratch graph of the union") {
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    val batch = emb.filter(col("vec_id") % 9 === 8)
    val store = mk(corpus)
    Seq(0, 1, 2).foreach(r =>
      store.foldBatch(batch.filter(col("vec_id") % 3 === r), r.toLong))
    assert(edges(store.mutualGraph) ==
      edges(Ivf.mutualKnnEdges(emb, centroidIds, nProbe = 2, k = k)))
  }

  test("directed edges equal the in-memory fold twin after one delivery") {
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    val batch = emb.filter(col("vec_id") % 9 === 8)
    val store = mk(corpus)
    store.foldBatch(batch, 0L)
    val twin = Ivf.knnIndexFold(
      Ivf.knnIndexArtifacts(corpus, centroidIds, nProbe = 2, k = k), batch)
    assert(edges(store.directedEdges) == edges(
      twin.edges.select("q_vec_id", "vec_id", "score")))
  }

  test("edge compaction is a graph no-op and later folds land on the twin") {
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    val batch = emb.filter(col("vec_id") % 9 === 8)
    val plain = mk(corpus)
    val compacted = mk(corpus)
    for (s <- Seq(plain, compacted))
      s.foldBatch(batch.filter(col("vec_id") % 3 === 0), 0L)
    compacted.compact()
    assert(edges(compacted.mutualGraph) == edges(plain.mutualGraph))
    for (s <- Seq(plain, compacted))
      s.foldBatch(batch.filter(col("vec_id") % 3 =!= 0), 1L)
    assert(edges(compacted.mutualGraph) == edges(plain.mutualGraph))
    assert(edges(plain.mutualGraph) ==
      edges(Ivf.mutualKnnEdges(emb, centroidIds, nProbe = 2, k = k)))
  }

  test("crash recovery: reopen resumes folding on the stored index exactly") {
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    val batch = emb.filter(col("vec_id") % 9 === 8)
    val plain = mk(corpus)
    val crashBase = java.nio.file.Files
      .createTempDirectory("graft_knn_crash_").toString
    val before = new KnnStore(spark, crashBase, nProbe = 2, k = k)
      .deploy(corpus, centroidIds)
    plain.foldBatch(batch.filter(col("vec_id") % 3 === 0), 0L)
    before.foldBatch(batch.filter(col("vec_id") % 3 === 0), 0L)
    val reopened = KnnStore.reopen(spark, crashBase, nProbe = 2, k = k)
    plain.foldBatch(batch.filter(col("vec_id") % 3 =!= 0), 1L)
    reopened.foldBatch(batch.filter(col("vec_id") % 3 =!= 0), 1L)
    assert(edges(reopened.mutualGraph) == edges(plain.mutualGraph))
    assert(edges(reopened.mutualGraph) ==
      edges(Ivf.mutualKnnEdges(emb, centroidIds, nProbe = 2, k = k)))
  }

  test("replayed batch id and empty delivery are no-ops") {
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    val batch = emb.filter(col("vec_id") % 9 === 8)
    val store = mk(corpus)
    store.foldBatch(batch, 0L)
    val before = edges(store.mutualGraph)
    store.foldBatch(batch, 0L) // replayed id: skipped outright
    store.foldBatch(emb.filter(lit(false)), 1L) // empty delivery
    assert(edges(store.mutualGraph) == before)
  }
}
