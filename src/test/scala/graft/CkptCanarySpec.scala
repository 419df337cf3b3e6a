package graft

import org.apache.spark.sql.functions._

/** The leak canary behind `Bench`'s `live_persisted_rdds` field
  * (round-15 VERDICT #5): the Ckpt/memo release discipline is
  * call-site manual, so nothing STRUCTURAL stops a future query from
  * re-introducing the round-14 accumulation record (a leaked
  * localCheckpoint frame taxing every query scheduled after it). This
  * spec makes the discipline self-enforcing: a bench-shaped
  * multi-store mini-session — deploy, folds, retract, compact over two
  * store kinds, exactly the block-heaviest store paths — must leave
  * ZERO persisted RDDs once the stores go out of scope and the
  * ContextCleaner settles. A regression that strongly holds a
  * checkpoint (a memo without an eviction point, a store field never
  * released) keeps the count pinned above zero past the deadline and
  * fails here, not as a mysterious 3× slowdown a round later. */
class CkptCanarySpec extends SparkSuite {

  // Runs the stores in a callee frame so every store-held checkpoint
  // reference (quantizer, codebooks, Blooms' source frames) becomes
  // unreachable when it returns — the canary measures what SURVIVES
  // scope exit, which is exactly what a long-lived bench JVM pays for.
  private def miniSession(): Unit = {
    val docs = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("id"), col("text"))
    val tc = new graft.dedup.TableCommit(
      spark,
      java.nio.file.Files.createTempDirectory("graft_canary_tc_").toString,
      8, 4, 8).deploy(corpus, "doc_id", "text")
    tc.foldBatch(batch.filter(expr("(id div 10) % 2 = 0")), 0L)
    tc.retractBatch(
      batch.filter(expr("(id div 10) % 2 = 0 AND id % 40 = 0"))
        .select("id"), 1L)
    tc.compact()

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ks = new graft.similarity.KnnStore(
      spark,
      java.nio.file.Files.createTempDirectory("graft_canary_knn_").toString,
      nProbe = 2, k = 4)
      .deploy(emb.filter(col("vec_id") % 9 =!= 8), (0 until 8).map(_ * 37L))
    ks.foldBatch(
      emb.filter(col("vec_id") % 9 === 8).select("vec_id", "embedding"), 0L)
    ks.compact()
  }

  test("a multi-store mini-session leaves zero persisted RDDs after scope exit") {
    miniSession()
    spark.catalog.clearCache()
    val n = Ckpt.settledPersistentCount(spark.sparkContext, 30000L)
    assert(n == 0,
      s"$n RDD(s) still persisted after the mini-session settled — a " +
        "checkpoint or memo is strongly held past its last consumer " +
        "(the round-14 accumulation mechanism); find the missing " +
        "Ckpt.release / memo-eviction point")
  }
}
