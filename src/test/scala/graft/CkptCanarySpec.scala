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
    // TEST-ENVIRONMENT QUIRKS this canary must be robust to (both
    // bisected in round 16; neither affects the plain-JVM driver
    // surfaces, verified by replaying the same mini-session under
    // `java`/`sbt runMain`, where everything settles to zero):
    //
    // 1. (round 17) The suite now runs in its OWN forked JVM
    //    (build.sbt's Test/testGrouping): in the shared fork the
    //    measurement was suite-order-dependent — other suites'
    //    (session, dir)-keyed memo checkpoints are released by
    //    Bench/Verify run-order hooks, not suite teardowns, and the
    //    round-16 delta-based deflake still failed under the driver's
    //    ordering. Isolation makes the delta below equal the absolute
    //    count, deterministically. The delta form is kept anyway
    //    (defense in depth if the grouping is ever lost).
    //
    // 2. In the ScalaTest-forked JVM, the FIRST eagerly-localCheckpointed
    //    RDD of the whole session never becomes cleaner-collectable
    //    (measured: a bare spark.range(...).localCheckpoint(true) as the
    //    session's first checkpoint stays registered past a 120 s
    //    GC-poll, while the second and every later one settles in
    //    milliseconds; the identical sequence under a plain JVM settles
    //    including the first). Explicit Ckpt.release still works on it,
    //    and the effect does not reproduce outside the test framework's
    //    fork, so it is a harness artifact, not an engine leak. The
    //    sacrificial checkpoint below pays that one-time pin BEFORE the
    //    baseline snapshot — in the isolated JVM this suite always runs
    //    first, so the pin would otherwise always land on the canary.
    val sacrificial = spark.range(16L).toDF("x").localCheckpoint(true)
    assert(sacrificial.count() == 16L)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    miniSession()
    spark.catalog.clearCache()
    val deadline = System.currentTimeMillis() + 30000L
    var leaked =
      spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    while (leaked.nonEmpty && System.currentTimeMillis() < deadline) {
      System.gc() // enqueue unreachable RDD weak refs for the cleaner
      Thread.sleep(250L)
      leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    }
    assert(leaked.isEmpty,
      s"${leaked.size} RDD(s) persisted by the mini-session never " +
        "settled — a checkpoint or memo is strongly held past its last " +
        "consumer (the round-14 accumulation mechanism); find the " +
        "missing Ckpt.release / memo-eviction point")
  }
}
