package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Plan-shape guards for the table-backed stores' pruned reads — the
  * round-13 layout change (generation dirs + user-specified read
  * schemas) must not silently demote the corpus layers' PARTITION
  * pruning to data-filter scans: the gate's sub-corpus cost claim
  * rests on `PartitionFilters` reaching the hive `part=`/`cell=` dirs.
  * Probed over the real parquet fixture (never a local relation —
  * ConvertToLocalRelation would fold the subtree away, round-10
  * lesson). */
class StorePlanSpec extends SparkSuite {

  test("TableCommit's pruned gate read shows PartitionFilters on the corpus layer") {
    val docs = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val store = new TableCommit(
      spark,
      java.nio.file.Files.createTempDirectory("graft_plan_tc_").toString,
      8, 4, 8)
      .deploy(docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
    // A fold so the read unions a delta batch too (the production shape).
    store.foldBatch(
      docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("id"), col("text")), 0L)
    val pruned = store.prunedFpRead(Seq(3, 7))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part"),
      plan.take(600))
    // The pruning is real, not cosmetic: the plan carries the isin
    // predicate as a partition filter on at least one scan.
    assert(
      "PartitionFilters: \\[[^\\]]*part".r.findFirstIn(plan).isDefined,
      plan.take(600))
  }

  test("KnnStore's cell-pruned assignment read shows PartitionFilters on the baseline") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val store = new graft.similarity.KnnStore(
      spark,
      java.nio.file.Files.createTempDirectory("graft_plan_knn_").toString,
      nProbe = 2, k = 4)
      .deploy(emb.filter(col("vec_id") % 9 =!= 8), (0 until 8).map(_ * 37L))
    store.foldBatch(emb.filter(col("vec_id") % 9 === 8), 0L)
    val plan = store.prunedAsgRead(Seq(1L, 5L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      plan.take(600))
    assert(
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      plan.take(600))
  }
}
