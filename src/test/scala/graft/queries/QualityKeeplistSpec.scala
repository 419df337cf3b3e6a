package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Election invariants of the quality-aware near-dup keeper. */
class QualityKeeplistSpec extends SparkSuite {

  test("split audit: every near-dup pair lands inside one split (no leakage)") {
    val rows = graft.queries.PipelineQueries
      .splitAudit(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "fixture must have near-dup pairs to audit")
    rows.foreach { r =>
      assert(r.getAs[String]("split_a") == r.getAs[String]("split_b"),
        s"cross-split pair channel: $r")
    }
  }

  private lazy val rows =
    PipelineQueries.qualityKeeplist(spark, "/root/testdata/sf0.001")

  test("every document appears once with exactly one keeper per component") {
    val n = Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(rows.count() == n)
    // One keeper per component, and the keeper is a member of it.
    val perComp = rows.groupBy("component").agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      sum(when(col("keeper_id") === col("doc_id"), 1L).otherwise(0L))
        .as("n_self"))
    assert(perComp.filter(col("n_keep") =!= 1L).count() == 0)
    assert(perComp.filter(col("n_self") =!= 1L).count() == 0)
  }

  test("the keeper maximizes quality with min-id tie-break") {
    val best = rows.groupBy("component").agg(
      max(col("quality")).as("max_q"))
    val keepers = rows.filter(col("keep")).join(best, Seq("component"))
    assert(keepers.filter(col("quality") =!= col("max_q")).count() == 0)
    // Tie-break: no non-keeper in the component has the same quality AND
    // a smaller id than the keeper.
    val viol = rows.as("a")
      .join(rows.filter(col("keep")).as("k"), Seq("component"))
      .filter(
        col("a.quality") === col("k.quality") &&
          col("a.doc_id") < col("k.doc_id"))
    assert(viol.count() == 0)
  }

  test("cluster-free documents keep themselves") {
    val singletons = rows
      .groupBy("component").agg(count(lit(1)).as("sz"))
      .filter(col("sz") === 1)
    val bad = rows.join(singletons, Seq("component"))
      .filter(!col("keep"))
    assert(bad.count() == 0)
  }
}
