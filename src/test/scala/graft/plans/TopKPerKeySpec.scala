package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The custom top-k-per-key operator vs the window formulation it
  * replaces: identical results, two-phase physical plan. */
class TopKPerKeySpec extends SparkSuite {

  private lazy val supplier =
    spark.read.parquet("/root/testdata/sf0.01/supplier.parquet")

  private def windowTopK(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("s_nationkey")
      .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
    supplier
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("s_nationkey", "rnk", "s_suppkey")
  }

  test("matches row_number window semantics exactly") {
    val got = TopKPerKey
      .topK(
        supplier,
        keys = Seq(col("s_nationkey")),
        ordering = Seq(col("s_acctbal").desc, col("s_suppkey").asc),
        k = 3)
      .selectExpr("CAST(s_nationkey AS BIGINT)", "rnk", "s_suppkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = windowTopK(3)
      .selectExpr("CAST(s_nationkey AS BIGINT)", "rnk", "s_suppkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want && got.nonEmpty)
  }

  test("handles k larger than any group (all rows ranked)") {
    val got = TopKPerKey
      .topK(supplier, Seq(col("s_nationkey")),
        Seq(col("s_acctbal").desc, col("s_suppkey").asc), k = 100000)
      .count()
    assert(got == supplier.count())
  }

  test("plans as partial + final heap passes around one exchange") {
    val df = TopKPerKey.topK(
      supplier, Seq(col("s_nationkey")),
      Seq(col("s_acctbal").desc, col("s_suppkey").asc), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings.
    val heapPasses = "TopKPerKey ".r.findAllIn(plan).length
    assert(heapPasses == 2, s"expected partial+final, got $heapPasses:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(s_nationkey"))
    // No sort anywhere: the whole point is heaps instead of sorting.
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
  }
}
