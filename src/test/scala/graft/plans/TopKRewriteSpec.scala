package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKRewriteSpec extends SparkSuite {

  import spark.implicits._

  private def idiom(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private lazy val data =
    (1L to 200L).map(i => (i, s"g${i % 7}", (i * 131) % 97)).toDF("id", "k", "v")

  test("viaRewrite plans the heap operator and matches the window result") {
    val window = idiom(data, 3).orderBy("k", "rn")
    val rewritten = TopKPerKey.viaRewrite(window)
    assert(rewritten.queryExecution.executedPlan.toString
      .contains("TopKPerKey"), "rewrite should fire")
    assert(!rewritten.queryExecution.executedPlan.toString
      .contains("WindowExec"), "window operator should be gone")
    assert(rewritten.collect().toSeq == window.collect().toSeq)
    assert(rewritten.schema == window.schema)
  }

  test("session-wide injection rewrites plain window queries") {
    val s2 = spark.newSession()
    TopKPerKey.registerRewrite(s2)
    import s2.implicits._
    val df = (1L to 100L).map(i => (i, i % 5, i * 7 % 31)).toDF("id", "k", "v")
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(q.count() == 10) // 5 keys × 2
  }

  test("rule leaves rank()/extra predicates/unpartitioned windows alone") {
    // rank() admits ties — not rewritable.
    val w = Window.partitionBy("k").orderBy(col("v").desc)
    val ranked = data.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    assert(!TopKPerKey.viaRewrite(ranked)
      .queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // Stacked predicate above the rank filter: the inner rank-only filter
    // still rewrites; the outer filter stays. Results must be unchanged.
    val conj = idiom(data, 3).filter(col("v") > 10)
    val viaConj = TopKPerKey.viaRewrite(conj)
    assert(viaConj.collect().toSet == conj.collect().toSet)
    // Unpartitioned (global) window — skipped.
    val g = Window.orderBy(col("v").desc, col("id").asc)
    val globalQ = data.withColumn("rn", row_number().over(g)).filter(col("rn") <= 3)
    assert(!TopKPerKey.viaRewrite(globalQ)
      .queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("rn < k and rn = 1 forms rewrite with correct limits") {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val lt = data.withColumn("rn", row_number().over(w)).filter(col("rn") < 3)
    val ltR = TopKPerKey.viaRewrite(lt)
    assert(ltR.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(ltR.collect().toSet == lt.collect().toSet)
    val eq = data.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val eqR = TopKPerKey.viaRewrite(eq)
    assert(eqR.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(eqR.collect().toSet == eq.collect().toSet)
  }
}
