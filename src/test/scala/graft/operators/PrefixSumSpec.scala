package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSuite {

  import spark.implicits._

  test("globalCumsum equals the global-window cumulative sum") {
    val df = (1L to 500L).map(i => (i, (i * 7 % 13))).toDF("id", "v")
    val want = df
      .withColumn("cum", sum("v").over(
        Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = PrefixSum
      .globalCumsum(df, expr("id div 50"), Seq(col("id")), col("v"), "cum")
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("globalRunIds equals the global-window run numbering, incl. cross-bucket runs") {
    // Types chosen so runs frequently SPAN the div-20 bucket boundary —
    // the stitch-merge path must fire repeatedly.
    val df = (1L to 300L).map { i =>
      (i, s"t${(i / 7) % 3}") // runs of length 7 vs bucket length 20
    }.toDF("id", "t")
    val w = Window.orderBy("id")
    val want = df
      .withColumn("chg",
        when(col("t") === lag("t", 1).over(w), 0L).otherwise(1L))
      .withColumn("run", sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "run").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = PrefixSum
      .globalRunIds(df, expr("id div 20"), Seq(col("id")), col("t"), "run")
      .select("id", "run").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("randomized equivalence with the global window (runs + cumsum)") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      // Random run lengths, random bucket width, nulls sprinkled in.
      val bucketWidth = rnd.nextInt(40) + 3
      val rows = (1L to 400L).map { i =>
        val t = if (rnd.nextInt(20) == 0) null
          else s"t${rnd.nextInt(3)}"
        (i, t, rnd.nextInt(9).toLong)
      }
      val df = rows.toDF("id", "t", "v")
      val w = Window.orderBy("id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wantRun = df
        .withColumn("chg",
          when(col("t") === lag("t", 1).over(w), 0L).otherwise(1L))
        .withColumn("run", sum("chg").over(cum))
        .select("id", "run").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val gotRun = PrefixSum
        .globalRunIds(df, expr(s"id div $bucketWidth"), Seq(col("id")),
          col("t"), "run")
        .select("id", "run").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(gotRun == wantRun, s"run mismatch (trial $trial, width $bucketWidth)")
      val wantCum = df.withColumn("c", sum("v").over(cum))
        .select("id", "c").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val gotCum = PrefixSum
        .globalCumsum(df, expr(s"id div $bucketWidth"), Seq(col("id")),
          col("v"), "c")
        .select("id", "c").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(gotCum == wantCum, s"cumsum mismatch (trial $trial, width $bucketWidth)")
    }
  }

  test("null bucket values neither crash nor drop rows, and output schema is clean") {
    val df = Seq(
      (1L, null.asInstanceOf[java.lang.Long], 2L),
      (2L, java.lang.Long.valueOf(10L), 3L),
      (3L, java.lang.Long.valueOf(10L), 4L)
    ).toDF("id", "b", "v")
    val out = PrefixSum.globalCumsum(df, col("b"), Seq(col("id")), col("v"), "cum")
    // Null bucket sorts first (matches the global window's nulls-first
    // order): ids 1,2,3 → cumsums 2,5,9.
    val got = out.select("id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 5L, 3L -> 9L))
    assert(out.columns.toSet == Set("id", "b", "v", "cum"),
      s"internal columns leaked: ${out.columns.mkString(",")}")
    val runs = PrefixSum.globalRunIds(df, col("b"), Seq(col("id")),
      col("v") % 2, "run")
    assert(runs.count() == 3)
    assert(runs.columns.toSet == Set("id", "b", "v", "run"))
  }

  test("composite (struct) buckets are refused loudly") {
    // The driver stitch key is Row.toString ("[a,1]") while the join key
    // is cast(string) ("{a, 1}") — a struct bucket would silently match
    // nothing and return an EMPTY frame. The guard turns that data-loss
    // bug into an immediate error; composite buckets must be encoded as
    // one ordered string column.
    val df = (1L to 10L).map(i => (i, i % 3)).toDF("id", "v")
    val ex = intercept[IllegalArgumentException] {
      PrefixSum.globalCumsum(
        df, struct(col("v"), expr("id div 5")), Seq(col("id")), lit(1L), "c")
        .collect()
    }
    assert(ex.getMessage.contains("atomic"))
    val ex2 = intercept[IllegalArgumentException] {
      PrefixSum.globalRunIds(
        df, struct(col("v")), Seq(col("id")), col("v"), "r")
        .collect()
    }
    assert(ex2.getMessage.contains("atomic"))
  }

  test("adaptiveRangeBucket: bounded, order-preserving, overflow-free on any Long spread") {
    // Full signed-Long spread (hashed-id shape): bucket count must stay
    // <= 2^bits + 1, values non-negative, and bucket order must follow
    // value order.
    val rnd = new scala.util.Random(7)
    val vals = (Seq(Long.MinValue + 1, -1L, 0L, 1L, Long.MaxValue - 1) ++
      Seq.fill(500)(rnd.nextLong())).distinct
    val df = vals.toDF("v")
    val b = PrefixSum.adaptiveRangeBucket(df, col("v"), 4)
    val got = df.select(col("v"), b.as("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).distinct.length <= 17, "more than 2^4+1 buckets")
    assert(got.forall(_._2 >= 0L), "bucket must zero-pad (non-negative)")
    val sorted = got.sortBy(_._1)
    assert(sorted.map(_._2).sliding(2).forall(w =>
      w.length < 2 || w(0) <= w(1)),
      "bucket must be monotone in the value")
    // Narrow range: a fixed divisor would give ONE bucket; the adaptive
    // width still splits it.
    val narrow = (0L to 1000L).map(5000000L + _).toDF("v")
    val nb = narrow
      .select(PrefixSum.adaptiveRangeBucket(narrow, col("v"), 4).as("b"))
      .collect().map(_.getLong(0)).distinct
    assert(nb.length > 8, s"narrow range must still spread, got ${nb.length} buckets")
    // Empty and all-null frames: one constant bucket, no crash.
    assert(PrefixSum.adaptiveRangeBucket(
      Seq.empty[Long].toDF("v"), col("v"), 4) != null)
  }

  test("plan has no unpartitioned window") {
    val df = (1L to 100L).map(i => (i, i % 5)).toDF("id", "v")
    val out = PrefixSum
      .globalCumsum(df, expr("id div 10"), Seq(col("id")), col("v"), "cum")
    val plan = out.queryExecution.executedPlan.toString
    // Every Window line must carry a partition spec (the keyed local pass).
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.forall(_.contains("__bucket")),
      s"found unpartitioned window in:\n$plan")
  }
}
