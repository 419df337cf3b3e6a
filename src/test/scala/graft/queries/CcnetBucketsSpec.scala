package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the scalable tercile path of [[TextQueries.ccnetBucketsFrom]]
  * (hierarchical prefix-sum ranks + closed-form ANSI-ntile bucket) as
  * bit-identical to the window `ntile(3)` formulation it replaces — for
  * every residue of n mod 3, where the first-groups-larger tie handling
  * shows. */
class CcnetBucketsSpec extends SparkSuite {

  private def viaWindow(scored: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("lang")
      .orderBy(col("mean_nll_micro").asc, col("doc_id").asc)
    scored
      .withColumn("bucket", ntile(3).over(w).cast("long"))
      .groupBy("lang", "bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        min("mean_nll_micro").as("min_nll_micro"),
        max("mean_nll_micro").as("max_nll_micro"))
  }

  test("prefix-sum terciles equal window ntile(3) on random frames") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // Sizes chosen to hit every n % 3 residue per language, plus a
    // 1-row and 2-row language (fewer rows than tiles).
    (0 until 4).foreach { round =>
      val rows = for {
        (lang, n) <- Seq(
          ("aa", 7 + round), ("bb", 9 + round), ("cc", 2), ("dd", 1))
        i <- 0 until n
      } yield (lang.hashCode.toLong * 1000 + i + round, // doc_id
        // Duplicated nll values exercise the doc_id tiebreak.
        3000000L + rnd.nextInt(20) * 7000L,
        lang)
      val scored = rows.toDF("doc_id", "mean_nll_micro", "lang")
      val fast = TextQueries.ccnetBucketsFrom(scored)
        .collect().map(_.toSeq).toSet
      val slow = viaWindow(scored).collect().map(_.toSeq).toSet
      assert(fast == slow, s"round $round")
    }
  }

  test("plan has no single-partition exchange and no lang-wide sort window") {
    val scored = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), (col("doc_id") % 97 * 35000).as("mean_nll_micro"),
        col("lang"))
    val p = TextQueries.ccnetBucketsFrom(scored)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"no operator may demand a single partition:\n$p")
    // The ranking window must partition by the composite range bucket,
    // never by lang alone (single-digit parallelism at corpus scale).
    assert(p.contains("hashpartitioning(__bucket"),
      s"expected the composite-bucket keyed window:\n$p")
  }
}
