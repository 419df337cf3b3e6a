package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the scalable analytic-window path of
  * [[EventQueries.windowFamilyFrom]] (one (part, id-range-bucket)-keyed
  * window + bounded driver stitch, closed-form ANSI ntile(4), rank/count
  * cume_dist) as bit-identical to the `Window.partitionBy(event_type)`
  * formulation it replaces — across every n mod 4 residue (where ANSI
  * ntile's first-buckets-larger rule shows), parts smaller than the tile
  * count, null values at bucket boundaries, and a null partition key. */
class WindowFamilySpec extends SparkSuite {

  private def viaWindow(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("event_id")
    ev.select(
      col("event_id"),
      col("event_type"),
      col("value_cents"),
      lag("value_cents", 1).over(w).as("prev_cents"),
      lead("value_cents", 1).over(w).as("next_cents"),
      ntile(4).over(w).cast("long").as("quartile"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  test("prefix-sum analytics equal the event_type window on random frames") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 4).foreach { round =>
      // Sizes hit every n % 4 residue; "dd" has fewer rows than tiles;
      // "ee" is a single row (lag, lead, cume all degenerate). Sparse,
      // shuffled ids force real bucket boundaries inside each part, and
      // ~20% null values land on some of those boundaries.
      val rows = for {
        (typ, n) <- Seq(("aa", 17 + round), ("bb", 24 + round),
          ("cc", 9 + round), ("dd", 3), ("ee", 1), (null, 5))
        i <- 0 until n
      } yield (
        rnd.nextLong() % 1000000L,
        typ,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(10000).toLong))
      // Distinct ids only (the documented unique-key contract).
      val distinctRows = rows.groupBy(_._1).map(_._2.head).toSeq
      val ev = distinctRows.toDF("event_id", "event_type", "value_cents")
      val fast = EventQueries.windowFamilyFrom(ev)
        .collect().map(_.toSeq).toSet
      val slow = viaWindow(ev).collect().map(_.toSeq).toSet
      assert(fast == slow, s"round $round")
    }
  }

  test("empty input yields an empty result") {
    import spark.implicits._
    val ev = Seq.empty[(Long, String, Long)]
      .toDF("event_id", "event_type", "value_cents")
    assert(EventQueries.windowFamilyFrom(ev).count() == 0L)
  }

  test("a too-fine partition key fails the bounded-stitch guard loudly") {
    import spark.implicits._
    val ev = (0L until 50L).map(i => (i, s"t$i", i))
      .toDF("event_id", "event_type", "value_cents")
    val e = intercept[IllegalArgumentException] {
      graft.operators.PrefixSum.partitionedAnalytics(
        ev,
        part = col("event_type"),
        bucket = col("event_id"), // one bucket per row: worst case
        order = Seq(col("event_id")),
        value = col("value_cents"),
        rankOut = "r", lagOut = "lg", leadOut = "ld", countOut = "n",
        maxStitch = 10)
    }
    assert(e.getMessage.contains("too fine"))
  }

  test("plan has no event_type-keyed window and no single-partition exchange") {
    val ev = graft.queries.Tables
      .events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"),
        (col("event_id") % 97).as("value_cents"))
    val p = EventQueries.windowFamilyFrom(ev)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"no operator may demand a single partition:\n$p")
    // The analytic window must partition by (part, range bucket), never
    // by event_type alone — a ~5-value key sorts each type's entire
    // history in one task at corpus scale.
    assert(p.contains("hashpartitioning(__part"),
      s"expected the (part, bucket)-keyed window:\n$p")
    assert(!p.contains("windowspecdefinition(event_type#"),
      s"analytics use an event_type-keyed window:\n$p")
  }
}
