package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins mapOps' oracle parity on the null-type corner: a user whose
  * events are ALL null-typed must still get a zero row (the oracle GROUPs
  * BY user_id over the full table; count(DISTINCT)/CASE ignore nulls). */
class MapOpsSpec extends SparkSuite {

  test("a user with only null-typed events gets a zero row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mapops").toString
    Seq(
      (1L, 1000000000L, 10L, Some("click"), 1.0, "{}"),
      (2L, 2000000000L, 10L, None, 1.0, "{}"),
      (3L, 3000000000L, 20L, None, 1.0, "{}"), // user 20: all null types
      (4L, 4000000000L, 30L, Some("view"), 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.mapOps(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(10L) == ((1L, 0L, 1L)))
    assert(got(20L) == ((0L, 0L, 0L)), "all-null-typed user must not vanish")
    assert(got(30L) == ((0L, 1L, 1L)))
  }
}
