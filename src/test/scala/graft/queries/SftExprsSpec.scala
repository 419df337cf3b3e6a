package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the shared SFT expressions ([[EventQueries.Sft]]) — ONE
  * definition consumed by the batch faces and the stateful streaming
  * twins, so these laws hold for every face at once. */
class SftExprsSpec extends SparkSuite {

  test("convId is exact FLOOR division of the ms epoch, both signs") {
    import spark.implicits._
    // ±ms epochs straddling hour boundaries; plain `/`+cast truncates
    // toward zero and gets every negative non-multiple wrong.
    val ms = Seq(0L, 1L, 3599999L, 3600000L, 7199999L,
      -1L, -3600000L, -3600001L, -7200001L, 1893456000123L)
    val got = ms.toDF("ms")
      .select(col("ms"),
        EventQueries.Sft.convId(timestamp_millis(col("ms"))).as("cid"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    for (m <- ms)
      assert(got(m) == Math.floorDiv(m, 3600000L),
        s"convId($m) = ${got(m)}, want ${Math.floorDiv(m, 3600000L)}")
  }

  test("tok column == tokJvm on the utterance renderings") {
    import spark.implicits._
    val utts = Seq("a", "abc", "abcd", "click:123", "x" * 97, "")
    val got = utts.toDF("utt")
      .select(col("utt"), EventQueries.Sft.tok(col("utt")).as("t"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    for (u <- utts) assert(got(u) == EventQueries.Sft.tokJvm(u))
  }

  test("md5hex JVM twin equals Spark's md5 column function") {
    import spark.implicits._
    val ss = Seq("", "hello", "a | b | c", "click:42 | view:7")
    val got = ss.toDF("s")
      .select(col("s"), md5(col("s")).as("h"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    for (s <- ss) assert(got(s) == EventQueries.Sft.md5hex(s))
  }
}
