package graft.operators

import graft.SparkSuite

/** Semantics of the union-window as-of join. */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val trades = Seq(
    (1L, "A", 10L, 100.0),
    (2L, "A", 20L, 101.0),
    (3L, "B", 15L, 50.0),
    (4L, "A", 5L, 99.0) // before any quote
  ).toDF("id", "sym", "t", "price")

  private lazy val quotes = Seq(
    (101L, "A", 8L, 1.0),
    (102L, "A", 10L, 2.0), // same ts as trade 1 → matched (inclusive)
    (103L, "A", 19L, 3.0),
    (104L, "B", 1L, 9.0)
  ).toDF("id", "sym", "t", "bid")

  test("matches the latest at-or-before right row per key") {
    val out = AsOfJoin
      .asOf(trades, quotes, Seq("sym"), "t", "t", "id", Seq("bid"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("asof_bid")).map(_.toDouble))
      .toMap
    assert(out(1L).contains(2.0)) // inclusive same-ts match
    assert(out(2L).contains(3.0))
    assert(out(3L).contains(9.0)) // cross-key isolation
    assert(out(4L).isEmpty) // nothing at-or-before → null
  }

  test("left payload columns survive") {
    val out = AsOfJoin
      .asOf(trades, quotes, Seq("sym"), "t", "t", "id", Seq("bid"))
    assert(out.columns.toSet == Set("sym", "t", "id", "price", "asof_bid"))
    assert(out.count() == 4)
  }

  test("same-timestamp right ties resolve to the highest tie-break value") {
    val dupQuotes = Seq(
      (201L, "A", 10L, 7.0),
      (202L, "A", 10L, 8.0)
    ).toDF("id", "sym", "t", "bid")
    val out = AsOfJoin
      .asOf(trades.filter($"id" === 1L), dupQuotes, Seq("sym"), "t", "t",
        "id", Seq("bid"))
      .head()
    // Deterministic: ordered by (ts, side, tie) — the larger quote id is
    // the last carried value.
    assert(out.getAs[Double]("asof_bid") == 8.0)
  }
}
