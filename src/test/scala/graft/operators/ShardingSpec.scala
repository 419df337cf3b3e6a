package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Sharding]]: determinism, within-shard rank contiguity, balance,
  * and seed sensitivity of the seeded shard assignment. */
class ShardingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val items =
    (0L until 400L).map(i => s"item-$i").toDF("k")

  test("assignment is deterministic and ranks are contiguous per shard") {
    val a = Sharding.assign(items, col("k"), 8, "seed-a").collect()
    val b = Sharding.assign(items, col("k"), 8, "seed-a").collect()
    assert(a.map(_.toSeq).sortBy(_.toString).toSeq ==
      b.map(_.toSeq).sortBy(_.toString).toSeq)
    a.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val rnks = rows.map(_.getAs[Long]("rnk")).sorted.toSeq
      assert(rnks == (1L to rnks.size), "ranks must be 1..n without gaps")
    }
    // Within a shard, rank order == ascending key order (the seeded
    // shuffle's defining property).
    a.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val byRnk = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("skey"))
      assert(byRnk.toSeq == byRnk.sorted.toSeq)
    }
  }

  test("shards are balanced within binomial bounds") {
    val counts = Sharding.shardReadout(items, col("k"), 8, "seed-a")
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_items"))
    assert(counts.length == 8, "every shard must be populated on 400 items")
    val mean = 400.0 / 8
    counts.foreach { case (s, n) =>
      assert(n >= mean / 2 && n <= mean * 2,
        s"shard $s has $n items against a mean of $mean — md5 keys " +
          "should balance to binomial fluctuation")
    }
  }

  test("a different seed is a different shuffle") {
    val a = Sharding.assign(items, col("k"), 8, "seed-a")
      .select("item", "shard").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Sharding.assign(items, col("k"), 8, "seed-b")
      .select("item", "shard").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.keySet == b.keySet)
    val moved = a.count { case (k, s) => b(k) != s }
    // With 8 shards ~7/8 of items move under an independent re-hash.
    assert(moved > a.size / 2,
      s"only $moved/${a.size} items moved between seeds — keys are not seed-sensitive")
  }

  test("ingest-router key arithmetic equals the batch assignment's shard") {
    // The streaming shard router (StreamingQueries.streamShard) keys on
    // hash60(seed:item) % N — exactly Sharding.assign's shard column.
    import graft.dedup.Dedup
    val viaAssign = Sharding.assign(items, col("k"), 8, "seed-a")
      .select("item", "shard").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaRouter = items.select(
        col("k").cast("string").as("item"),
        (Dedup.hash60(concat_ws(":", lit("seed-a"), col("k").cast("string")))
          % 8).as("shard"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAssign == viaRouter)
  }

  test("numShards = 1 degenerates to one globally shuffled shard") {
    val one = Sharding.shardReadout(items, col("k"), 1, "seed-a").collect()
    assert(one.length == 1 && one.head.getAs[Long]("n_items") == 400L)
  }
}
