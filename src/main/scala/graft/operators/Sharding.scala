package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic seeded shard assignment — the final "write N shards"
  * step of a training-data pipeline. Training wants the corpus globally
  * shuffled (so consecutive batches are not topically correlated) and
  * split into a fixed number of output shards, and the whole layout must
  * be REPRODUCIBLE from (corpus, seed) alone: re-running the pipeline,
  * on any engine, must place every item in the same shard at the same
  * position.
  *
  * The shuffle key is the 60-bit md5 slice of `seed ":" item`
  * ([[graft.dedup.Dedup.hash60]] — engine-exact, the repo-wide hashing
  * contract), which is a deterministic pseudorandom permutation of the
  * item space; `shard = key % numShards` balances shards to binomial
  * fluctuation, and the within-shard order is ascending (key, item) —
  * the seeded global shuffle, reproducible anywhere md5 exists.
  *
  * Scale shape: the per-shard position comes from
  * [[PrefixSum.globalCumsum]] over (shard, key-range) buckets — NEVER a
  * shard-keyed window, which would sort |corpus|/N rows in one task per
  * shard (the coarse-key scale killer: production shard counts are in
  * the hundreds while executors number thousands). The per-shard offsets
  * are an N-row driver fold, the same bounded-stitch discipline as the
  * packer's per-language offsets. */
object Sharding {

  /** Per-item assignment: (item, skey, shard, rnk) — `rnk` is the
    * item's 1-based position within its shard in seeded-shuffle order. */
  def assign(
      df: DataFrame,
      itemKey: Column,
      numShards: Int,
      seed: String
  ): DataFrame = {
    require(numShards >= 1, s"need numShards >= 1, got $numShards")
    // The cumsum bucket key zero-pads the shard to 5 digits so that the
    // LEXICOGRAPHIC bucket order matches the numeric shard order the
    // driver fold below assumes; past 99999 shards the two orders would
    // silently diverge and within-shard ranks corrupt — fail loudly.
    require(
      numShards <= 99999,
      s"numShards must fit the %05d bucket padding (<= 99999), got $numShards")
    val spark = df.sparkSession
    import spark.implicits._
    // Three consumers read the keyed frame (the cumsum's local windows,
    // its bucket totals, the shard-count fold) — materialize once.
    val keyed = df.select(itemKey.cast("string").as("item"))
      .withColumn(
        "skey",
        graft.dedup.Dedup.hash60(concat_ws(":", lit(seed), col("item"))))
      .withColumn("shard", col("skey") % numShards)
      .localCheckpoint(true)
    val ranked = PrefixSum.globalCumsum(
      keyed,
      bucket = format_string(
        "%05d\u0001%020d", col("shard"),
        PrefixSum.adaptiveRangeBucket(keyed, col("skey"), 12)),
      order = Seq(col("shard"), col("skey"), col("item")),
      value = lit(1L),
      out = "grank")
    val counts = keyed.groupBy("shard").agg(count(lit(1)).as("n"))
      .orderBy("shard").collect()
    var acc = 0L
    val offs = counts.map { r =>
      val o = acc; acc += r.getLong(1); (r.getLong(0), o)
    }.toSeq
    ranked
      .join(broadcast(offs.toDF("shard", "shard_off")), Seq("shard"))
      .withColumn("rnk", col("grank") - col("shard_off"))
      .select("item", "skey", "shard", "rnk")
  }

  /** Shard-level readout of [[assign]] — N rows, hash-checkable: item
    * count, key range, and an exact integer order checksum
    * Σ (skey mod 1000003)·rnk that pins the complete within-shard
    * ordering (the raw 60-bit key would overflow the sum; the modular
    * residue is engine-exact and position-sensitive). */
  def shardReadout(
      df: DataFrame,
      itemKey: Column,
      numShards: Int,
      seed: String
  ): DataFrame =
    assign(df, itemKey, numShards, seed)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_items"),
        min(col("skey")).as("min_key"),
        max(col("skey")).as("max_key"),
        sum((col("skey") % 1000003L) * col("rnk")).as("order_checksum"))
      .orderBy("shard")
}
