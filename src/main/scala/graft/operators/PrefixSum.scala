package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Globally-ordered prefix computations WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no PARTITION BY moves every row to one
  * partition — the classic scale-killer (Spark logs "No Partition Defined
  * for Window operation"). But a global cumulative sum / run numbering
  * decomposes hierarchically: partition rows by any COARSE BUCKET that is
  * non-decreasing along the global order (a date, `id div N`), compute the
  * prefix locally per bucket with a keyed window (scales out), then stitch
  * buckets with per-bucket summaries — a bounded, #buckets-sized driver
  * fold, the same justified-bounded-collect pattern as IVF's centroid
  * ranking. Results are bit-identical to the global-window formulation;
  * only the plan shape changes.
  *
  * Reference semantics served: the single-transcript global orderings of
  * `preprocessor.py:109-165` (run detection) and the greedy chunk packer's
  * prefix sums (`big_chunkeroosky.py:60-104`) at corpus scale.
  */
object PrefixSum {

  /** Null-safe stitch key for a bucket value: buckets join between the
    * driver-computed offsets and the frame on this string key, and a null
    * bucket (e.g. a null timestamp date) must neither NPE on the driver
    * nor silently drop its rows in the join. */
  private val NullBucketKey = "\u0000__null_bucket"
  private def bucketKey(b: Any): String =
    if (b == null) NullBucketKey else b.toString
  private def bucketKeyCol(c: Column): Column =
    coalesce(c.cast("string"), lit(NullBucketKey))

  /** The stitch joins the driver-side `Row.get(...).toString` key against
    * the frame-side `cast(string)` — identical for atomic types, but a
    * STRUCT bucket renders as `[a,1]` on the driver and `{a, 1}` in the
    * cast, so every row would silently miss the join and the output would
    * be EMPTY. Refuse composite buckets loudly; callers encode composite
    * buckets as ordered strings instead (e.g. `format_string("%s%020d",
    * …)`, see TextQueries.ccnetBucketsFrom). */
  private def requireAtomicBucket(df: DataFrame): Unit =
    requireAtomicCol(df, "__bucket")

  private def requireAtomicCol(df: DataFrame, name: String): Unit = {
    val dt = df.schema(name).dataType
    require(
      !dt.isInstanceOf[org.apache.spark.sql.types.StructType] &&
        !dt.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
        !dt.isInstanceOf[org.apache.spark.sql.types.MapType],
      s"PrefixSum $name must be an atomic type, got ${dt.simpleString}: " +
        "composite keys stringify differently on the driver and in the " +
        "stitch join — encode them as one ordered string column")
  }

  /** Order-preserving, bounded-cardinality bucket of a long column for
    * the hierarchical prefix ops: the OBSERVED range of `c` (one tiny
    * agg — pass a materialized frame) is split into ≤ 2^bits
    * power-of-two-wide buckets. Shift-then-rebase: arithmetic
    * `shiftright` is monotone in the signed value, and after shifting
    * both operands sit within ~2^bits of each other, so the rebase can
    * never overflow under ANSI mode — correct for ANY Long distribution
    * (dense ints, sparse 64-bit hashes, negative values). A fixed
    * divisor gets this wrong twice: sparse ids → one bucket per row
    * (unbounded stitch), narrow ranges → one bucket total (single-task
    * window). Returns a non-negative value that zero-pads stably into
    * `format_string("%s<sep>%020d", keyPrefix, bucket)` composites
    * (call sites use U+0001 as the separator). */
  def adaptiveRangeBucket(df: DataFrame, c: Column, bits: Int): Column = {
    // bits=0 (or negative) with a 64-bit range would compute shift=64,
    // which the JVM/Spark shiftright masks to 0 — silently one bucket
    // per DISTINCT VALUE, turning the bounded driver stitch into an
    // unbounded collect. Refuse loudly instead.
    require(bits >= 1 && bits <= 63,
      s"adaptiveRangeBucket bits must be in [1, 63], got $bits")
    val b = df.agg(min(c), max(c)).head()
    if (b.isNullAt(0)) lit(0L) // empty or all-null: one bucket
    else {
      val lo = b.getLong(0)
      val range = BigInt(b.getLong(1)) - BigInt(lo) // ≥ 0, < 2^64
      val shift = math.max(0, range.bitLength - bits)
      shiftright(c, shift) - lit(lo >> shift)
    }
  }

  /** Global cumulative sum of `value` along `order` (inclusive of the
    * current row), emitted as column `out`. `bucket` must be a
    * non-decreasing function of `order` (e.g. `to_date(ts)` when ordering
    * by ts, or `id div 1000` when ordering by id).
    *
    * `value` must be integral (the driver fold accumulates exact longs —
    * a non-long sum fails loudly below, never silently truncates). Nulls
    * count as 0, i.e. this computes `sum(coalesce(value, 0)) OVER (ORDER
    * BY order)` — identical to `sum(value) OVER` except on an all-null
    * prefix, where SQL yields NULL and this yields 0. */
  def globalCumsum(
      df: DataFrame,
      bucket: Column,
      order: Seq[Column],
      value: Column,
      out: String
  ): DataFrame = {
    val local = Window.partitionBy("__bucket").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = df
      .withColumn("__bucket", bucket)
      .withColumn("__v", coalesce(value, lit(0L)))
      .withColumn("__local", sum(col("__v")).over(local))
    requireAtomicBucket(withLocal)
    require(
      withLocal.schema("__local").dataType == org.apache.spark.sql.types.LongType,
      s"globalCumsum requires an integral value column; sum type is " +
        s"${withLocal.schema("__local").dataType.simpleString}, not bigint")
    // Per-bucket totals: #buckets rows, collected and folded on the
    // driver (bounded by construction — buckets are coarse).
    val totals = withLocal
      .groupBy("__bucket")
      .agg(sum(col("__v")).as("__tot"))
      .orderBy("__bucket")
      .collect()
    var acc = 0L
    val offsets = totals.map { r =>
      val off = acc
      // All-null buckets contribute 0; a null bucket value (orderBy puts
      // it first, matching the global window's nulls-first order) keys
      // through the same sentinel used in the join below.
      acc += (if (r.isNullAt(1)) 0L else r.getLong(1))
      (bucketKey(r.get(0)), off)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__bucket_s", "__off")
    withLocal
      .join(broadcast(offDf), bucketKeyCol(col("__bucket")) === col("__bucket_s"))
      .withColumn(out, col("__local") + col("__off"))
      .drop("__bucket", "__bucket_s", "__v", "__local", "__off")
  }

  /** Global run numbering: consecutive rows (along `order`) with equal
    * `typ` share a run id; ids are 1-based and increment at every type
    * change — identical to `sum(chg) OVER (ORDER BY order)` with
    * `chg = typ != lag(typ)`. Runs crossing bucket boundaries are stitched
    * via the per-bucket (first, last) types in the driver fold. */
  def globalRunIds(
      df: DataFrame,
      bucket: Column,
      order: Seq[Column],
      typ: Column,
      out: String
  ): DataFrame = {
    val w = Window.partitionBy("__bucket").orderBy(order: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = df
      .withColumn("__bucket", bucket)
      .withColumn("__t", typ)
      .withColumn("__ord", struct(order: _*))
      .withColumn(
        "__chg",
        when(col("__t") === lag(col("__t"), 1).over(w), 0L).otherwise(1L))
      .withColumn("__local_run", sum(col("__chg")).over(cum))
    requireAtomicBucket(withLocal)
    val summaries = withLocal
      .groupBy("__bucket")
      .agg(
        max(col("__local_run")).as("__k"),
        min_by(col("__t"), col("__ord")).as("__first"),
        max_by(col("__t"), col("__ord")).as("__last"))
      .orderBy("__bucket")
      .collect()
    // Driver fold over bucket summaries: a bucket whose first type equals
    // the previous bucket's last type CONTINUES that run (merge = 1), so
    // it contributes k-1 new runs and its local ids shift down by one.
    var r = 0L
    var prevLast: Option[Any] = None
    val stitched = summaries.map { row =>
      val k = row.getAs[Long]("__k")
      // Null types never continue a run (SQL: null === x is null → new
      // run), so a null first/last never merges.
      val first = row.get(2)
      val merge =
        if (first != null && prevLast.exists(p => p != null && p == first)) 1L
        else 0L
      val off = r
      r += k - merge
      prevLast = Some(row.get(3))
      (bucketKey(row.get(0)), off, merge)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = stitched.toDF("__bucket_s", "__off", "__merge")
    withLocal
      .join(broadcast(offDf), bucketKeyCol(col("__bucket")) === col("__bucket_s"))
      .withColumn(out, col("__off") + col("__local_run") - col("__merge"))
      .drop("__bucket", "__bucket_s", "__t", "__ord", "__chg",
        "__local_run", "__off", "__merge")
  }

  /** The per-PARTITION analytic-window primitives — 1-based row rank,
    * lag(value, 1), lead(value, 1), and the partition row count — over
    * `order` within `part`, WITHOUT a part-keyed window. A
    * `Window.partitionBy(part)` with a coarse key (an event type, a
    * language) sorts each key's entire history in ONE task — the same
    * scale killer [[globalCumsum]] exists to avoid, just partitioned by
    * a handful of values instead of one. Here the window is keyed by
    * `(part, bucket)` (scales out with the bucket count), and one
    * bounded driver fold over the per-(part, bucket) summaries stitches
    * everything a downstream analytic needs:
    *
    *  - `rankOut`: bucket-local row_number + the cumulative count of
    *    earlier buckets in the same part (resets at part changes);
    *  - `countOut`: the part's total row count — with the rank this
    *    yields ntile-k via the closed-form ANSI formula and cume_dist
    *    via rank/count, with no further pass;
    *  - `lagOut`/`leadOut`: bucket-local lag/lead, with each bucket's
    *    FIRST row taking the previous same-part bucket's last value and
    *    its LAST row the next same-part bucket's first value (null at
    *    true part edges, exactly like the part-keyed window).
    *
    * `bucket` must be non-decreasing along `order` within each `part`
    * (same contract as [[globalCumsum]]; [[adaptiveRangeBucket]] of the
    * leading order column is the usual choice). `value` must be LongType
    * so the driver rebuilds boundary values losslessly. Ranks treat rows
    * as distinct (no peer handling): callers deriving cume_dist assume a
    * unique `order` key and must document that. Output is bit-identical
    * to the part-keyed window formulation; only the plan shape changes
    * (WindowFamilySpec pins the equality on randomized frames). */
  /** Cap on [[partitionedAnalytics]]' driver-stitch cardinality: with
    * ≤ 2^12 range buckets this allows 256 partition-key values — far
    * past any "coarse key" (event types, languages) while refusing a
    * fine key (user ids) before it OOMs the driver. ~1 M summary rows
    * × ~60 B ≈ 64 MB worst case. */
  val MaxStitchRows: Int = 1 << 20

  def partitionedAnalytics(
      df: DataFrame,
      part: Column,
      bucket: Column,
      order: Seq[Column],
      value: Column,
      rankOut: String,
      lagOut: String,
      leadOut: String,
      countOut: String,
      maxStitch: Int = MaxStitchRows
  ): DataFrame = {
    val w = Window.partitionBy("__part", "__bucket").orderBy(order: _*)
    val withLocal = df
      .withColumn("__part", part)
      .withColumn("__bucket", bucket)
      .withColumn("__v", value)
      .withColumn("__ord", struct(order: _*))
      .withColumn("__lag", lag(col("__v"), 1).over(w))
      .withColumn("__lead", lead(col("__v"), 1).over(w))
      .withColumn("__rn", row_number().over(w).cast("long"))
    requireAtomicBucket(withLocal)
    requireAtomicCol(withLocal, "__part")
    require(
      withLocal.schema("__v").dataType == org.apache.spark.sql.types.LongType,
      s"partitionedAnalytics requires a bigint value column, got " +
        withLocal.schema("__v").dataType.simpleString)
    // Per-(part, bucket) summaries: #parts × #buckets rows, bounded by
    // construction WHEN part is coarse (the documented contract —
    // buckets are ≤ 2^bits from adaptiveRangeBucket, but part
    // cardinality is the caller's). A fine part key (a user id, a doc
    // id) would turn this into an unbounded driver collect, so the
    // fetch is capped and over-cap fails loudly instead of OOMing the
    // driver. Column pruning drops the Window node from this branch
    // (count/min_by/max_by reference no window output), so the summary
    // pass is a plain partial-agg scan.
    val summaries = withLocal
      .groupBy("__part", "__bucket")
      .agg(
        count(lit(1)).as("__bn"),
        min_by(col("__v"), col("__ord")).as("__first"),
        max_by(col("__v"), col("__ord")).as("__last"))
      .orderBy("__part", "__bucket")
      .limit(maxStitch + 1)
      .collect()
    require(summaries.length <= maxStitch,
      s"partitionedAnalytics stitch exceeds $maxStitch (part, bucket) " +
        "rows — the partition key is too fine for a bounded driver " +
        "stitch; use a keyed window directly for fine keys")
    val partTotals: Map[String, Long] = summaries
      .groupBy(r => bucketKey(r.get(0)))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    // Driver chain: rank offsets accumulate within a part and reset at
    // part changes; boundary lag/lead values come from the ADJACENT
    // summary row when (and only when) it belongs to the same part — a
    // null boundary value stays null, which is also what the part-keyed
    // window's lag/lead would have returned for a null neighbor value.
    var off = 0L
    var prevPart: String = null
    val stitched = summaries.indices.map { i =>
      val r = summaries(i)
      val pk = bucketKey(r.get(0))
      if (pk != prevPart) { off = 0L; prevPart = pk }
      val o = off
      off += r.getLong(2)
      val prevLast =
        if (i > 0 && bucketKey(summaries(i - 1).get(0)) == pk &&
          !summaries(i - 1).isNullAt(4)) Some(summaries(i - 1).getLong(4))
        else None
      val nextFirst =
        if (i + 1 < summaries.length &&
          bucketKey(summaries(i + 1).get(0)) == pk &&
          !summaries(i + 1).isNullAt(3)) Some(summaries(i + 1).getLong(3))
        else None
      (pk, bucketKey(r.get(1)), o, partTotals(pk), r.getLong(2),
        prevLast, nextFirst)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = stitched.toDF(
      "__part_s", "__bucket_s", "__off", "__pn", "__bsz", "__prev", "__next")
    withLocal
      .join(
        broadcast(offDf),
        bucketKeyCol(col("__part")) === col("__part_s") &&
          bucketKeyCol(col("__bucket")) === col("__bucket_s"))
      .withColumn(rankOut, col("__off") + col("__rn"))
      .withColumn(countOut, col("__pn"))
      // __rn (not __lag IS NULL) detects bucket edges: a null __lag can
      // also mean "previous row's VALUE is null", which must stay null.
      .withColumn(lagOut,
        when(col("__rn") === 1L, col("__prev")).otherwise(col("__lag")))
      .withColumn(leadOut,
        when(col("__rn") === col("__bsz"), col("__next"))
          .otherwise(col("__lead")))
      .drop("__part", "__bucket", "__v", "__ord", "__lag", "__lead", "__rn",
        "__part_s", "__bucket_s", "__off", "__pn", "__bsz", "__prev", "__next")
  }
}
