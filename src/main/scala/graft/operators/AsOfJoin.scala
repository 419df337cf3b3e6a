package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTs <= leftTs` in the same key group (SQL-standard ASOF JOIN
  * semantics, ties matched inclusively).
  *
  * Spark has no ASOF JOIN operator; the naive formulations are a range
  * join (O(n·m) candidate explosion) or a correlated subquery per row.
  * This implementation is the union-window technique: tag both inputs,
  * union them, and carry the latest right values forward with
  * `last(..., ignoreNulls)` over a per-key (ts, side, tie) window — ONE
  * shuffle on the key, linear work, and at corpus scale each key group is
  * windowed independently (embarrassingly parallel; skew is bounded by a
  * single key's row count, not the corpus).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its latest-at-or-before row wins)
    * @param keys      equi-join key column names (present on both sides)
    * @param leftTs    left event-time column (any orderable type)
    * @param rightTs   right event-time column (same type)
    * @param tieBreak  unique orderable column present on BOTH sides —
    *                  breaks same-timestamp ties deterministically
    * @param rightVals right columns to carry onto matching left rows
    *                  (emitted as `asof_<name>`, null when no right row
    *                  precedes the left row)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tieBreak: String,
      rightVals: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftPayload =
      leftCols.filterNot(c => keys.contains(c) || c == tieBreak || c == leftTs)
    // The right values travel as ONE struct so the carried match is always
    // a single right ROW — per-column last(ignoreNulls) would tear values
    // from different right rows whenever an individual value is null.
    val rvStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => right.schema(v).copy(name = v)))
    // side 0 = right, side 1 = left: at equal ts the right row sorts first,
    // so a same-timestamp right row IS matched (inclusive <=).
    val taggedLeft = left
      .select(
        keys.map(col) ++ Seq(
          col(leftTs).as("__ts"), lit(1).as("__side"),
          col(tieBreak).as("__tie")) ++
          leftPayload.map(col) :+
          lit(null).cast(rvStructType).as("__rv"): _*
      )
    val taggedRight = right
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as("__ts"), lit(0).as("__side"),
          col(tieBreak).as("__tie")) ++
          leftPayload.map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(rightVals.map(v => col(v).as(v)): _*).as("__rv"): _*
      )
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft
      .unionByName(taggedRight)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++ Seq(col("__ts").as(leftTs), col("__tie").as(tieBreak)) ++
          leftPayload.map(col) ++
          rightVals.map(v => col(s"__asof.$v").as(s"asof_$v")): _*
      )
  }
}
