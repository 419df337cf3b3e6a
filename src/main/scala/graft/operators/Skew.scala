package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE handles moderate skew at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); these are the explicit
  * patterns for the pathological cases AQE can't fix — a single hot key
  * that swamps one reducer (the "null user", the viral document, the
  * default-value join key).
  */
object Skew {

  /** Two-phase salted aggregation: spread each key over `salts` partial
    * groups, aggregate, then combine the partials. Correct for any
    * commutative-monoid aggregate; exposed for the common count+sum shape.
    *
    * The salt is `monotonically_increasing_id % salts` — run-dependent,
    * but the final re-aggregation makes the RESULT deterministic for
    * exact aggregates (counts, integer/decimal sums). Floating-point sum
    * columns are NOT bit-deterministic here: the salt-dependent partial
    * grouping changes summation order, so low bits can differ run-to-run.
    * Route float sums through exact integer cents (`round(x*100)::long`,
    * the repo-wide convention) when bit-stable output matters.
    */
  def saltedCountSum(
      df: DataFrame,
      keyCols: Seq[String],
      sumCols: Seq[String],
      salts: Int = 16
  ): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        count(lit(1)).as("__cnt"),
        sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*
      )
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__cnt")).as("n"),
        sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*
      )
  }

  /** Salted broadcast-free join for a skewed key: the big side gets a
    * random salt in [0, salts); the small side is replicated `salts`
    * times; the join key becomes (key, salt), splitting each hot key's
    * rows across `salts` reducers. Semantics identical to
    * `big.join(small, keys)` (inner). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int = 16
  ): DataFrame = {
    val saltedBig = big.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(salts)))
    val replicatedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig
      .join(replicatedSmall, keys :+ "__salt")
      .drop("__salt")
  }
}
