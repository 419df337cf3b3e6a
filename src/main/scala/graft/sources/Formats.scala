package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface beyond the reference's JSON-file I/O (SURVEY.md
  * §2.1): generic format read/write plus the two layout strategies that
  * matter at 100 TB — partitioned writes (coarse pruning by a low-
  * cardinality column) and bucketed tables (pre-shuffled join/agg keys).
  */
object Formats {

  /** Read any of parquet/json/csv/orc with sane defaults. CSV/JSON get
    * explicit schemas from the caller when round-tripping typed data —
    * inference is for exploration only. */
  def read(
      spark: SparkSession,
      format: String,
      path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None
  ): DataFrame = {
    val r0 = spark.read.format(format)
    val r1 = schema.fold(r0)(r0.schema)
    format match {
      case "csv"  => r1.option("header", true).load(path)
      case "json" => r1.load(path)
      case _      => r1.load(path)
    }
  }

  def write(
      df: DataFrame,
      format: String,
      path: String,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    val w = df.write.format(format).mode(mode)
    (format match {
      case "csv" => w.option("header", true)
      case _     => w
    }).save(path)
  }

  /** Hive-style partitioned write: one directory per partition value.
    * Correct for LOW-cardinality columns (lang, date, source) — readers
    * filtering on the partition column scan only matching directories
    * (partition pruning, visible as `PartitionFilters` in explain). */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed table write: pre-shuffles rows into a fixed number of
    * buckets by key so later joins/aggregations on that key skip their
    * exchange entirely — the persisted-layout answer to "co-locate this
    * join". Requires a table (metastore) target, not a bare path. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCol: Option[String] = None
  ): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }
}
