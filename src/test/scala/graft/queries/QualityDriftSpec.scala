package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-distribution drift monitor
  * ([[PipelineQueries.qualityDrift]]): the readout arithmetic must obey
  * the laws a total-variation monitor needs — zero drift on an
  * identical distribution, per-side fractions that sum to one within
  * floor slack, and a level missing from arrivals surfacing with its
  * full corpus mass as the delta. */
class QualityDriftSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def readout(ch: DataFrame, bh: DataFrame) =
    PipelineQueries.qualityDriftReadout(ch, bh).collect()

  private lazy val corpusHist = {
    val ta = graft.textanalysis.TextAnalysis
    Tables.documents(spark, d)
      .filter(col("doc_id") % PipelineQueries.IncrementalMod =!= 0)
      .select(ta.qualityScore(col("text")).as("quality"))
      .groupBy("quality").agg(count(lit(1)).as("corpus_n"))
      .localCheckpoint(true)
  }

  test("an identical distribution measures zero drift on every level") {
    val rows = readout(
      corpusHist,
      corpusHist.select(col("quality"), col("corpus_n").as("batch_n")))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(5) == 0L, s"level ${r.getDouble(0)} drifted")
      assert(r.getLong(3) == r.getLong(4))
    }
  }

  test("per-side fraction micros sum to 1e6 within floor slack") {
    val rows = PipelineQueries.qualityDrift(spark, d).collect()
    val levels = rows.length
    val cSum = rows.map(_.getLong(3)).sum
    val bSum = rows.filter(_.getLong(2) > 0).map(_.getLong(4)).sum
    assert(cSum <= 1000000L && cSum > 1000000L - levels)
    assert(bSum <= 1000000L && bSum > 1000000L - levels)
  }

  test("a level absent from arrivals surfaces with its corpus mass as the delta") {
    val top = corpusHist.orderBy(col("quality").desc).limit(1)
      .collect()(0).getDouble(0)
    val rows = readout(
      corpusHist,
      corpusHist.filter(col("quality") =!= top)
        .select(col("quality"), col("corpus_n").as("batch_n")))
    val missing = rows.filter(_.getDouble(0) == top)
    assert(missing.length == 1)
    assert(missing(0).getLong(2) == 0L)
    assert(missing(0).getLong(4) == 0L)
    assert(missing(0).getLong(5) == missing(0).getLong(3))
  }
}
