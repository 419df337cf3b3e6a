package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Quality threshold sweep ([[PipelineQueries.qualitySweep]]): the
  * cumulative columns must be a true survival curve — the lowest level
  * keeps the whole corpus, each level's kept mass is its own plus
  * everything above, and kept counts shrink as the threshold rises. */
class QualitySweepSpec extends SparkSuite {

  private lazy val sweep = PipelineQueries
    .qualitySweep(spark, "/root/testdata/sf0.001")
    .collect()
    .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)))
    .sortBy(_._1)

  test("the lowest threshold keeps the whole corpus") {
    val total = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(sweep.head._4 == total)
    assert(sweep.map(_._2).sum == total)
  }

  test("each level's kept mass == its own plus everything above; curve is monotone") {
    sweep.indices.foreach { i =>
      val above = sweep.drop(i)
      assert(sweep(i)._4 == above.map(_._2).sum,
        s"docs_kept at ${sweep(i)._1} must equal the suffix sum")
      assert(sweep(i)._5 == above.map(_._3).sum,
        s"tokens_kept at ${sweep(i)._1} must equal the suffix sum")
    }
    assert(sweep.map(_._4).toSeq == sweep.map(_._4).sorted.reverse.toSeq,
      "raising the threshold can only shrink the kept set")
  }
}
