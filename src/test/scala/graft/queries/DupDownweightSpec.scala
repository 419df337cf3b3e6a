package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Soft-dedup sampling weights ([[PipelineQueries.dupDownweight]]): per
  * cluster the weights must sum to ~one document's mass (the defining
  * property of frequency-aware down-weighting), singletons keep full
  * weight, and the readout must agree doc-for-doc with the histogram
  * built from the same memoized components. */
class DupDownweightSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private lazy val weights =
    PipelineQueries.dupDownweight(spark, d).localCheckpoint(true)

  test("singletons keep exactly 1e6 micros; weight is round(1e6 / size) for all") {
    assert(weights.filter(col("cluster_size") === 1 &&
      col("weight_micros") =!= 1000000L).count() == 0L)
    // The exact-integer rounding law, re-derived independently.
    val bad = weights.filter(
      col("weight_micros") =!=
        expr("CAST((2000000 + cluster_size) DIV (2 * cluster_size) AS BIGINT)"))
    assert(bad.count() == 0L)
  }

  test("per-cluster mass: |size * weight - 1e6| <= size / 2 (one doc's worth per cluster)") {
    val bad = weights
      .select(col("component"), col("cluster_size"), col("weight_micros"))
      .distinct()
      .filter(abs(col("cluster_size") * col("weight_micros") - 1000000L)
        > col("cluster_size") / 2 + 1)
    assert(bad.count() == 0L)
  }

  test("doc-for-doc agreement with the histogram over the same components") {
    val hist = PipelineQueries.dupHistogram(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bySize = weights.groupBy("cluster_size").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySize == hist,
      "the weight table's size distribution must equal the histogram's n_docs")
  }

  test("every document appears exactly once") {
    val n = spark.read.parquet(s"$d/documents.parquet").count()
    assert(weights.count() == n)
    assert(weights.select("doc_id").distinct().count() == n)
  }
}
