package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Weighted sampling under soft-dedup weights
  * ([[PipelineQueries.weightedSample]]): singletons are always kept,
  * duplicate-cluster mass is actually thinned, and the draw is a
  * deterministic function of (seed, doc_id, weights) — never of
  * partitioning or order. */
class WeightedSampleSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private lazy val sample =
    PipelineQueries.weightedSample(spark, d).localCheckpoint(true)
  private lazy val weights =
    PipelineQueries.dupDownweight(spark, d).localCheckpoint(true)

  test("every singleton is kept; only cluster members can be dropped") {
    val singletons = weights.filter(col("cluster_size") === 1)
    assert(singletons
      .join(sample, Seq("doc_id"), "left_anti").count() == 0L,
      "weight 1e6 must always pass the draw")
  }

  test("duplicate mass is actually thinned") {
    val clusterDocs = weights.filter(col("cluster_size") > 1).count()
    val clusterKept = sample.filter(col("cluster_size") > 1).count()
    assert(clusterDocs > 0L, "the fixture must contain planted near-dups")
    assert(clusterKept < clusterDocs,
      "a sample that keeps every duplicate is not downweighting")
    assert(clusterKept > 0L)
  }

  test("the draw is deterministic and a strict subset of the weight table") {
    val again = PipelineQueries.weightedSample(spark, d)
    assert(sample.exceptAll(again).count() == 0L)
    assert(again.exceptAll(sample).count() == 0L)
    assert(sample.join(weights, Seq("doc_id"), "left_anti").count() == 0L)
  }
}
