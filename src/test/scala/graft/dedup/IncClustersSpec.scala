package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental connected components ([[Dedup.incrementalComponents]]):
  * folding a delivery's pairs into the stored assignment must equal
  * from-scratch clustering of corpus ∪ batch, a bridging arrival must
  * merge previously separate clusters to one root, and an empty
  * delivery is a no-op. */
class IncClustersSpec extends SparkSuite {

  import spark.implicits._

  private def comp(df: DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a bridging arrival merges two stored clusters to the global min root") {
    val stored = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val newPairs = Seq((20L, 2L), (20L, 11L)).toDF("id_a", "id_b")
    val merged = comp(Dedup.incrementalComponents(stored, newPairs))
    assert(merged == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 20L -> 1L))
  }

  test("an empty delivery is a no-op on the stored assignment") {
    val stored = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val empty = stored.limit(0).select(
      col("id").as("id_a"), col("component").as("id_b"))
    assert(comp(Dedup.incrementalComponents(stored, empty))
      == comp(stored))
  }

  test("artifact-driven incremental pairs == recomputing incremental pairs") {
    import graft.queries.PipelineQueries._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % MinhashIncMod =!= 0)
    val batch = docs.filter(col("doc_id") % MinhashIncMod === 0)
    def pairs(df: DataFrame) = df.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = pairs(Dedup.minhashIncrementalFromArtifacts(
      Dedup.bandTable(corpus, "doc_id", "text", MinhashHashes, MinhashBands),
      Dedup.shingleRows(corpus, "doc_id", "text"),
      batch, "doc_id", "text", MinhashHashes, MinhashBands, MinhashThreshold))
    val recomputed = pairs(Dedup.minhashIncremental(
      corpus, batch, "doc_id", "text",
      MinhashHashes, MinhashBands, MinhashThreshold))
    assert(stored == recomputed)
  }

  test("real fixture: incremental == from-scratch clustering of corpus ∪ batch") {
    import graft.queries.PipelineQueries._
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val fromScratch = Dedup.connectedComponents(
      Dedup.minhashDuplicates(docs, "doc_id", "text",
          MinhashHashes, MinhashBands, MinhashThreshold)
        .select("id_a", "id_b"))
    assert(comp(incrementalClusters(spark, d)) == comp(fromScratch))
  }
}
