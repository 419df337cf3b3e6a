package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Laws of the corpus version diff ([[Dedup.corpusDiff]]): identity diff
  * is all-unchanged, planted mutations classify exactly, the output
  * partitions the id universe, and null text is presence, not absence. */
class CorpusDiffSpec extends SparkSuite {

  import spark.implicits._

  test("diff(v, v) is unchanged everywhere") {
    val v = Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"))
      .toDF("doc_id", "text")
    val got = Dedup.corpusDiff(v, v, "doc_id", "text").collect()
    assert(got.length == 3)
    assert(got.forall(_.getString(1) == "unchanged"))
  }

  test("planted add / remove / change classify exactly, ids partition") {
    val v1 = Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"))
      .toDF("doc_id", "text")
    val v2 = Seq((2L, "bravo"), (3L, "charlie edited"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Dedup.corpusDiff(v1, v2, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("whitespace-normalized equality counts as unchanged (fingerprint semantics)") {
    val v1 = Seq((1L, "Alpha  Bravo")).toDF("doc_id", "text")
    val v2 = Seq((1L, "alpha bravo")).toDF("doc_id", "text")
    val got = Dedup.corpusDiff(v1, v2, "doc_id", "text").collect()
    assert(got.head.getString(1) == "unchanged")
  }

  test("null text is presence: null == null is unchanged, null vs text is changed") {
    val v1 = Seq((1L, null: String), (2L, null: String))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, null: String), (2L, "now populated"))
      .toDF("doc_id", "text")
    val got = Dedup.corpusDiff(v1, v2, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("real fixture: q_corpus_diff statuses reproduce the planted mutation counts") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, d)
    val got = graft.queries.PipelineQueries.corpusDiffQ(spark, d)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = graft.queries.PipelineQueries.DiffMod
    val n = docs.count()
    val nRemoved = docs.filter(col("doc_id") % m === 0).count()
    val nChanged = docs.filter(col("doc_id") % m === 5).count()
    val nAdded = docs.filter(col("doc_id") % m === 7).count()
    assert(got.getOrElse("removed", 0L) == nRemoved)
    assert(got.getOrElse("changed", 0L) == nChanged)
    assert(got.getOrElse("added", 0L) == nAdded)
    assert(got.getOrElse("unchanged", 0L) == n - nRemoved - nChanged)
    assert(got.values.sum == n + nAdded, "statuses must partition the id universe")
  }
}
