package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-release manifest ([[TextQueries.releaseManifestOf]]): the
  * checksum must be invariant to scan order and partitioning (XOR
  * fold), the totals must account for every document, and a content
  * change must surface in exactly its own shard's checksum — the
  * properties that make the manifest a usable integrity sidecar. */
class ReleaseManifestSpec extends SparkSuite {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  private def rows(df: DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

  test("totals account for every document and every character") {
    val m = TextQueries.releaseManifestOf(docs).localCheckpoint(true)
    val nDocs = m.agg(sum("n_docs")).collect()(0).getLong(0)
    val nChars = m.agg(sum("n_chars")).collect()(0).getLong(0)
    assert(nDocs == docs.count())
    assert(nChars ==
      docs.agg(sum(length(col("text")).cast("long"))).collect()(0).getLong(0))
    assert(m.count() == TextQueries.ReleaseShards.toLong,
      "every shard must appear — the seeded hash spreads 500 docs over 8 shards")
  }

  test("the manifest is invariant to scan order and partitioning") {
    val base = rows(TextQueries.releaseManifestOf(docs))
    assert(rows(TextQueries.releaseManifestOf(docs.repartition(7))) == base)
    assert(rows(TextQueries.releaseManifestOf(
      docs.orderBy(col("doc_id").desc))) == base)
  }

  test("commit fold == rebuilt from scratch, and retract ∘ fold == identity") {
    val a = docs.filter(col("doc_id") % 7 =!= 3)
    val b = docs.filter(col("doc_id") % 7 === 3)
    val mA = TextQueries.releaseManifestOf(a).localCheckpoint(true)
    val mB = TextQueries.releaseManifestOf(b).localCheckpoint(true)
    assert(rows(TextQueries.manifestFold(mA, mB))
      == rows(TextQueries.releaseManifestOf(docs)))
    assert(rows(TextQueries.manifestRetract(
      TextQueries.manifestFold(mA, mB), mB)) == rows(mA))
  }

  test("an empty delta folds as a no-op") {
    val m = TextQueries.releaseManifestOf(docs).localCheckpoint(true)
    val empty = TextQueries.releaseManifestOf(docs.filter(lit(false)))
    assert(rows(TextQueries.manifestFold(m, empty)) == rows(m))
  }

  test("streaming committer: N-batch == 1-batch, any order; batch-id replay is a no-op") {
    val base = docs.filter(col("doc_id") % 7 =!= 3)
    val arrivals = docs.filter(col("doc_id") % 7 === 3)
    val parts = (0 until 3).map(i =>
      arrivals.filter(col("doc_id") % 3 === i).localCheckpoint(true))
    def run(order: Seq[Int]) = {
      val c = new TextQueries.ManifestCommitter(
        TextQueries.releaseManifestOf(base))
      order.zipWithIndex.foreach { case (p, id) =>
        c.foldBatch(parts(p), id.toLong)
      }
      rows(c.committed)
    }
    val oneShot = {
      val c = new TextQueries.ManifestCommitter(
        TextQueries.releaseManifestOf(base))
      c.foldBatch(arrivals, 0L)
      rows(c.committed)
    }
    assert(run(Seq(0, 1, 2)) == oneShot)
    assert(run(Seq(2, 0, 1)) == oneShot)
    val c = new TextQueries.ManifestCommitter(
      TextQueries.releaseManifestOf(base))
    c.foldBatch(parts(0), 7L)
    val once = rows(c.committed)
    c.foldBatch(parts(1), 7L) // same batch id, different content: replay
    assert(rows(c.committed) == once,
      "a redelivered batch id must not double-count")
  }

  test("a content change surfaces in exactly its own shard's checksum") {
    // Same-length single-char mutation: the victim's first char is a
    // non-space non-'q' letter, replaced by 'q' — the fingerprint moves
    // but n_docs, n_tokens and n_chars all stay put, so the diff
    // isolates the XOR column.
    val victim = docs
      .filter(!substring(lower(col("text")), 1, 1).isin(" ", "q", "\t"))
      .orderBy("doc_id").select("doc_id")
      .limit(1).collect()(0).getLong(0)
    val mutated = docs.select(
      col("doc_id"),
      when(col("doc_id") === victim,
        concat(lit("q"), substring(col("text"), 2, 1000000)))
        .otherwise(col("text")).as("text"))
    val before = rows(TextQueries.releaseManifestOf(docs))
    val after = rows(TextQueries.releaseManifestOf(mutated))
    val changed = after.diff(before)
    assert(changed.size == 1, s"exactly one shard row must change, got $changed")
    val beforeChanged = before.diff(after)
    assert(beforeChanged.size == 1 &&
      beforeChanged.head._1 == changed.head._1,
      "the changed row must be the victim's shard")
    // Counts identical, only the checksum differs.
    assert(beforeChanged.head.copy(_5 = 0L) == changed.head.copy(_5 = 0L))
  }
}
