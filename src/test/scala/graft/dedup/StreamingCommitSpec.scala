package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The laws of the streaming corpus commit ([[StreamingCommit]]):
  *
  *   - stream == batch: one delivery folds to EXACTLY the one-shot
  *     [[Dedup.commitArtifacts]] artifacts (same ids, same rows);
  *   - batching invariance: any split of the same deliveries commits the
  *     same id-free artifacts, and the id-carrying ones agree up to
  *     which duplicate-content id was kept (duplicate fingerprints imply
  *     identical word sequences, so counts and id-free projections are
  *     split-invariant);
  *   - replay safety: a re-delivered batch id is skipped, and
  *     re-delivered CONTENT under a fresh batch id is a no-op (the gate
  *     rejects every row against the committed fingerprint set).
  */
class StreamingCommitSpec extends SparkSuite {

  private val Mod = 10
  private lazy val docs =
    graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val corpus = docs.filter(col("doc_id") % Mod =!= 0)
  private lazy val batchAll =
    docs.filter(col("doc_id") % Mod === 0).localCheckpoint(true)

  private def mk() =
    new StreamingCommit(corpus, "doc_id", "text", 8, 4, 8)

  private def symDiff(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  test("one streamed delivery == the one-shot batch commit, row for row") {
    val sc = mk()
    sc.foldBatch(batchAll, 0L)
    val c = sc.committed
    val a = Dedup.commitArtifacts(corpus, batchAll, "doc_id", "text", 8, 4, 8)
    assert(symDiff(c.fingerprints, a.fingerprints) == 0, "fingerprints")
    assert(symDiff(c.bandTable, a.bandTable) == 0, "minhash bands")
    assert(symDiff(c.spanFps, a.spanFps) == 0, "span fps")
    assert(symDiff(c.simhashBands, a.simhashBands) == 0, "simhash bands")
    assert(symDiff(c.ngramPostings, a.ngramPostings) == 0, "ngram postings")
    assert(symDiff(c.ngramDf, a.ngramDf) == 0, "ngram df sidecar")
    assert(symDiff(c.shingleSets, a.shingleSets) == 0, "shingle sets")
    assert(symDiff(c.accepted, a.accepted) == 0, "accepted docs")
  }

  test("1-batch == 3-batch committed artifacts (id-free exact; id-carrying by count)") {
    val one = mk()
    one.foldBatch(batchAll, 0L)
    val three = mk()
    // Deliberately out-of-id-order slices: the keeper for a duplicate
    // fingerprint may differ from the batch face's min-id rule, which is
    // exactly what the invariance claim must survive.
    three.foldBatch(batchAll.filter(col("doc_id") % 3 === 2), 0L)
    three.foldBatch(batchAll.filter(col("doc_id") % 3 === 0), 1L)
    three.foldBatch(batchAll.filter(col("doc_id") % 3 === 1), 2L)
    val c1 = one.committed
    val c3 = three.committed
    // Id-free artifacts: exactly equal.
    assert(symDiff(c1.fingerprints, c3.fingerprints) == 0, "fingerprints")
    assert(symDiff(c1.spanFps, c3.spanFps) == 0, "span fps")
    assert(symDiff(c1.ngramDf, c3.ngramDf) == 0, "ngram df")
    // Id-carrying artifacts: identical up to kept id — equal counts and
    // equal id-free projections (multiset compare via exceptAll).
    def dropId(df: DataFrame) = df.drop("id")
    assert(symDiff(dropId(c1.bandTable), dropId(c3.bandTable)) == 0,
      "minhash band rows (id-free)")
    assert(symDiff(dropId(c1.simhashBands), dropId(c3.simhashBands)) == 0,
      "simhash band rows (id-free)")
    assert(symDiff(dropId(c1.ngramPostings), dropId(c3.ngramPostings)) == 0,
      "ngram posting rows (id-free)")
    assert(symDiff(dropId(c1.shingleSets), dropId(c3.shingleSets)) == 0,
      "shingle-set rows (id-free)")
    assert(c1.accepted.count() == c3.accepted.count(), "accepted count")
  }

  test("replay is a no-op: by batch id and by content") {
    val sc = mk()
    val half = batchAll.filter(expr("(doc_id div 10) % 2 = 0"))
    sc.foldBatch(half, 0L)
    val before = sc.committed
    val counts0 = Seq(
      before.fingerprints.count(), before.bandTable.count(),
      before.spanFps.count(), before.simhashBands.count(),
      before.ngramPostings.count(), before.shingleSets.count(),
      before.accepted.count())
    // Failure-recovery replay: same batch id — skipped outright.
    sc.foldBatch(half, 0L)
    assert(sc.committed eq before, "same batch id must be skipped")
    // Content replay: fresh batch id, same rows — the gate rejects all,
    // every delta is empty, every committed artifact is unchanged.
    sc.foldBatch(half, 7L)
    val after = sc.committed
    val counts1 = Seq(
      after.fingerprints.count(), after.bandTable.count(),
      after.spanFps.count(), after.simhashBands.count(),
      after.ngramPostings.count(), after.shingleSets.count(),
      after.accepted.count())
    assert(counts0 == counts1, s"content replay changed state: $counts0 -> $counts1")
    assert(symDiff(before.fingerprints, after.fingerprints) == 0)
    // And the rest of the original batch still commits afterwards.
    sc.foldBatch(batchAll.filter(expr("(doc_id div 10) % 2 = 1")), 8L)
    assert(sc.committed.accepted.count() > before.accepted.count())
  }
}
