package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The laws of the TABLE-BACKED commit/retract store ([[TableCommit]]):
  *
  *   - stream == batch: one folded delivery reads back EXACTLY the
  *     one-shot [[Dedup.commitArtifacts]] artifacts (same ids, same
  *     rows) — which also pins it equal to the in-memory
  *     [[StreamingCommit]] twin, spec'd to the same frame;
  *   - batching invariance: any split of the same deliveries commits
  *     the same id-free artifacts, id-carrying ones equal up to kept id;
  *   - replay safety: by batch id and by content;
  *   - retraction: streamed takedowns read back EXACTLY
  *     [[Dedup.retractArtifacts]] (== rebuilt from scratch on
  *     corpus \ deleted, RetractSpec's law), and retract ∘ commit ==
  *     identity on all seven artifact tables.
  */
class TableCommitSpec extends SparkSuite {

  private val Mod = 10
  private lazy val docs =
    graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val corpus = docs.filter(col("doc_id") % Mod =!= 0)
  private lazy val batchAll = docs
    .filter(col("doc_id") % Mod === 0)
    .select(col("doc_id").as("id"), col("text"))
    .localCheckpoint(true)

  private def mk(cap: Int = Dedup.DefaultShingleDfCap) =
    new TableCommit(
      spark,
      java.nio.file.Files.createTempDirectory("graft_tc_spec_").toString,
      8, 4, 8, maxShingleDf = cap)
      .deploy(corpus, "doc_id", "text")

  private def symDiff(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  private def assertSame(store: TableCommit, a: Dedup.CommittedArtifacts): Unit = {
    assert(symDiff(store.committedFingerprints, a.fingerprints) == 0,
      "fingerprints")
    assert(symDiff(store.committedBands, a.bandTable) == 0, "minhash bands")
    assert(symDiff(store.committedSpanFps, a.spanFps) == 0, "span fps")
    assert(symDiff(store.committedSimhashBands, a.simhashBands) == 0,
      "simhash bands")
    assert(symDiff(store.committedNgramPostings, a.ngramPostings) == 0,
      "ngram postings")
    assert(symDiff(store.committedNgramDf, a.ngramDf) == 0, "ngram df")
    assert(symDiff(store.committedShingleSets, a.shingleSets) == 0,
      "shingle sets")
    assert(symDiff(store.accepted, a.accepted) == 0, "accepted docs")
  }

  test("one folded delivery reads back the one-shot batch commit, row for row") {
    val store = mk()
    store.foldBatch(batchAll, 0L)
    val a = Dedup.commitArtifacts(
      corpus, batchAll.select(col("id").as("doc_id"), col("text")),
      "doc_id", "text", 8, 4, 8)
    assertSame(store, a)
  }

  test("1-batch == 3-batch stored artifacts (id-free exact; id-carrying by count)") {
    val one = mk()
    one.foldBatch(batchAll, 0L)
    val three = mk()
    three.foldBatch(batchAll.filter(col("id") % 3 === 2), 0L)
    three.foldBatch(batchAll.filter(col("id") % 3 === 0), 1L)
    three.foldBatch(batchAll.filter(col("id") % 3 === 1), 2L)
    assert(symDiff(one.committedFingerprints, three.committedFingerprints) == 0)
    assert(symDiff(one.committedSpanFps, three.committedSpanFps) == 0)
    assert(symDiff(one.committedNgramDf, three.committedNgramDf) == 0)
    def dropId(df: DataFrame) = df.drop("id")
    assert(symDiff(dropId(one.committedBands), dropId(three.committedBands)) == 0)
    assert(symDiff(dropId(one.committedSimhashBands),
      dropId(three.committedSimhashBands)) == 0)
    assert(symDiff(dropId(one.committedNgramPostings),
      dropId(three.committedNgramPostings)) == 0)
    assert(symDiff(dropId(one.committedShingleSets),
      dropId(three.committedShingleSets)) == 0)
    assert(one.accepted.count() == three.accepted.count())
  }

  test("replay is a no-op: by batch id and by content") {
    val store = mk()
    val half = batchAll.filter(expr("(id div 10) % 2 = 0"))
    store.foldBatch(half, 0L)
    def counts() = Seq(
      store.committedFingerprints.count(), store.committedBands.count(),
      store.committedSpanFps.count(), store.committedSimhashBands.count(),
      store.committedNgramPostings.count(), store.committedShingleSets.count(),
      store.accepted.count())
    val c0 = counts()
    store.foldBatch(half, 0L) // same batch id: skipped
    assert(counts() == c0, "batch-id replay changed state")
    store.foldBatch(half, 7L) // content replay: gate rejects all
    assert(counts() == c0, "content replay changed state")
    store.foldBatch(batchAll.filter(expr("(id div 10) % 2 = 1")), 8L)
    assert(store.accepted.count() > c0.last)
  }

  test("streamed takedowns read back Dedup.retractArtifacts, row for row") {
    val cap = 8
    val store = new TableCommit(
      spark,
      java.nio.file.Files.createTempDirectory("graft_tc_ret_").toString,
      8, 4, 8, maxShingleDf = cap)
      .deploy(docs.select("doc_id", "text"), "doc_id", "text")
    import spark.implicits._
    val delIds = docs.filter(col("doc_id") % 7 === 3)
      .select(col("doc_id").as("id")).localCheckpoint(true)
    // Two deliveries, deliberately split, plus a content replay.
    store.retractBatch(delIds.filter(col("id") % 2 === 0), 0L)
    store.retractBatch(delIds.filter(col("id") % 2 === 1), 1L)
    store.retractBatch(delIds.filter(col("id") % 2 === 0), 2L) // replayed content
    val stored = Dedup.gateArtifactsOf(
      docs.select("doc_id", "text"), "doc_id", "text", 8, 4, 8,
      maxShingleDf = cap)
    val r = Dedup.retractArtifacts(
      stored, docs.select("doc_id", "text"), delIds, "doc_id", "text", 8,
      maxShingleDf = cap)
    assert(symDiff(store.committedFingerprints, r.fingerprints) == 0,
      "fingerprints")
    assert(symDiff(store.committedBands, r.bandTable) == 0, "minhash bands")
    assert(symDiff(store.committedSpanFps, r.spanFps) == 0, "span fps")
    assert(symDiff(store.committedSimhashBands, r.simhashBands) == 0,
      "simhash bands")
    assert(symDiff(store.committedNgramPostings, r.ngramPostings) == 0,
      "ngram postings")
    assert(symDiff(store.committedNgramDf, r.ngramDf) == 0, "ngram df")
    assert(symDiff(store.committedShingleSets, r.shingleSets) == 0,
      "shingle sets")
  }

  test("compaction is a committed-face no-op and resets the delta layers") {
    def faces(s: TableCommit) = Seq(
      s.committedFingerprints, s.committedBands, s.committedSpanFps,
      s.committedSimhashBands, s.committedNgramPostings,
      s.committedNgramDf, s.committedShingleSets)
    val half1 = batchAll.filter(expr("(id div 10) % 2 = 0"))
    val half2 = batchAll.filter(expr("(id div 10) % 2 = 1"))
    val plain = mk()
    val compacted = mk()
    for (s <- Seq(plain, compacted)) {
      s.foldBatch(half1, 0L)
      s.retractBatch(half1.select("id").filter(col("id") % 5 === 0), 1L)
    }
    compacted.compact()
    // No-op on every committed face, mid-history.
    faces(plain).zip(faces(compacted)).zipWithIndex.foreach {
      case ((a, b), i) => assert(symDiff(a, b) == 0, s"face $i after compact")
    }
    // Delta layers reset; the accepted face is now relative to the new
    // baseline.
    assert(compacted.deltaFingerprints.count() == 0)
    assert(compacted.deltaBands.count() == 0)
    assert(compacted.accepted.count() == 0)
    // Replay/takedown safety SURVIVES compaction: re-delivered
    // pre-compaction content (including the retracted docs' raw text)
    // is still rejected by the compacted ledger.
    val c0 = compacted.committedFingerprints.count()
    compacted.foldBatch(half1, 2L)
    assert(compacted.committedFingerprints.count() == c0,
      "content replay after compaction changed state")
    // And the NEXT fold lands on the uncompacted twin exactly.
    plain.foldBatch(half2, 3L)
    compacted.foldBatch(half2, 3L)
    faces(plain).zip(faces(compacted)).zipWithIndex.foreach {
      case ((a, b), i) =>
        assert(symDiff(a, b) == 0, s"face $i after post-compaction fold")
    }
  }

  test("crash recovery: reopen resumes folding on the stored tables exactly") {
    val half1 = batchAll.filter(expr("(id div 10) % 2 = 0"))
    val half2 = batchAll.filter(expr("(id div 10) % 2 = 1"))
    val plain = mk()
    val crashBase = java.nio.file.Files
      .createTempDirectory("graft_tc_crash_").toString
    val before = new TableCommit(spark, crashBase, 8, 4, 8)
      .deploy(corpus, "doc_id", "text")
    plain.foldBatch(half1, 0L)
    before.foldBatch(half1, 0L)
    // "Crash": drop the instance; all driver state (Blooms, batch-id
    // set) is gone. Reopen over the same tables.
    val reopened = TableCommit.reopen(spark, crashBase, 8, 4, 8)
    // Replay protection after a crash is CONTENT-keyed (the stronger
    // layer): the pre-crash delivery re-arrives under a FRESH batch id
    // and must still be a no-op.
    val c0 = reopened.committedFingerprints.count()
    reopened.foldBatch(half1, 99L)
    assert(reopened.committedFingerprints.count() == c0,
      "pre-crash content re-accepted after reopen")
    // And new work lands on the never-crashed twin row-for-row.
    plain.foldBatch(half2, 1L)
    reopened.foldBatch(half2, 1L)
    assert(symDiff(reopened.committedFingerprints,
      plain.committedFingerprints) == 0, "fingerprints")
    assert(symDiff(reopened.committedBands, plain.committedBands) == 0,
      "bands")
    assert(symDiff(reopened.committedSpanFps, plain.committedSpanFps) == 0,
      "span fps")
    assert(symDiff(reopened.committedNgramPostings,
      plain.committedNgramPostings) == 0, "postings")
    assert(symDiff(reopened.accepted, plain.accepted) == 0, "accepted")
    // Takedown after recovery is exact too.
    val del = reopened.accepted.select("id").filter(col("id") % 3 === 0)
    plain.retractBatch(del, 2L)
    reopened.retractBatch(del, 2L)
    assert(symDiff(reopened.committedFingerprints,
      plain.committedFingerprints) == 0, "fingerprints after retract")
  }

  test("mid-op crashes are atomic: unmarked folds/retracts leave no trace and replay heals") {
    // The round-12 ADVICE scenario: the old per-table appends could
    // commit a retraction's tombstone without its decrements (replay
    // then a permanent no-op — state never heals) or a fold's ledger
    // without its bands. Now every fold/retract is delta-writes →
    // ONE marker rename, so a crash before the marker leaves the
    // operation entirely invisible and re-delivery lands exactly.
    val half1 = batchAll.filter(expr("(id div 10) % 2 = 0"))
    val half2 = batchAll.filter(expr("(id div 10) % 2 = 1"))
    val plain = mk()
    val crashBase = java.nio.file.Files
      .createTempDirectory("graft_tc_midcrash_").toString
    val victim = new TableCommit(spark, crashBase, 8, 4, 8)
      .deploy(corpus, "doc_id", "text")
    plain.foldBatch(half1, 0L)
    // Crash INSIDE the fold, after all 9 delta writes, before the marker.
    victim.crashAt = Some("fold-before-marker")
    intercept[IllegalStateException](victim.foldBatch(half1, 0L))
    val reopened1 = TableCommit.reopen(spark, crashBase, 8, 4, 8)
    assert(reopened1.accepted.count() == 0,
      "unmarked fold visible after crash")
    // Re-delivery of the crashed content folds cleanly (content gate
    // never saw it) and lands on the never-crashed twin.
    reopened1.foldBatch(half1, 1L)
    assert(symDiff(reopened1.committedFingerprints,
      plain.committedFingerprints) == 0, "fingerprints after fold replay")
    assert(symDiff(reopened1.accepted, plain.accepted) == 0,
      "accepted after fold replay")
    // Crash INSIDE a retract, after tombstone + decrements, before the
    // marker: tombstone and decrements stay invisible TOGETHER.
    val del = plain.accepted.select("id").filter(col("id") % 3 === 0)
      .localCheckpoint(true)
    reopened1.crashAt = Some("retract-before-marker")
    intercept[IllegalStateException](reopened1.retractBatch(del, 2L))
    val reopened2 = TableCommit.reopen(spark, crashBase, 8, 4, 8)
    assert(symDiff(reopened2.committedFingerprints,
      plain.committedFingerprints) == 0,
      "crashed retract leaked partial state")
    // Replay of the retraction heals completely.
    plain.retractBatch(del, 2L)
    reopened2.retractBatch(del, 99L)
    assert(symDiff(reopened2.committedFingerprints,
      plain.committedFingerprints) == 0, "fingerprints after retract replay")
    assert(symDiff(reopened2.committedNgramDf,
      plain.committedNgramDf) == 0, "ngram df after retract replay")
    reopened2.foldBatch(half2, 3L)
    plain.foldBatch(half2, 3L)
    assert(symDiff(reopened2.committedFingerprints,
      plain.committedFingerprints) == 0, "post-recovery fold")
  }

  test("a crash on either side of the compaction marker reopens to one consistent generation") {
    def faces(s: TableCommit) = Seq(
      s.committedFingerprints, s.committedBands, s.committedSpanFps,
      s.committedSimhashBands, s.committedNgramPostings,
      s.committedNgramDf, s.committedShingleSets)
    val half1 = batchAll.filter(expr("(id div 10) % 2 = 0"))
    val half2 = batchAll.filter(expr("(id div 10) % 2 = 1"))
    def prep(tag: String) = {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_tc_cc_$tag").toString
      val s = new TableCommit(spark, base, 8, 4, 8)
        .deploy(corpus, "doc_id", "text")
      s.foldBatch(half1, 0L)
      // Partial takedown: half1 ids are ≡ 0 (mod 20), so an id % 5
      // filter would retract EVERYTHING (fixture coincidence) and make
      // the later decrement-exactness leg vacuous — split on the tens
      // digit instead so accepted docs survive.
      s.retractBatch(
        half1.select("id").filter(expr("(id div 20) % 2 = 0")), 1L)
      (base, s)
    }
    val (_, plain) = prep("plain")
    assert(plain.accepted.count() > 0,
      "prep must leave surviving accepted docs or the test is vacuous")
    // Crash BEFORE the generation marker: the old generation (corpus +
    // deltas) is fully intact; the half-written new dirs are garbage.
    val (b1, v1) = prep("pre")
    v1.crashAt = Some("compact-before-marker")
    intercept[IllegalStateException](v1.compact())
    val r1 = TableCommit.reopen(spark, b1, 8, 4, 8)
    faces(plain).zip(faces(r1)).zipWithIndex.foreach { case ((a, b), i) =>
      assert(symDiff(a, b) == 0, s"face $i after pre-marker crash") }
    // Crash AFTER the marker (before GC/driver refresh): the new
    // generation is complete and committed; old dirs are mere garbage.
    val (b2, v2) = prep("post")
    v2.crashAt = Some("compact-after-marker")
    intercept[IllegalStateException](v2.compact())
    val r2 = TableCommit.reopen(spark, b2, 8, 4, 8)
    faces(plain).zip(faces(r2)).zipWithIndex.foreach { case ((a, b), i) =>
      assert(symDiff(a, b) == 0, s"face $i after post-marker crash") }
    assert(r2.accepted.count() == 0, "compacted gen must have empty deltas")
    for (s <- Seq(plain, r1, r2)) s.foldBatch(half2, 8L)
    faces(plain).zip(faces(r2)).zipWithIndex.foreach { case ((a, b), i) =>
      assert(symDiff(a, b) == 0, s"face $i fold after post-marker crash") }
    // The signed multisets survived BOTH crash recoveries intact: a
    // later NONEMPTY retraction still decrements exactly on every
    // reopened store (the double-count VERDICT r12 flagged would break
    // this). Materialize the delete list first — a lazy frame over
    // r1's own state would re-evaluate to empty after r1 retracts it.
    val del2 = r1.accepted.select("id")
      .filter(expr("(id div 20) % 2 = 1")).localCheckpoint(true)
    assert(del2.count() > 0, "decrement-exactness leg needs a nonempty set")
    for (s <- Seq(plain, r1, r2)) s.retractBatch(del2, 9L)
    faces(plain).zip(faces(r1)).zipWithIndex.foreach { case ((a, b), i) =>
      assert(symDiff(a, b) == 0, s"face $i decrement on r1") }
    faces(plain).zip(faces(r2)).zipWithIndex.foreach { case ((a, b), i) =>
      assert(symDiff(a, b) == 0, s"face $i decrement on r2") }
  }

  test("the auto-compaction trigger fires on the thresholds and is a committed-face no-op") {
    def faces(s: TableCommit) = Seq(
      s.committedFingerprints, s.committedBands, s.committedSpanFps,
      s.committedSimhashBands, s.committedNgramPostings,
      s.committedNgramDf, s.committedShingleSets)
    val plain = mk()
    // File-count threshold low enough that a few folds cross it.
    val auto = new TableCommit(
      spark,
      java.nio.file.Files.createTempDirectory("graft_tc_auto_").toString,
      8, 4, 8, autoCompact = true, compactDeltaRatio = 1e9,
      compactMaxDeltaFiles = 10L)
      .deploy(corpus, "doc_id", "text")
    for ((r, i) <- Seq(2, 0, 1).zipWithIndex) {
      val b = batchAll.filter(col("id") % 3 === r)
      plain.foldBatch(b, i.toLong)
      auto.foldBatch(b, i.toLong)
    }
    val (_, _, files, _, genNow) = auto.maintenanceStats
    assert(genNow > 0, "trigger never fired")
    assert(files <= 10L, "trigger left the file count above the bound")
    faces(plain).zip(faces(auto)).zipWithIndex.foreach { case ((a, b), i) =>
      assert(symDiff(a, b) == 0, s"face $i under auto-compaction") }
    // Takedowns still exact across the trigger-fired compactions.
    val del = batchAll.select("id").filter(col("id") % 2 === 0)
    plain.retractBatch(del, 9L)
    auto.retractBatch(del, 9L)
    faces(plain).zip(faces(auto)).zipWithIndex.foreach { case ((a, b), i) =>
      assert(symDiff(a, b) == 0, s"face $i retract under auto-compaction") }
  }

  test("a sharing store REOPENS without its own generation marker (the deploy marker lives at the layer root)") {
    // Round-14 review regression: the new deployed-generation reopen
    // gate must accept a shared store whose own base holds only deltas
    // and batch markers — its g-00000 marker was written at the SHARED
    // layer root by the memo's deploy, and gating on the instance base
    // alone would reject every healthy shared store that has not yet
    // compacted.
    val key = s"spec-shared-reopen-${java.util.UUID.randomUUID()}"
    val s = TableCommit.sharedDeploy(
      spark, key, corpus, "doc_id", "text", 8, 4, 8)
    val half1 = batchAll.filter(expr("(id div 10) % 2 = 0"))
    s.foldBatch(half1, 0L)
    val r = TableCommit.reopen(
      spark, s.storeBase, 8, 4, 8, corpusRoot = s.sharedRoot)
    assert(symDiff(r.committedFingerprints, s.committedFingerprints) == 0,
      "shared-store reopen must serve the same committed face")
    // And the reopened instance keeps folding (it holds the lease now).
    r.foldBatch(batchAll.filter(expr("(id div 10) % 2 = 1")), 1L)
    assert(r.committedFingerprints.count() >
      s.committedFingerprints.count())
  }

  test("a sharing store compacts its deltas into an own baseline; faces unchanged") {
    // The shared corpus layer is immutable, so compactShared folds the
    // marked deltas into an OWN per-instance baseline instead: signed
    // multisets keep NET != 0 rows (a net-negative row cancels a +1 in
    // the immutable corpus) and tombstones persist as their own
    // baseline. Pinned against a never-compacted twin over the SAME
    // shared deploy, through interleaved folds, corpus-doc takedowns
    // and a second compaction carrying net-negative rows.
    def faces(s: TableCommit) = Seq(
      s.committedFingerprints, s.committedBands, s.committedSpanFps,
      s.committedSimhashBands, s.committedNgramPostings,
      s.committedNgramDf, s.committedShingleSets, s.accepted)
    def check(a: TableCommit, b: TableCommit, tag: String): Unit =
      faces(a).zip(faces(b)).zipWithIndex.foreach { case ((x, y), i) =>
        assert(symDiff(x, y) == 0, s"face $i $tag") }
    val key = s"spec-shared-${java.util.UUID.randomUUID()}"
    def mk() = TableCommit.sharedDeploy(
      spark, key, corpus, "doc_id", "text", 8, 4, 8)
    val plain = mk()
    val compacted = mk()
    val half1 = batchAll.filter(expr("(id div 10) % 2 = 0"))
    val half2 = batchAll.filter(expr("(id div 10) % 2 = 1"))
    for (s <- Seq(plain, compacted)) {
      s.foldBatch(half1, 0L)
      s.retractBatch(
        half1.select("id").filter(expr("(id div 20) % 2 = 0")), 1L)
    }
    compacted.compact()
    check(plain, compacted, "after own-layer compact")
    assert(compacted.deltaFingerprints.count() == 0,
      "delta layers must reset")
    assert(compacted.maintenanceStats._5 > 0, "generation must advance")
    // Content replay still rejected (the ledger moved into the own
    // baseline).
    val c0 = compacted.committedFingerprints.count()
    compacted.foldBatch(half1, 2L)
    assert(compacted.committedFingerprints.count() == c0,
      "content replay after own-layer compact changed state")
    // Corpus-doc takedown AFTER compaction: the decrements target +1
    // rows living in the IMMUTABLE shared corpus, so the next
    // compaction must retain them as net-negative own rows — the > 0
    // filter would resurrect this content.
    val delCorpus = corpus.filter(col("doc_id") % 9 === 1)
      .select(col("doc_id").as("id")).localCheckpoint(true)
    plain.retractBatch(delCorpus, 3L)
    compacted.retractBatch(delCorpus, 3L)
    check(plain, compacted, "corpus takedown")
    compacted.compact() // second compaction carries net-negative rows
    check(plain, compacted, "after second compact")
    for (s <- Seq(plain, compacted)) s.foldBatch(half2, 4L)
    check(plain, compacted, "fold after second compact")
    // Tombstoned corpus ids stay un-recommittable across compactions.
    val clash = intercept[IllegalArgumentException](
      compacted.foldBatch(
        corpus.filter(col("doc_id") % 9 === 1)
          .select(col("doc_id").as("id"),
            concat(col("text"), lit(" fresh")).as("text")).limit(1), 5L))
    assert(clash.getMessage.contains("tombstoned"))
  }

  test("retract ∘ commit == identity on the seven artifact tables") {
    val before = mk()
    val after = mk()
    after.foldBatch(batchAll, 0L)
    after.retractBatch(after.accepted.select("id"), 1L)
    assert(symDiff(after.committedFingerprints,
      before.committedFingerprints) == 0, "fingerprints")
    assert(symDiff(after.committedBands, before.committedBands) == 0,
      "minhash bands")
    assert(symDiff(after.committedSpanFps, before.committedSpanFps) == 0,
      "span fps")
    assert(symDiff(after.committedSimhashBands,
      before.committedSimhashBands) == 0, "simhash bands")
    assert(symDiff(after.committedNgramPostings,
      before.committedNgramPostings) == 0, "ngram postings")
    assert(symDiff(after.committedNgramDf, before.committedNgramDf) == 0,
      "ngram df")
    assert(symDiff(after.committedShingleSets,
      before.committedShingleSets) == 0, "shingle sets")
    assert(after.accepted.count() == 0L, "accepted after full takedown")
  }
}
