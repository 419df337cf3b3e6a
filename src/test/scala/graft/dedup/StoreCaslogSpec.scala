package graft.dedup

import graft.SparkSuite
import graft.testfs.{NafCrash, NonAtomicRenameFileSystem}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The OBJECT-STORE-SAFE commit protocol (round-15 VERDICT #1): every
  * law the journal's rename path guarantees on POSIX must hold over a
  * filesystem whose rename is NON-ATOMIC copy+delete — because the
  * caslog protocol never renames on the committed path at all:
  *
  *   - markers commit via CREATE IF ABSENT (the conditional-PUT
  *     primitive), so marker visibility is the store's own atomicity;
  *   - staged generation dirs never move — the marker's `dir:`
  *     manifest maps deterministic layer names to the writer-scoped
  *     physical dirs, and reads resolve through it (the Delta/Iceberg
  *     commit-log shape);
  *   - the lease is a monotonic CAS epoch chain, no delete+rename
  *     swing.
  *
  * Driven over [[graft.testfs.NonAtomicRenameFileSystem]] (`naf:`),
  * whose rename is copy-then-delete and crash-injectable between the
  * two — the exact failure the protocol exists to survive. */
class StoreCaslogSpec extends SparkSuite {

  private def enableNaf(): Unit =
    spark.sparkContext.hadoopConfiguration.set(
      "fs.naf.impl", classOf[NonAtomicRenameFileSystem].getName)

  private def nafBase(tag: String): String = {
    enableNaf()
    "naf:" + java.nio.file.Files.createTempDirectory(tag).toString
  }

  private lazy val docs = graft.queries.Tables
    .documents(spark, "/root/testdata/sf0.001")
  private lazy val corpus = docs.filter(col("doc_id") % 10 =!= 0)
  private lazy val batch = docs.filter(col("doc_id") % 10 === 0)
    .select(col("doc_id").as("id"), col("text")).localCheckpoint(true)
  private lazy val half1 = batch.filter(expr("(id div 10) % 2 = 0"))
    .localCheckpoint(true)
  private lazy val half2 = batch.filter(expr("(id div 10) % 2 = 1"))
    .localCheckpoint(true)

  private def symDiff(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  test("the capability probe picks caslog off the scheme allowlist; conf overrides") {
    val naf = new graft.StoreJournal(spark, nafBase("graft_cas_probe_"))
    assert(naf.commitMode == "caslog", "naf: is not rename-safe")
    val posix = new graft.StoreJournal(spark,
      java.nio.file.Files.createTempDirectory("graft_cas_probe2_").toString)
    assert(posix.commitMode == "rename", "local paths keep the fast path")
    spark.conf.set("spark.graft.journal.commitMode", "caslog")
    try {
      val forced = new graft.StoreJournal(spark,
        java.nio.file.Files.createTempDirectory("graft_cas_probe3_").toString)
      assert(forced.commitMode == "caslog", "conf override must win")
    } finally spark.conf.set("spark.graft.journal.commitMode", "auto")
  }

  test("the caslog committed path performs NO renames: publish+deploy succeed with rename injection armed") {
    val base = nafBase("graft_cas_norename_")
    val j = new graft.StoreJournal(spark, base)
    // Stage a layer dir + a meta dir the way a store's deploy would
    // (naf is disk-backed at the same path, so plain file IO stages).
    for (d <- Seq(s"$base/fp/corpus-g0", s"$base/meta")) {
      val staged = java.nio.file.Paths.get(j.staged(d).stripPrefix("naf:"))
      java.nio.file.Files.createDirectories(staged)
      java.nio.file.Files.writeString(staged.resolve("x"), "data")
    }
    NafCrash.reset()
    NafCrash.at = Some("rename-after-copy") // ANY rename now dies mid-way
    try {
      j.publishStaged(Seq(s"$base/fp/corpus-g0", s"$base/meta"))
      j.markDeploy() // conditional-put marker — no rename to die in
    } finally NafCrash.reset()
    // A fresh (read-only) journal resolves the deterministic names to
    // the staged dirs through the marker's manifest.
    val r = new graft.StoreJournal(spark, base, readOnly = true)
    assert(r.deployed, "deploy marker must have committed")
    assert(r.resolve(s"$base/fp/corpus-g0") == j.staged(s"$base/fp/corpus-g0"),
      "manifest must map the layer to its staged physical dir")
    assert(r.exists(s"$base/meta"), "meta must resolve through the manifest")
  }

  test("a CAS collision on a marker is loud (ConcurrentModificationException)") {
    val base = nafBase("graft_cas_collide_")
    val j = new graft.StoreJournal(spark, base)
    j.markDeploy()
    assert(intercept[java.util.ConcurrentModificationException](
      j.markDeploy()).getMessage.contains("CAS"),
      "a lost conditional put must name itself")
  }

  test("full store lifecycle over the non-atomic-rename FS matches a POSIX twin, crash points included") {
    val store = new TableCommit(spark, nafBase("graft_cas_tc_"), 8, 4, 8)
      .deploy(corpus, "doc_id", "text")
    val twin = new TableCommit(spark,
      java.nio.file.Files.createTempDirectory("graft_cas_twin_").toString,
      8, 4, 8).deploy(corpus, "doc_id", "text")
    // Crashed fold retries under the same id.
    store.crashAt = Some("fold-before-marker")
    intercept[IllegalStateException](store.foldBatch(half1, 0L))
    store.crashAt = None
    store.foldBatch(half1, 0L)
    twin.foldBatch(half1, 0L)
    // Crash on BOTH sides of the compaction marker; the real compaction
    // then lands (caslog: the crashed attempt's staged dirs are
    // overwritten by the retry, its uncommitted manifest entries die
    // with the lost marker).
    store.crashAt = Some("compact-before-marker")
    intercept[IllegalStateException](store.compact())
    store.crashAt = None
    store.compact()
    twin.compact()
    assert(symDiff(store.committedFingerprints,
      twin.committedFingerprints) == 0, "post-compact faces diverged")
    // Reopen re-resolves the manifest from the generation marker.
    val r = TableCommit.reopen(spark, store.storeBase, 8, 4, 8)
    r.foldBatch(half2, 1L)
    twin.foldBatch(half2, 1L)
    assert(symDiff(r.committedFingerprints,
      twin.committedFingerprints) == 0, "post-reopen fold diverged")
    // Time travel resolves generation 0 through ITS marker's manifest.
    assert(symDiff(r.committedFingerprintsAt(0),
      twin.committedFingerprintsAt(0)) == 0, "time travel diverged")
    // Vacuum sweeps superseded caslog generations without touching the
    // manifest-referenced current one.
    assert(r.vacuum() > 0L, "superseded generation left for vacuum")
    assert(symDiff(r.committedFingerprints,
      twin.committedFingerprints) == 0, "face changed by vacuum")
  }

  test("a crash BETWEEN copy and delete of a data-write rename leaves only invisible residue") {
    val store = new TableCommit(spark, nafBase("graft_cas_crash_"), 8, 4, 8)
      .deploy(corpus, "doc_id", "text")
    val twin = new TableCommit(spark,
      java.nio.file.Files.createTempDirectory("graft_cas_crtwin_").toString,
      8, 4, 8).deploy(corpus, "doc_id", "text")
    val preFold = store.committedFingerprints.localCheckpoint(true)
    // Parquet task/job commits still rename under naf (copy+delete) —
    // dying between the two leaves BOTH halves on disk, which is
    // exactly what the journal's marker gating makes invisible.
    NafCrash.at = Some("rename-after-copy")
    try intercept[Throwable](store.foldBatch(half1, 5L))
    finally NafCrash.reset()
    assert(symDiff(store.committedFingerprints, preFold) == 0,
      "a crashed data write must stay invisible (no marker committed)")
    store.foldBatch(half1, 5L) // retry under the SAME id
    twin.foldBatch(half1, 5L)
    assert(symDiff(store.committedFingerprints,
      twin.committedFingerprints) == 0, "retry after mid-rename crash")
    assert(store.vacuum() > 0L, "the half-renamed residue is sweepable")
    assert(symDiff(store.committedFingerprints,
      twin.committedFingerprints) == 0, "face changed by residue sweep")
  }

  test("a sharing store resolves the owner's shared layers through the owner's manifest") {
    val ownerBase = nafBase("graft_cas_owner_")
    val owner = new TableCommit(spark, ownerBase, 8, 4, 8)
      .deploy(corpus, "doc_id", "text")
    val sharing = new TableCommit(spark,
      java.nio.file.Files.createTempDirectory("graft_cas_shared_").toString,
      8, 4, 8, corpusRoot = Some(ownerBase))
    assert(symDiff(sharing.committedFingerprints,
      owner.committedFingerprints) == 0,
      "shared-layer reads must resolve through the owner's caslog manifest")
  }
}
