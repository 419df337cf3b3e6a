package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.StoreJournal.vacuum]] laws: crashed-op residue (unmarked
  * batch dirs) and crashed-compaction residue (half-written next
  * generations) are removable garbage — vacuum deletes them and ONLY
  * them, leaving every committed face row-for-row unchanged and the
  * store fully operational. */
class StoreVacuumSpec extends SparkSuite {

  private lazy val docs = graft.queries.Tables
    .documents(spark, "/root/testdata/sf0.001")
  private lazy val corpus = docs.filter(col("doc_id") % 10 =!= 0)
  private lazy val batch = docs.filter(col("doc_id") % 10 === 0)
    .select(col("doc_id").as("id"), col("text")).localCheckpoint(true)

  private def symDiff(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  test("vacuum removes crashed-op and crashed-compaction residue, committed faces unchanged") {
    val half1 = batch.filter(expr("(id div 10) % 2 = 0"))
    val half2 = batch.filter(expr("(id div 10) % 2 = 1"))
    val plain = new TableCommit(
      spark,
      java.nio.file.Files.createTempDirectory("graft_vac_plain_").toString,
      8, 4, 8).deploy(corpus, "doc_id", "text")
    val store = new TableCommit(
      spark,
      java.nio.file.Files.createTempDirectory("graft_vac_").toString,
      8, 4, 8).deploy(corpus, "doc_id", "text")
    plain.foldBatch(half1, 0L)
    store.foldBatch(half1, 0L)
    // Residue 1: a crashed fold's unmarked batch dirs.
    store.crashAt = Some("fold-before-marker")
    intercept[IllegalStateException](store.foldBatch(half2, 1L))
    store.crashAt = None
    // Residue 2: a crashed compaction's half-written next generation.
    store.crashAt = Some("compact-before-marker")
    intercept[IllegalStateException](store.compact())
    store.crashAt = None
    val removed = store.vacuum()
    assert(removed > 0, "expected crash residue to be collected")
    assert(store.vacuum() == 0L, "second vacuum must find nothing")
    // Committed faces unchanged and the store still folds exactly.
    assert(symDiff(store.committedFingerprints,
      plain.committedFingerprints) == 0, "fingerprints after vacuum")
    store.foldBatch(half2, 2L)
    plain.foldBatch(half2, 2L)
    assert(symDiff(store.committedFingerprints,
      plain.committedFingerprints) == 0, "fold after vacuum")
    // And a real compaction after vacuum lands cleanly (the garbage
    // next-gen dirs are gone, the overwrite semantics never relied on
    // them). Lazy frames handed out BEFORE the compaction must keep
    // resolving — compaction defers all GC to vacuum.
    val preCompact = store.committedFingerprints
    store.compact()
    assert(symDiff(store.committedFingerprints,
      plain.committedFingerprints) == 0, "compact after vacuum")
    assert(symDiff(preCompact, plain.committedFingerprints) == 0,
      "pre-compaction lazy frame must still resolve (deferred GC)")
    // The superseded generation is vacuum's to collect — compaction
    // deleted nothing.
    assert(store.vacuum() > 0L, "superseded generation left for vacuum")
    assert(store.vacuum() == 0L, "second vacuum must find nothing")
    assert(symDiff(store.committedFingerprints,
      plain.committedFingerprints) == 0, "faces after post-compact vacuum")
  }

  test("sweeps collect staged/trash residue of NON-generation artifacts (meta.w*, *.t*)") {
    // A crashed or fenced deploy leaves `meta.w<hex8>` / `span0.w<hex8>`
    // at the store's TOP level, and a crashed publish leaves
    // `<dst>.t<hex8>` — none match the layer-dir patterns the sweeps
    // used to key on, so they accumulated forever (round-15 ADVICE).
    val base = java.nio.file.Files.createTempDirectory("graft_vac_res_")
    val store = new TableCommit(spark, base.toString, 8, 4, 8)
      .deploy(corpus, "doc_id", "text")
    val before = store.committedFingerprints.count()
    for (n <- Seq("meta.wdeadbeef", "span0.w01234567", "meta.t89abcdef")) {
      val d = base.resolve(n)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.writeString(d.resolve("junk.parquet"), "x")
    }
    assert(store.vacuum() == 3L, "exactly the three residue dirs")
    for (n <- Seq("meta.wdeadbeef", "span0.w01234567", "meta.t89abcdef"))
      assert(!java.nio.file.Files.exists(base.resolve(n)), s"$n not swept")
    assert(java.nio.file.Files.exists(base.resolve("meta")),
      "live meta must survive the residue sweep")
    assert(store.committedFingerprints.count() == before,
      "committed face unchanged by the residue sweep")
  }

  test("KnnStore vacuum collects crash residue and leaves the graph intact") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroidIds = (0 until 8).map(_ * 37L)
    val corpusE = emb.filter(col("vec_id") % 9 =!= 8)
    val batchE = emb.filter(col("vec_id") % 9 === 8)
    def edges(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val store = new graft.similarity.KnnStore(
      spark,
      java.nio.file.Files.createTempDirectory("graft_vac_knn_").toString,
      nProbe = 2, k = 4).deploy(corpusE, centroidIds)
    store.foldBatch(batchE.filter(expr("(vec_id div 9) % 3 = 0")), 0L)
    val before = edges(store.mutualGraph)
    store.crashAt = Some("fold-before-marker")
    intercept[IllegalStateException](
      store.foldBatch(batchE.filter(expr("(vec_id div 9) % 3 = 1")), 1L))
    store.crashAt = None
    assert(store.vacuum() > 0L)
    assert(edges(store.mutualGraph) == before, "graph changed by vacuum")
    store.foldBatch(batchE.filter(expr("(vec_id div 9) % 3 = 1")), 2L)
    assert(edges(store.mutualGraph) !=
      before, "post-vacuum fold must land")
  }
}
