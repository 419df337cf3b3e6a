package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TABLE-BACKED cross-doc sentence-hash store — the production shape of
  * the sentence commit/retract faces ([[Dedup.committedSentenceHashes]]
  * / [[Dedup.retractSentenceHashes]] stay as the in-memory verification
  * twins): the committed sentence-hash set lives as a SIGNED MULTISET
  * at per-(doc, hash) grain — a commit appends one +1 row per distinct
  * (document, sentence hash), a takedown appends the matching −1 rows,
  * and the set face at read time is `sum(w) > 0`. The multiset makes
  * retraction exact WITHOUT the batch face's corpus-wide retention
  * scan: a hash leaves the set exactly when its LAST remaining
  * document's −1 lands (the planted-footer retention case — a hash
  * shared by many documents survives any subset's takedown — falls out
  * of the arithmetic). The committed documents persist alongside
  * (id-keyed, tombstoned on takedown) so a takedown delivery carrying
  * only ids can regenerate the exact −1 rows from the stored text.
  *
  * Id-disjointness (no re-commit of stored OR tombstoned doc ids — a
  * double-committed document would double its +1 rows and break the
  * decrement symmetry) verifies against a driver Bloom with a
  * partition-pruned exact check for the Bloom hits only. Durability is
  * the shared [[graft.StoreJournal]] discipline: per-op batch dirs
  * committed by one atomic marker rename (recording the delivery id
  * durably — recorded only on SUCCESS, so a failed delivery retries
  * under the same id); [[compact]] folds the marked deltas and
  * tombstones into a fresh generation — summed multiset rows PRESERVE
  * the per-hash count, so later takedowns still decrement exactly, and
  * the tombstones persist as their own compacted baseline so a
  * tombstoned id's re-delivery stays a no-op (no resurrection) —
  * committed by one generation-marker rename that also baselines the
  * seen-id sets. Compaction GCs with one-generation retention
  * ([[graft.StoreJournal.gcAged]]; [[vacuum]] is the aggressive
  * manual sweep). The deploy-time geometry (parts,
  * splitRegex) persists and [[SentenceTable.reopen]] validates it.
  * `autoCompact` watches the delta:corpus byte ratio and delta file
  * count. */
class SentenceTable(
    spark: SparkSession,
    base: String,
    parts: Int = 16,
    splitRegex: String = graft.text.TextFunctions.PortableSentenceSplit,
    autoCompact: Boolean = false,
    compactDeltaRatio: Double = 0.5,
    compactMaxDeltaFiles: Long = 512L,
    /** Post-compaction GC retention window — see
      * [[graft.StoreJournal.gcAged]]. */
    gcRetainMs: Long = 0L,
    /** Read-only open: never touches the writer lease; state-changing
      * faces fail loudly. See [[graft.StoreJournal]]. */
    readOnly: Boolean = false,
    /** Polite-takeover window — see [[graft.StoreJournal]]. */
    takeoverAfterMs: Long = 0L) {

  import spark.implicits._

  private val journal =
    new graft.StoreJournal(spark, base, readOnly, takeoverAfterMs)
  private def corpusPath(t: String) = s"$base/$t/corpus-g${journal.gen}"
  private def partOf(c: org.apache.spark.sql.Column) =
    pmod(hash(c), lit(parts))

  private val docSchema = new StructType()
    .add("id", LongType).add("text", StringType).add("part", IntegerType)
  private val shSchema = new StructType()
    .add("sh", LongType).add("w", LongType).add("part", IntegerType)
  private val tombSchema = new StructType().add("id", LongType)

  private var idBloom: org.apache.spark.util.sketch.BloomFilter = _
  private var corpusBytes: Long = 0L

  /** Crash-injection hook — see [[graft.StoreJournal.crashPoint]]. */
  private[dedup] def crashAt: Option[String] = journal.crashAt
  private[dedup] def crashAt_=(v: Option[String]): Unit =
    journal.crashAt = v
  private def crashPoint(name: String): Unit = journal.crashPoint(name)

  private def schemaOf(t: String) = t match {
    case "docs" => docSchema
    case "sh" => shSchema
    case "tomb" => tombSchema
  }
  private def readDelta(t: String) = journal.readDelta(t, schemaOf(t))
  private def readAll(t: String) =
    journal.readOr(corpusPath(t), schemaOf(t)).unionByName(readDelta(t))
  private def tomb: DataFrame =
    // Tombstones persist across compactions as their own compacted
    // baseline — without it, the first compaction would let a
    // tombstoned id re-commit and resurrect its deleted hashes.
    journal.readOr(corpusPath("tomb"), tombSchema)
      .unionByName(readDelta("tomb"))

  /** The deploy-time geometry persisted for [[SentenceTable.reopen]]
    * validation: a mismatched `parts` would mis-prune every gate and
    * takedown read (a takedown would silently no-op), and a different
    * `splitRegex` would regenerate takedown decrements that no longer
    * cancel the deploy-time +1 rows. */
  private def metaPath = s"$base/meta"
  private def writeMeta(): Unit = {
    import spark.implicits._
    Seq((parts, splitRegex)).toDF("parts", "splitRegex")
      .coalesce(1).write.mode("overwrite")
      .parquet(journal.staged(metaPath))
  }
  private def validateMeta(): Unit = {
    require(journal.exists(metaPath),
      s"SentenceTable.reopen: no store at $base (missing meta)")
    val mt = spark.read.parquet(journal.resolve(metaPath)).head()
    val (sp, sr) = (mt.getAs[Int]("parts"), mt.getAs[String]("splitRegex"))
    require(sp == parts && sr == splitRegex,
      s"SentenceTable.reopen: stored geometry (parts=$sp, " +
        s"splitRegex=$sr) != requested (parts=$parts, " +
        s"splitRegex=$splitRegex) — a mismatched parts would mis-prune " +
        "every pruned read; a different splitRegex would break " +
        "decrement symmetry")
  }

  /** One ±`sign` row per distinct (document, sentence hash) — the
    * multiset grain at which retraction is exact. */
  private def shRows(docs: DataFrame, sign: Long): DataFrame =
    Dedup.sentenceRows(docs, "id", "text", splitRegex)
      .select("id", "sh").distinct()
      .select(col("sh"), lit(sign).as("w"), partOf(col("sh")).as("part"))

  def deploy(corpus: DataFrame, idCol: String, textCol: String): SentenceTable = {
    journal.requireWritable()
    val docs = corpus
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .localCheckpoint(true)
    writeMeta()
    // Generation dirs write under writer-scoped staging names and
    // publish (lease-checked renames) right before the marker.
    graft.Par.all(
      () => docs.withColumn("part", partOf(col("id")))
        .repartition(parts, col("part"))
        .write.mode("overwrite").partitionBy("part")
        .parquet(journal.staged(corpusPath("docs"))),
      () => shRows(docs, 1L)
        .repartition(parts, col("part"))
        .write.mode("overwrite").partitionBy("part")
        .parquet(journal.staged(corpusPath("sh"))))
    journal.publishStaged(
      Seq("docs", "sh").map(corpusPath) :+ metaPath)
    journal.markDeploy()
    corpusBytes = Seq("docs", "sh").map(t => journal.du(corpusPath(t))._1).sum
    idBloom = docs.stat.bloomFilter("id", math.max(1L, docs.count()), 0.01)
    graft.Ckpt.release(docs) // tables are on disk; blocks are dead
    this
  }

  /** Fold one delivery of (id, text) documents: the id gate drops
    * arrivals whose id is already stored or tombstoned (the document id
    * IS the content key here — re-delivered documents are id-keyed
    * no-ops, and tombstoned ids may not be recommitted; a
    * double-committed id would double its +1 rows and break the
    * decrement symmetry), then the per-(doc, hash) +1 rows append.
    * Replay-safe by batch id and by id; ATOMIC. */
  def foldBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (journal.seen("fold", batchId)) return
    val raw = batch.select(col("id"), col("text")).localCheckpoint(true)
    if (raw.isEmpty) {
      journal.noteSeen("fold", batchId); graft.Ckpt.release(raw); return
    }
    val rawIds = raw.select("id").distinct().as[Long].collect()
    val cand = rawIds.filter(idBloom.mightContainLong)
    val bb =
      if (cand.isEmpty) raw
      else {
        val candDf = cand.toSeq.toDF("id")
          .withColumn("part", partOf(col("id"))).localCheckpoint(true)
        val cParts = candDf.select("part").distinct().as[Int].collect().toSeq
        val present = readAll("docs")
          .filter(col("part").isin(cParts: _*)).select("id")
          .unionByName(tomb.select("id"))
          .join(broadcast(candDf.select("id")), Seq("id"), "left_semi")
          .distinct()
        val kept = raw.join(broadcast(present), Seq("id"), "left_anti")
          .localCheckpoint(true)
        graft.Ckpt.release(candDf, raw) // kept is its own checkpoint now
        kept
      }
    if (bb.isEmpty) {
      journal.noteSeen("fold", batchId); graft.Ckpt.release(bb); return
    }
    val bIds = bb.select("id").distinct().as[Long].collect()
    val uuid = journal.newUuid()
    graft.Par.all(
      () => journal.writeBatch(bb.withColumn("part", partOf(col("id"))),
        "docs", uuid),
      () => journal.writeBatch(shRows(bb, 1L), "sh", uuid))
    val wrote = Set("docs", "sh")
    crashPoint("fold-before-marker")
    journal.markBatch(uuid, wrote, "fold", batchId)
    bIds.foreach(idBloom.putLong)
    graft.Ckpt.release(bb) // committed — blocks are dead
    maybeAutoCompact()
  }

  /** Fold one takedown delivery (an `id` frame): tombstone the stored
    * ids and append the −1 rows regenerated from the stored texts.
    * Replay-safe by batch id and by content; ATOMIC — tombstone and
    * decrements become visible together. */
  def retractBatch(deleteIds: DataFrame, batchId: Long): Unit = synchronized {
    if (journal.seen("retract", batchId)) return
    val del = deleteIds.select(col("id")).distinct()
      .join(tomb, Seq("id"), "left_anti")
      .withColumn("part", partOf(col("id")))
      .localCheckpoint(true)
    if (del.isEmpty) {
      journal.markNoop("retract", batchId); graft.Ckpt.release(del); return
    }
    val dParts = del.select("part").distinct().as[Int].collect().toSeq
    val deleted = readAll("docs")
      .filter(col("part").isin(dParts: _*))
      .join(broadcast(del.select("id")), Seq("id"), "left_semi")
      .select("id", "text")
      .localCheckpoint(true)
    if (deleted.isEmpty) {
      journal.markNoop("retract", batchId)
      graft.Ckpt.release(del, deleted); return
    }
    val uuid = journal.newUuid()
    graft.Par.all(
      () => journal.writeBatch(deleted.select("id"), "tomb", uuid),
      () => journal.writeBatch(shRows(deleted, -1L), "sh", uuid))
    val wrote = Set("tomb", "sh")
    crashPoint("retract-before-marker")
    journal.markBatch(uuid, wrote, "retract", batchId)
    graft.Ckpt.release(del, deleted)
    maybeAutoCompact()
  }

  /** The committed sentence-hash set: `sum(w) > 0`. */
  def presentHashes: DataFrame = readAll("sh")
    .groupBy("sh").agg(sum(col("w")).as("n"))
    .filter(col("n") > 0)
    .select("sh")

  /** TIME TRAVEL — the committed sentence-hash set AS OF the end of
    * generation `g` (the
    * [[graft.dedup.TableCommit.committedFingerprintsAt]] shape over
    * this store's journal): `baseline(g) + g's marked ±1 deltas`
    * summed under `> 0` is exactly the multiset face at `g`'s last
    * commit — including any retraction's −1 rows committed within `g`
    * — immutable once superseded. An aged-out generation fails loudly
    * instead of serving an empty frame (round-14 VERDICT missing #3). */
  def presentHashesAt(g: Int): DataFrame = {
    val dir = s"$base/sh/corpus-g$g"
    require(journal.existsAt(dir, g),
      s"SentenceTable.presentHashesAt($g): generation $g is not " +
        "retained (GC'd or vacuumed) — raise gcRetainMs / vacuum " +
        "retainMs to pin it")
    journal.readAllAt(dir, "sh", g, shSchema)
      .groupBy("sh").agg(sum(col("w")).as("n"))
      .filter(col("n") > 0)
      .select("sh")
  }

  /** The baseline (deploy until first compaction) distinct hash set —
    * the readouts' n_corpus face. */
  def corpusHashes: DataFrame =
    journal.readOr(corpusPath("sh"), shSchema).select("sh").distinct()

  /** Maintenance readout: (corpus bytes, delta bytes, delta files,
    * committed ops since the last compaction, current generation). */
  def maintenanceStats: (Long, Long, Long, Int, Int) =
    (corpusBytes, journal.deltaBytes, journal.deltaFiles,
      journal.committed.size, journal.gen)

  /** GC of journal garbage — [[graft.StoreJournal.vacuum]];
    * `retainMs` age-gates the sweep of superseded generations. */
  def vacuum(retainMs: Long = 0L): Long = synchronized {
    journal.vacuum(Seq("docs", "sh", "tomb"), retainMs)
  }

  private def maybeAutoCompact(): Unit =
    if (autoCompact &&
        (journal.deltaBytes > compactDeltaRatio * math.max(1L, corpusBytes) ||
          journal.deltaFiles > compactMaxDeltaFiles)) compact()

  /** Fold the marked deltas and tombstones into a fresh generation —
    * multiset rows compact to one summed row per surviving hash
    * (count-preserving), docs to their tombstone survivors; a
    * committed-face no-op, crash-atomic via the generation marker. */
  def compact(): Unit = synchronized {
    journal.checkLease() // fence stale writers before the deterministic-dir writes
    val g2 = journal.gen + 1
    // Single-consumer frames write directly into the fresh generation
    // (reads stay on the current one), three independent writes
    // concurrently (graft.Par).
    val sh = readAll("sh")
      .groupBy("sh", "part").agg(sum(col("w")).as("w"))
      .filter(col("w") > 0)
      .select("sh", "w", "part")
    val docs = readAll("docs").join(tomb, Seq("id"), "left_anti")
      .select("id", "text", "part")
    // Tombstones survive as their own compacted baseline — the
    // no-id-reuse law must outlive the physical drop of the tombstoned
    // rows (a re-committed id would resurrect its deleted hashes).
    val tombAll = tomb.distinct()
    def dst(t: String) = s"$base/$t/corpus-g$g2"
    graft.Par.all(
      () => sh.repartition(parts, col("part"))
        .write.mode("overwrite").partitionBy("part")
        .parquet(journal.staged(dst("sh"))),
      () => docs.repartition(parts, col("part"))
        .write.mode("overwrite").partitionBy("part")
        .parquet(journal.staged(dst("docs"))),
      () => tombAll.coalesce(1).write.mode("overwrite")
        .parquet(journal.staged(dst("tomb"))))
    crashPoint("compact-before-publish")
    journal.publishStaged(Seq("sh", "docs", "tomb").map(dst))
    crashPoint("compact-before-marker")
    journal.markGeneration(g2)
    crashPoint("compact-after-marker")
    // One-generation retention GC (see graft.StoreJournal.gcAged).
    journal.advance(g2)
    corpusBytes = Seq("docs", "sh").map(t => journal.du(corpusPath(t))._1).sum
    journal.gcAged(Seq("docs", "sh", "tomb"), gcRetainMs)
  }

  private[dedup] def restore(): SentenceTable = {
    journal.reload()
    validateMeta()
    require(journal.deployed,
      s"SentenceTable.reopen: store at $base has meta but no committed " +
        "generation marker (deploy crashed before its atomic point) — " +
        "refusing to serve a partially-deployed store")
    corpusBytes = Seq("docs", "sh").map(t => journal.du(corpusPath(t))._1).sum
    journal.rechargeDeltas()
    val ids = readAll("docs").select("id")
      .unionByName(tomb.select("id")).distinct()
    idBloom = ids.stat.bloomFilter("id", math.max(1L, ids.count()), 0.01)
    this
  }
}

object SentenceTable {
  /** CRASH RECOVERY: reopen over the stored tables — the journal scopes
    * reads to the committed generation + marked ops; the id Bloom
    * rebuilds from stored ids ∪ tombstones; replay protection after a
    * crash is the id gate (a re-delivered document is an id-keyed
    * no-op regardless of its batch id). */
  def reopen(
      spark: SparkSession,
      base: String,
      parts: Int = 16,
      splitRegex: String = graft.text.TextFunctions.PortableSentenceSplit,
      autoCompact: Boolean = false,
      compactDeltaRatio: Double = 0.5,
      compactMaxDeltaFiles: Long = 512L,
      gcRetainMs: Long = 0L,
      readOnly: Boolean = false,
      takeoverAfterMs: Long = 0L): SentenceTable =
    new SentenceTable(spark, base, parts, splitRegex,
      autoCompact = autoCompact, compactDeltaRatio = compactDeltaRatio,
      compactMaxDeltaFiles = compactMaxDeltaFiles,
      gcRetainMs = gcRetainMs, readOnly = readOnly,
      takeoverAfterMs = takeoverAfterMs).restore()
}
