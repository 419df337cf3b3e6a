package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TABLE-BACKED streaming corpus commit/retract — the production shape
  * of [[StreamingCommit]] (which stays as the in-memory verification
  * twin): the committed artifact set lives in STORED parquet tables and
  * every fold appends BATCH-SIZED deltas, so per-delivery cost is flat
  * in corpus size — never the full-state `unionByName().distinct()
  * .localCheckpoint()` re-materialization the in-memory harness pays
  * per micro-batch.
  *
  * Storage model (all tables append-only between compactions):
  *
  *   - CONTENT-keyed sets (fingerprint set, span-window fp set, the
  *     n-gram df sidecar) are SIGNED MULTISETS: a commit appends +1
  *     rows, a retraction appends −1 rows, and membership at read time
  *     is `sum(w) > 0` (df: `sum(df) > 0`). Multiset counts make
  *     retraction exact WITHOUT the batch face's corpus-wide retention
  *     scan: a fingerprint leaves the set exactly when its last
  *     remaining document's −1 lands, because every add was per-doc.
  *   - ID-keyed tables (minhash bands, simhash bands, shingle sets, raw
  *     postings, accepted docs) append rows on commit; retraction
  *     appends the doc id to ONE tombstone table and every read face
  *     anti-joins it (delete-sized). Retracted ids may not be
  *     recommitted — the id-disjointness law extends to tombstones.
  *   - The df-capped POSTINGS are stored RAW (uncapped) and the cap is
  *     applied AT READ against the summed df sidecar. This is the lazy
  *     compaction VERDICT r11 asked for, and it is exact in both
  *     directions: a shingle crossing the cap on commit simply stops
  *     qualifying at read (the fold face's re-compaction), and one
  *     falling back under it on retraction re-qualifies with no repair
  *     pass (the batch face's crosser repair exists only because it
  *     physically dropped rows).
  *   - The raw-text ingest LEDGER is append-only and never shrinks —
  *     replay safety survives takedown (re-delivered taken-down content
  *     stays rejected, the right-to-be-forgotten reading).
  *
  * Per-delivery gate reads are kept SUB-corpus two ways: a driver-held
  * Bloom filter over committed fingerprints ∪ ledger (no false
  * negatives — Bloom-negative arrivals are accepted without touching
  * the store; positives are exactly verified) and hive-partitioned
  * tables (`part = pmod(hash(key), parts)`) so the verify read prunes
  * to the candidate keys' partitions (`PartitionFilters` in explain).
  * Span-cleaning gates against the FROZEN corpus span set (batching
  * invariance, as the in-memory face documents) through a broadcast
  * Bloom evaluated per batch row in `mapPartitions` — only Bloom-hit
  * window fps reach the pruned exact verify.
  *
  * Batch-sized driver collects (distinct batch fingerprints/ids, ≤
  * `parts` partition values) are the micro-batch-bounded kind the repo
  * allows; at 100 TB the same Bloom checks run distributed against the
  * broadcast filter exactly like the span path.
  *
  * Fold laws (TableCommitSpec pins them against [[Dedup.commitArtifacts]],
  * [[Dedup.retractArtifacts]] and the in-memory [[StreamingCommit]]):
  * stream == one-shot batch, batching invariance, replay safety by
  * batch id and by content, and retract ∘ commit == identity on the
  * seven artifact tables. */
class TableCommit(
    spark: SparkSession,
    base: String,
    numHashes: Int,
    bands: Int,
    w: Int,
    simhashBlocks: Int = 4,
    ngramBlockCol: Column = lit(0L),
    ngramN: Int = 3,
    maxShingleDf: Int = Dedup.DefaultShingleDfCap,
    parts: Int = 16,
    /** When set, the IMMUTABLE corpus layers are read from this shared
      * root (written once by [[TableCommit.sharedDeploy]]'s memo) while
      * deltas/tombstones/ledger stay per-instance — independent stores
      * over one deploy. */
    corpusRoot: Option[String] = None) {

  import spark.implicits._

  private val fpc = graft.text.TextFunctions.fingerprintCol _
  private def partOf(c: Column): Column = pmod(hash(c), lit(parts))

  private val cRoot = corpusRoot.getOrElse(base)
  private def p(rel: String) =
    if (rel.endsWith("/corpus")) s"$cRoot/$rel" else s"$base/$rel"

  // ---- schemas (for reading a layer that has no rows yet) ------------
  private val docSchema = new StructType()
    .add("id", LongType).add("text", StringType).add("part", IntegerType)
  private val fpSchema = new StructType()
    .add("fingerprint", StringType).add("w", LongType).add("part", IntegerType)
  private val ledgerSchema = new StructType()
    .add("fingerprint", StringType).add("part", IntegerType)
  private val spanSchema = new StructType()
    .add("fp", LongType).add("w", LongType).add("part", IntegerType)
  private val bandSchema = new StructType()
    .add("id", LongType).add("band", IntegerType).add("bh", StringType)
  private val simSchema = new StructType()
    .add("id", LongType).add("simhash", LongType)
    .add("band", IntegerType).add("bv", LongType)
  private val dfSchema = new StructType()
    .add("blk", LongType).add("shingle", LongType).add("df", LongType)
  private val postSchema = new StructType()
    .add("blk", LongType).add("shingle", LongType).add("id", LongType)
  private val setSchema = new StructType()
    .add("id", LongType).add("shingles", ArrayType(LongType))
  private val tombSchema = new StructType().add("id", LongType)

  private def readOr(rel: String, schema: StructType): DataFrame =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(p(rel))))
      spark.read.parquet(p(rel))
    else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  /** Both layers of a table (corpus + delta). */
  private def readAll(name: String, schema: StructType): DataFrame =
    readOr(s"$name/corpus", schema).unionByName(readOr(s"$name/delta", schema))

  /** Delta appends coalesce to one file (they are batch-sized; file
    * count is the cost that compounds); corpus-layer writes keep their
    * input parallelism — partitioned ones shuffle once onto the part
    * key so each partition dir gets exactly one file. */
  private def writeLayer(
      df: DataFrame,
      rel: String,
      partitioned: Boolean,
      mode: SaveMode): Unit = {
    val shaped =
      if (mode == SaveMode.Append) df.coalesce(1)
      else if (partitioned) df.repartition(parts, col("part"))
      else df
    val wtr = shaped.write.mode(mode)
    (if (partitioned) wtr.partitionBy("part") else wtr).parquet(p(rel))
  }

  // ---- per-doc artifact builders (shared by deploy and the folds) ----
  private def fpRows(docs: DataFrame, sign: Long): DataFrame = docs
    .select(fpc(col("text")).as("fingerprint"))
    .filter(col("fingerprint").isNotNull)
    .select(col("fingerprint"), lit(sign).as("w"),
      partOf(col("fingerprint")).as("part"))

  /** Per-doc DISTINCT window fps — one ±1 per (doc, fp), the multiset
    * grain at which retraction is exact. */
  private def spanRows(docs: DataFrame, sign: Long): DataFrame = docs
    .select(col("id"), Dedup.words(col("text")).as("wd"))
    .select(col("id"), explode(Dedup.posShingles(col("wd"), w)).as("ps"))
    .select(col("id"), Dedup.hash60(col("ps.s")).as("fp"))
    .distinct()
    .select(col("fp"), lit(sign).as("w"), partOf(col("fp")).as("part"))

  private def ngramRows(docs: DataFrame): DataFrame =
    Dedup.ngramShingleRows(docs, "id", "text", ngramBlockCol, ngramN)

  private def dfRows(rows: DataFrame, sign: Long): DataFrame = rows
    .groupBy("blk", "shingle")
    .agg((lit(sign) * count(lit(1))).as("df"))

  // ---- driver-held state ---------------------------------------------
  private val seenCommits = scala.collection.mutable.HashSet.empty[Long]
  private val seenRetracts = scala.collection.mutable.HashSet.empty[Long]
  private var fpBloom: org.apache.spark.util.sketch.BloomFilter = _
  private var idBloom: org.apache.spark.util.sketch.BloomFilter = _
  private var spanBloomBc: org.apache.spark.broadcast.Broadcast[
    org.apache.spark.util.sketch.BloomFilter] = _

  private[dedup] def initBlooms(
      fp: org.apache.spark.util.sketch.BloomFilter,
      id: org.apache.spark.util.sketch.BloomFilter,
      span: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): TableCommit = {
    fpBloom = fp; idBloom = id; spanBloomBc = span; this
  }
  private[dedup] def blooms = (fpBloom, idBloom, spanBloomBc)

  /** Rebuild the driver-held gate Blooms from the STORED tables — the
    * crash-recovery path ([[TableCommit.reopen]]). The fp Bloom seeds
    * from every add row plus the ledger (a retracted fp's stale bit is
    * a false positive only — the exact verify still decides), the id
    * Bloom from all doc ids plus tombstones (no id reuse), the span
    * Bloom from the frozen corpus span table. */
  private[dedup] def rebuildBlooms(): TableCommit = {
    val fpRowsAll = readAll("fp", fpSchema).select("fingerprint")
      .unionByName(readOr("ledger/delta", ledgerSchema).select("fingerprint"))
    fpBloom = fpRowsAll.stat.bloomFilter(
      "fingerprint", math.max(1L, fpRowsAll.count()), 0.01)
    val idRows = readAll("docs", docSchema).select("id")
      .unionByName(readOr("tomb/delta", tombSchema).select("id"))
    idBloom = idRows.stat.bloomFilter("id", math.max(1L, idRows.count()), 0.01)
    val spanT = readOr("span/corpus", spanSchema)
    spanBloomBc = spark.sparkContext.broadcast(
      spanT.stat.bloomFilter("fp", math.max(1L, spanT.count()), 0.01))
    this
  }

  /** One-time corpus load: write every corpus-layer table and build the
    * gate Blooms. A production deployment runs this once (or inherits
    * the tables from the batch pipeline); per-delivery cost never
    * includes it. */
  def deploy(corpus: DataFrame, idCol: String, textCol: String): TableCommit = {
    val docs = corpus
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .localCheckpoint(true)
    writeLayer(docs.withColumn("part", partOf(col("id"))),
      "docs/corpus", partitioned = true, SaveMode.Overwrite)
    writeLayer(fpRows(docs, 1L), "fp/corpus", partitioned = true,
      SaveMode.Overwrite)
    writeLayer(spanRows(docs, 1L), "span/corpus", partitioned = true,
      SaveMode.Overwrite)
    writeLayer(Dedup.bandTable(docs, "id", "text", numHashes, bands),
      "bands/corpus", partitioned = false, SaveMode.Overwrite)
    writeLayer(Dedup.simhashBandTable(docs, "id", "text", simhashBlocks),
      "simhash/corpus", partitioned = false, SaveMode.Overwrite)
    val rows = ngramRows(docs).localCheckpoint(true)
    writeLayer(dfRows(rows, 1L), "ngramdf/corpus", partitioned = false,
      SaveMode.Overwrite)
    writeLayer(rows.select("blk", "shingle", "id"), "postings/corpus",
      partitioned = false, SaveMode.Overwrite)
    writeLayer(Dedup.shingleSetsOfRows(rows), "sets/corpus",
      partitioned = false, SaveMode.Overwrite)
    // Gate Blooms built from the READ-BACK stored tables (columnar
    // scans; counts are parquet-metadata-fast). No distinct anywhere —
    // duplicate inserts only re-set bits, and the row count is a safe
    // over-estimate of the distinct count for sizing.
    val fpT = readOr("fp/corpus", fpSchema)
    fpBloom = fpT.stat.bloomFilter(
      "fingerprint", math.max(1L, fpT.count()), 0.01)
    idBloom = docs.stat.bloomFilter("id", math.max(1L, docs.count()), 0.01)
    val spanT = readOr("span/corpus", spanSchema)
    spanBloomBc = spark.sparkContext.broadcast(
      spanT.stat.bloomFilter("fp", math.max(1L, spanT.count()), 0.01))
    this
  }

  // ---- the commit fold ------------------------------------------------
  /** Fold one gate-accepted delivery into the stored artifacts.
    * Thread-safe; replay-safe by batch id and by content. Every job in
    * here is batch-sized or a Bloom/partition-pruned store read. */
  def foldBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!seenCommits.add(batchId)) return
    val bf = batch
      .select(col("id"), col("text"))
      .withColumn("fingerprint", fpc(col("text")))
      .filter(col("fingerprint").isNotNull)
      .localCheckpoint(true)
    // GATE — content-keyed, Bloom-prefiltered exact verify.
    val batchFps = bf.select("fingerprint").distinct().as[String].collect()
    val candFps = batchFps.filter(fpBloom.mightContainString)
    val novel =
      if (candFps.isEmpty) bf
      else {
        val cand = candFps.toSeq.toDF("fingerprint")
          .withColumn("part", partOf(col("fingerprint")))
          .localCheckpoint(true)
        val candParts = cand.select("part").distinct().as[Int].collect().toSeq
        def pruned(rel: String, schema: StructType) =
          readAll(rel, schema).filter(col("part").isin(candParts: _*))
        val present = pruned("fp", fpSchema)
          .join(broadcast(cand.select("fingerprint")),
            Seq("fingerprint"), "left_semi")
          .groupBy("fingerprint").agg(sum(col("w")).as("n"))
          .filter(col("n") > 0).select("fingerprint")
          .unionByName(
            readOr("ledger/delta", ledgerSchema)
              .filter(col("part").isin(candParts: _*))
              .join(broadcast(cand.select("fingerprint")),
                Seq("fingerprint"), "left_semi")
              .select("fingerprint"))
          .distinct()
        bf.join(broadcast(present), Seq("fingerprint"), "left_anti")
      }
    val acceptedRaw = novel
      .withColumn("mn", min(col("id")).over(Window.partitionBy("fingerprint")))
      .filter(col("id") === col("mn"))
      .select("id", "text", "fingerprint")
      .localCheckpoint(true)
    if (acceptedRaw.isEmpty) return
    // Id-disjointness law (includes tombstoned ids: no id reuse).
    val batchIds = acceptedRaw.select("id").distinct().as[Long].collect()
    val candIds = batchIds.filter(idBloom.mightContainLong)
    val idClashes =
      if (candIds.isEmpty) 0L
      else {
        val candI = candIds.toSeq.toDF("id")
          .withColumn("part", partOf(col("id"))).localCheckpoint(true)
        val iParts = candI.select("part").distinct().as[Int].collect().toSeq
        readAll("docs", docSchema).filter(col("part").isin(iParts: _*))
          .select("id")
          .unionByName(readOr("tomb/delta", tombSchema).select("id"))
          .join(broadcast(candI.select("id")), Seq("id"), "left_semi")
          .count()
      }
    require(idClashes == 0L,
      s"TableCommit: $idClashes accepted id(s) already committed or " +
        "tombstoned — ids must be disjoint")
    // CLEAN — span-excise against the FROZEN corpus span set: Bloom
    // per-row (batch-sized mapPartitions), then a partition-pruned
    // exact verify of the hits only.
    val accepted = cleanAgainstCorpusSpans(acceptedRaw.select("id", "text"))
      .localCheckpoint(true)
    // COMMIT — batch-sized delta appends, nothing else.
    writeLayer(accepted.withColumn("part", partOf(col("id"))),
      "docs/delta", partitioned = true, SaveMode.Append)
    writeLayer(
      acceptedRaw.select(col("fingerprint"),
        partOf(col("fingerprint")).as("part")),
      "ledger/delta", partitioned = true, SaveMode.Append)
    writeLayer(fpRows(accepted, 1L), "fp/delta", partitioned = true,
      SaveMode.Append)
    writeLayer(spanRows(accepted, 1L), "span/delta", partitioned = true,
      SaveMode.Append)
    writeLayer(Dedup.bandTable(accepted, "id", "text", numHashes, bands),
      "bands/delta", partitioned = false, SaveMode.Append)
    writeLayer(Dedup.simhashBandTable(accepted, "id", "text", simhashBlocks),
      "simhash/delta", partitioned = false, SaveMode.Append)
    val rows = ngramRows(accepted).localCheckpoint(true)
    writeLayer(dfRows(rows, 1L), "ngramdf/delta", partitioned = false,
      SaveMode.Append)
    writeLayer(rows.select("blk", "shingle", "id"), "postings/delta",
      partitioned = false, SaveMode.Append)
    writeLayer(Dedup.shingleSetsOfRows(rows), "sets/delta",
      partitioned = false, SaveMode.Append)
    // Grow the gate Blooms: committed (cleaned) fps, raw-ledger fps, ids.
    accepted.select(fpc(col("text")).as("f")).filter(col("f").isNotNull)
      .distinct().as[String].collect().foreach(fpBloom.putString)
    acceptedRaw.select("fingerprint").distinct().as[String].collect()
      .foreach(fpBloom.putString)
    batchIds.foreach(idBloom.putLong)
  }

  private def cleanAgainstCorpusSpans(batchDocs: DataFrame): DataFrame = {
    val toks = batchDocs
      .select(col("id"), Dedup.words(col("text")).as("wd"))
      .localCheckpoint(true)
    val bSpans = toks
      .select(col("id"), explode(Dedup.posShingles(col("wd"), w)).as("ps"))
      .select(col("id"), col("ps.pos").cast("long").as("pos"),
        Dedup.hash60(col("ps.s")).as("fp"))
    val bloom = spanBloomBc
    val hits = bSpans.as[(Long, Long, Long)]
      .mapPartitions { it =>
        val b = bloom.value
        it.filter { case (_, _, fp) => b.mightContainLong(fp) }
      }
      .toDF("id", "pos", "fp")
      .localCheckpoint(true)
    val removable =
      if (hits.isEmpty) hits.select("id", "pos")
      else {
        val hitParts = hits.select(partOf(col("fp")).as("part"))
          .distinct().as[Int].collect().toSeq
        val present = readOr("span/corpus", spanSchema)
          .filter(col("part").isin(hitParts: _*))
          .join(broadcast(hits.select("fp").distinct()), Seq("fp"),
            "left_semi")
          .select("fp").distinct()
        hits.join(broadcast(present), Seq("fp"), "left_semi")
          .select("id", "pos")
      }
    Dedup.exciseIntervals(toks, removable, w)
      .select(col("id"), col("clean_text").as("text"))
  }

  // ---- the retract fold -----------------------------------------------
  /** Fold one takedown delivery (a frame with an `id` column) into the
    * stored artifacts: tombstone the ids, append the signed decrements.
    * Replay-safe by batch id and by content (an already-tombstoned or
    * never-committed id is a no-op). Per-delivery work is delete-sized
    * plus one partition-pruned docs read. */
  def retractBatch(deleteIds: DataFrame, batchId: Long): Unit = synchronized {
    if (!seenRetracts.add(batchId)) return
    val del = deleteIds.select(col("id")).distinct().localCheckpoint(true)
    val fresh = del
      .join(readOr("tomb/delta", tombSchema), Seq("id"), "left_anti")
      .withColumn("part", partOf(col("id")))
      .localCheckpoint(true)
    if (fresh.isEmpty) return
    val iParts = fresh.select("part").distinct().as[Int].collect().toSeq
    // The stored texts of the deleted docs — the exact rows whose
    // artifact contributions must be inverted.
    val deleted = readAll("docs", docSchema)
      .filter(col("part").isin(iParts: _*))
      .join(broadcast(fresh.select("id")), Seq("id"), "left_semi")
      .select("id", "text")
      .localCheckpoint(true)
    if (deleted.isEmpty) return
    writeLayer(deleted.select("id").coalesce(1), "tomb/delta",
      partitioned = false, SaveMode.Append)
    writeLayer(fpRows(deleted, -1L), "fp/delta", partitioned = true,
      SaveMode.Append)
    writeLayer(spanRows(deleted, -1L), "span/delta", partitioned = true,
      SaveMode.Append)
    writeLayer(dfRows(ngramRows(deleted), -1L), "ngramdf/delta",
      partitioned = false, SaveMode.Append)
    // Bands / simhash / sets / postings / accepted: the tombstone
    // anti-join IS the retraction. The ledger keeps the raw fps —
    // re-delivered taken-down content stays rejected.
  }

  // ---- read faces -------------------------------------------------------
  private def present(rows: DataFrame, key: Seq[String]): DataFrame = rows
    .groupBy(key.map(col): _*)
    .agg(sum(col("w")).as("n"))
    .filter(col("n") > 0)
    .select(key.map(col): _*)

  private def tomb: DataFrame = readOr("tomb/delta", tombSchema)

  private def antiTomb(df: DataFrame): DataFrame =
    df.join(tomb, Seq("id"), "left_anti")

  def committedFingerprints: DataFrame =
    present(readAll("fp", fpSchema), Seq("fingerprint"))
  def committedSpanFps: DataFrame =
    present(readAll("span", spanSchema), Seq("fp"))
  def committedBands: DataFrame =
    antiTomb(readAll("bands", bandSchema)).select("id", "band", "bh")
  def committedSimhashBands: DataFrame =
    antiTomb(readAll("simhash", simSchema))
      .select("id", "simhash", "band", "bv")
  def committedNgramDf: DataFrame = readAll("ngramdf", dfSchema)
    .groupBy("blk", "shingle").agg(sum(col("df")).as("df"))
    .filter(col("df") > 0)
  /** Raw postings → read-time df cap: the lazy compaction. */
  def committedNgramPostings: DataFrame =
    antiTomb(readAll("postings", postSchema))
      .join(committedNgramDf.filter(col("df") <= maxShingleDf)
        .select("blk", "shingle"), Seq("blk", "shingle"))
      .select("blk", "shingle", "id")
  def committedShingleSets: DataFrame =
    antiTomb(readAll("sets", setSchema)).select("id", "shingles")
  def accepted: DataFrame =
    antiTomb(readOr("docs/delta", docSchema)).select("id", "text")

  // Corpus-layer (deploy-time) faces — the readouts' n_corpus column.
  def corpusFingerprints: DataFrame =
    readOr("fp/corpus", fpSchema).select("fingerprint").distinct()
  def corpusSpanFps: DataFrame =
    readOr("span/corpus", spanSchema).select("fp").distinct()
  def corpusBands: DataFrame =
    readOr("bands/corpus", bandSchema).select("id", "band", "bh")
  def corpusSimhashBands: DataFrame =
    readOr("simhash/corpus", simSchema).select("id", "simhash", "band", "bv")
  def corpusNgramDf: DataFrame = readOr("ngramdf/corpus", dfSchema)
    .select("blk", "shingle", "df")
  def corpusNgramPostings: DataFrame = readOr("postings/corpus", postSchema)
    .join(corpusNgramDf.filter(col("df") <= maxShingleDf)
      .select("blk", "shingle"), Seq("blk", "shingle"))
    .select("blk", "shingle", "id")
  def corpusShingleSets: DataFrame =
    readOr("sets/corpus", setSchema).select("id", "shingles")

  // Delta faces — the readouts' n_delta column (positive adds only).
  def deltaFingerprints: DataFrame = readOr("fp/delta", fpSchema)
    .filter(col("w") > 0).select("fingerprint").distinct()
  def deltaSpanFps: DataFrame = readOr("span/delta", spanSchema)
    .filter(col("w") > 0).select("fp").distinct()
  def deltaBands: DataFrame =
    readOr("bands/delta", bandSchema).select("id", "band", "bh")
  def deltaSimhashBands: DataFrame =
    readOr("simhash/delta", simSchema).select("id", "simhash", "band", "bv")
  def deltaNgramRows: DataFrame =
    readOr("postings/delta", postSchema).select("blk", "shingle", "id")
  def deltaShingleSets: DataFrame =
    readOr("sets/delta", setSchema).select("id", "shingles")

  /** The seven committed artifacts in [[Dedup.GateArtifacts]] shape. */
  def gateArtifacts: Dedup.GateArtifacts = Dedup.GateArtifacts(
    fingerprints = committedFingerprints,
    bandTable = committedBands,
    spanFps = committedSpanFps,
    simhashBands = committedSimhashBands,
    ngramPostings = committedNgramPostings,
    ngramDf = committedNgramDf,
    shingleSets = committedShingleSets)

  /** COMPACTION — the deliberate corpus-scale lifecycle op the
    * delta-append design defers to: fold every delta layer and
    * tombstone into a fresh corpus baseline, so read amplification
    * (delta rows, tombstone anti-joins, multiset aggregation) resets to
    * zero. Semantically a NO-OP on the committed faces (spec-pinned
    * row-for-row): signed multisets compact to one summed row per
    * surviving key — PRESERVING the count, so later retractions still
    * decrement exactly — id-keyed tables compact to their tombstone-
    * surviving rows, and the raw ingest ledger compacts to its distinct
    * rows but is never dropped (replay/takedown safety survives
    * compaction). A deployment runs this on the maintenance schedule
    * (the ratio of delta to corpus rows is the trigger), never per
    * delivery. */
  def compact(): Unit = synchronized {
    require(corpusRoot.isEmpty,
      "compact() rewrites the corpus layer — not allowed on a store " +
        "sharing a memoized deploy (other stores read it)")
    val fp = readAll("fp", fpSchema)
      .groupBy("fingerprint", "part").agg(sum(col("w")).as("w"))
      .filter(col("w") > 0)
      .select("fingerprint", "w", "part")
      .localCheckpoint(true)
    val span = readAll("span", spanSchema)
      .groupBy("fp", "part").agg(sum(col("w")).as("w"))
      .filter(col("w") > 0)
      .select("fp", "w", "part")
      .localCheckpoint(true)
    val ndf = readAll("ngramdf", dfSchema)
      .groupBy("blk", "shingle").agg(sum(col("df")).as("df"))
      .filter(col("df") > 0)
      .localCheckpoint(true)
    val docs = antiTomb(readAll("docs", docSchema))
      .select("id", "text", "part").localCheckpoint(true)
    val bands = antiTomb(readAll("bands", bandSchema))
      .select("id", "band", "bh").localCheckpoint(true)
    val sim = antiTomb(readAll("simhash", simSchema))
      .select("id", "simhash", "band", "bv").localCheckpoint(true)
    val posts = antiTomb(readAll("postings", postSchema))
      .select("blk", "shingle", "id").localCheckpoint(true)
    val sets = antiTomb(readAll("sets", setSchema))
      .select("id", "shingles").localCheckpoint(true)
    val ledger = readOr("ledger/delta", ledgerSchema)
      .select("fingerprint", "part").distinct().localCheckpoint(true)
    def drop(rel: String): Unit = {
      val root = java.nio.file.Paths.get(p(rel))
      if (java.nio.file.Files.exists(root)) {
        val it = java.nio.file.Files.walk(root)
          .sorted(java.util.Comparator.reverseOrder())
          .iterator()
        while (it.hasNext) java.nio.file.Files.delete(it.next())
      }
    }
    writeLayer(fp, "fp/corpus", partitioned = true, SaveMode.Overwrite)
    writeLayer(span, "span/corpus", partitioned = true, SaveMode.Overwrite)
    writeLayer(ndf, "ngramdf/corpus", partitioned = false,
      SaveMode.Overwrite)
    writeLayer(docs, "docs/corpus", partitioned = true, SaveMode.Overwrite)
    writeLayer(bands, "bands/corpus", partitioned = false,
      SaveMode.Overwrite)
    writeLayer(sim, "simhash/corpus", partitioned = false,
      SaveMode.Overwrite)
    writeLayer(posts, "postings/corpus", partitioned = false,
      SaveMode.Overwrite)
    writeLayer(sets, "sets/corpus", partitioned = false, SaveMode.Overwrite)
    writeLayer(ledger, "ledger/delta", partitioned = true,
      SaveMode.Overwrite)
    Seq("fp/delta", "span/delta", "ngramdf/delta", "docs/delta",
      "bands/delta", "simhash/delta", "postings/delta", "sets/delta",
      "tomb/delta").foreach(drop)
  }
}

object TableCommit {

  private case class Layer(
      root: String,
      fpBloom: Array[Byte],
      idBloom: Array[Byte],
      spanBloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter])

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Layer]()

  private[graft] def corpusPrimed(s: SparkSession, key: String): Boolean =
    memo.containsKey((s, key))

  private def ser(b: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }
  private def deser(bytes: Array[Byte]) =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))

  /** CRASH RECOVERY: reopen a store over existing tables — a NEW
    * process resumes folding exactly where the crashed one stopped.
    * Everything semantic lives in the tables; the only driver-held
    * state is rebuilt (gate Blooms, from one scan each) or DELIBERATELY
    * lost: the seen-batch-id set is per-process, so replay protection
    * after a crash rests on the CONTENT layer alone — which is the
    * stronger guarantee the class doc names (a re-delivered document is
    * a content-keyed no-op regardless of its batch id), and exactly why
    * that layer exists. Spec-pinned: fold → crash (drop the instance) →
    * reopen → re-deliver pre-crash content under fresh batch ids → fold
    * new batches lands on a never-crashed twin row-for-row. */
  def reopen(
      spark: SparkSession,
      base: String,
      numHashes: Int,
      bands: Int,
      w: Int,
      simhashBlocks: Int = 4,
      maxShingleDf: Int = Dedup.DefaultShingleDfCap,
      corpusRoot: Option[String] = None): TableCommit =
    new TableCommit(spark, base, numHashes, bands, w,
      simhashBlocks = simhashBlocks, maxShingleDf = maxShingleDf,
      corpusRoot = corpusRoot).rebuildBlooms()

  /** A store whose IMMUTABLE corpus layer is the memoized deploy for
    * `(session, key)` — the ccMemo/knnMemo discipline applied to the
    * commit family's shared deploy: the first caller writes the corpus
    * tables and builds the Blooms once; later callers reuse the tables
    * (read-only after deploy) and receive their OWN deserialized copies
    * of the growable fp/id Blooms (folds mutate them per store), plus
    * the frozen span Bloom broadcast. Deltas, tombstones and the ledger
    * are per-instance — stores stay independent. Memo hits are
    * disclosed in the bench record via [[corpusPrimed]]. */
  def sharedDeploy(
      spark: SparkSession,
      key: String,
      corpus: => DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      bands: Int,
      w: Int,
      simhashBlocks: Int = 4,
      maxShingleDf: Int = Dedup.DefaultShingleDfCap): TableCommit = {
    val layer = memo.computeIfAbsent((spark, key), _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_corpus_layer_").toString
      val tc = new TableCommit(spark, root, numHashes, bands, w,
        simhashBlocks = simhashBlocks, maxShingleDf = maxShingleDf)
        .deploy(corpus, idCol, textCol)
      val (fp, id, span) = tc.blooms
      Layer(root, ser(fp), ser(id), span)
    })
    new TableCommit(
      spark,
      java.nio.file.Files.createTempDirectory("graft_store_").toString,
      numHashes, bands, w, simhashBlocks = simhashBlocks,
      maxShingleDf = maxShingleDf, corpusRoot = Some(layer.root))
      .initBlooms(deser(layer.fpBloom), deser(layer.idBloom),
        layer.spanBloom)
  }
}
