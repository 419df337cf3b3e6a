package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** STREAMING corpus commit — the continuous-ingest face of
  * [[Dedup.commitArtifacts]], closing the last gap between the ingest
  * gates and the artifacts they read: gate-accepted arrivals fold into
  * the committed artifact set per micro-batch (`foreachBatch` + an
  * idempotent delta union, the standard streaming-upsert shape), so the
  * NEXT delivery gates against a corpus that already contains this one.
  *
  * Per micro-batch ([[foldBatch]]):
  *   1. GATE — content-keyed: a fingerprint already committed (corpus or
  *      any earlier batch) rejects the arrival; within the batch the
  *      min-id row keeps, exactly [[Dedup.incrementalExact]]'s keeper
  *      rule.
  *   2. CLEAN — span-excise against the FROZEN deploy-time corpus span
  *      fp set (the batch face's discipline: cleaning is against the
  *      original corpus, which keeps the fold batching-invariant).
  *   3. COMMIT — each artifact gains its batch-sized delta with the
  *      EXACT [[Dedup.commitArtifacts]] fold arithmetic, including the
  *      df-sidecar re-compaction of the n-gram postings (associative
  *      because df is monotone — see commitArtifacts' scaladoc).
  *
  * Replay safety is two-layered: a re-delivered BATCH (failure-recovery
  * replay) is skipped by batch id, and a re-delivered DOCUMENT in any
  * later batch is a content-keyed no-op — the stronger guarantee, since
  * it holds even across restarts that reset the batch-id sequence. The
  * content key is the RAW-text ingest ledger, not just the committed
  * fingerprint set: span-cleaning rewrites an accepted doc's text, so
  * its committed fingerprint differs from the raw fingerprint it
  * arrived under, and without the ledger a raw re-delivery would pass
  * the gate a second time (the batch face has the same property — its
  * id-disjointness require is what catches it loudly there).
  *
  * Batching invariance (spec-pinned): the committed id-free artifacts
  * (fingerprint set, span fp set) are IDENTICAL for any split of the
  * same deliveries, and the id-carrying ones (band tables, postings,
  * sets) are identical up to which duplicate-content id was kept —
  * duplicate fingerprints imply identical word sequences, so every
  * count and every id-free projection is split-invariant.
  *
  * Scale shape: here the committed state is re-checkpointed per fold
  * (the verification harness); a production deployment stores each
  * artifact as a table and the fold is a batch-sized MERGE/append — the
  * per-delivery work is the delta build (batch-sized) plus the df
  * upsert (batch-shingle-keyed), never a corpus × batch join. */
class StreamingCommit(
    corpus: DataFrame,
    idCol: String,
    textCol: String,
    numHashes: Int,
    bands: Int,
    w: Int,
    simhashBlocks: Int = 4,
    ngramBlockCol: Column = lit(0L),
    ngramN: Int = 3,
    maxShingleDf: Int = Dedup.DefaultShingleDfCap) {

  private val fpc = graft.text.TextFunctions.fingerprintCol _

  private val corpusDocs = corpus
    .select(col(idCol).as("id"), col(textCol).as("text"))
    .localCheckpoint(true)

  // Deploy-time frozen artifacts (what a production committer loads).
  val corpusFingerprints: DataFrame = corpusDocs
    .select(fpc(col("text")).as("fingerprint"))
    .filter(col("fingerprint").isNotNull)
    .distinct()
    .localCheckpoint(true)
  val corpusBands: DataFrame = Dedup
    .bandTable(corpusDocs, "id", "text", numHashes, bands)
    .localCheckpoint(true)
  val corpusSpanFps: DataFrame =
    Dedup.spanFpSet(corpusDocs, "id", "text", w).localCheckpoint(true)
  val corpusSimhashBands: DataFrame = Dedup
    .simhashBandTable(corpusDocs, "id", "text", simhashBlocks)
    .localCheckpoint(true)
  private val corpusNgramRows = Dedup
    .ngramShingleRows(corpusDocs, "id", "text", ngramBlockCol, ngramN)
    .localCheckpoint(true)
  val corpusNgramDf: DataFrame = corpusNgramRows
    .groupBy("blk", "shingle")
    .agg(count(lit(1)).as("df"))
    .localCheckpoint(true)
  val corpusNgramPostings: DataFrame = corpusNgramRows
    .join(
      corpusNgramDf.filter(col("df") <= maxShingleDf).select("blk", "shingle"),
      Seq("blk", "shingle"))
    .select("blk", "shingle", "id")
    .localCheckpoint(true)
  val corpusShingleSets: DataFrame =
    Dedup.shingleSetsOfRows(corpusNgramRows).localCheckpoint(true)

  /** The mutable committed state: the artifacts the NEXT delivery gates
    * against, plus the accumulated deltas and accepted docs (readout /
    * spec surfaces). */
  case class Committed(
      fingerprints: DataFrame,
      bandTable: DataFrame,
      spanFps: DataFrame,
      simhashBands: DataFrame,
      ngramPostings: DataFrame,
      ngramDf: DataFrame,
      shingleSets: DataFrame,
      accepted: DataFrame,
      /** RAW fingerprints of every accepted arrival (pre-clean) — the
        * ingest ledger that makes content replay a no-op even when
        * cleaning rewrote the committed text. */
      rawLedger: DataFrame,
      deltaFingerprints: DataFrame,
      deltaBands: DataFrame,
      deltaSpanFps: DataFrame,
      deltaSimhashBands: DataFrame,
      deltaNgramRows: DataFrame,
      deltaShingleSets: DataFrame)

  @volatile private var state: Committed = Committed(
    fingerprints = corpusFingerprints,
    bandTable = corpusBands,
    spanFps = corpusSpanFps,
    simhashBands = corpusSimhashBands,
    ngramPostings = corpusNgramPostings,
    ngramDf = corpusNgramDf,
    shingleSets = corpusShingleSets,
    accepted = corpusDocs.limit(0),
    rawLedger = corpusFingerprints.limit(0),
    deltaFingerprints = corpusFingerprints.limit(0),
    deltaBands = corpusBands.limit(0),
    deltaSpanFps = corpusSpanFps.limit(0),
    deltaSimhashBands = corpusSimhashBands.limit(0),
    deltaNgramRows = corpusNgramRows.limit(0),
    deltaShingleSets = corpusShingleSets.limit(0))

  def committed: Committed = state

  private val seenBatches = scala.collection.mutable.HashSet.empty[Long]

  /** Span-excision against the frozen corpus span fp set — the
    * [[Dedup.removeDuplicateSpansIncremental]] arithmetic with the
    * corpus side pre-materialized (a per-batch corpus re-scan would be
    * the one thing a streaming committer must not do). */
  private def cleanAgainstFrozenSpans(batchDocs: DataFrame): DataFrame = {
    val toks = batchDocs
      .select(col("id"), Dedup.words(col("text")).as("wd"))
      .localCheckpoint(true)
    val bSpans = toks
      .select(col("id"), explode(Dedup.posShingles(col("wd"), w)).as("ps"))
      .select(col("id"), col("ps.pos").as("pos"),
        Dedup.hash60(col("ps.s")).as("fp"))
    val removable = bSpans.join(corpusSpanFps, Seq("fp")).select("id", "pos")
    Dedup.exciseIntervals(toks, removable, w)
      .select(col("id"), col("clean_text").as("text"))
  }

  /** Fold one delivery into the committed artifacts. Thread-safe;
    * replay-safe by batch id AND by content (see class doc). */
  def foldBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!seenBatches.add(batchId)) return
    val s0 = state
    val bf = batch
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("fingerprint", fpc(col("text")))
      .filter(col("fingerprint").isNotNull)
    val novel = bf
      .join(s0.fingerprints, Seq("fingerprint"), "left_anti")
      .join(s0.rawLedger, Seq("fingerprint"), "left_anti")
    val acceptedRaw = novel
      .withColumn("mn",
        min(col("id")).over(Window.partitionBy("fingerprint")))
      .filter(col("id") === col("mn"))
      .select("id", "text", "fingerprint")
      .localCheckpoint(true)
    val accepted = cleanAgainstFrozenSpans(acceptedRaw.select("id", "text"))
      .localCheckpoint(true)
    // Same id-disjointness law as the batch face (commitArtifacts): an
    // accepted arrival must not reuse a corpus id OR a previously
    // committed arrival's id — the band-table union would conflate two
    // documents. Batch-sized semi-join against materialized id sets.
    val idClashes = accepted
      .join(
        corpusDocs.select("id").unionByName(s0.accepted.select("id")),
        Seq("id"), "left_semi")
      .count()
    require(idClashes == 0L,
      s"StreamingCommit: $idClashes accepted id(s) already committed " +
        "with different content — ids must be disjoint")
    val dFps = accepted
      .select(fpc(col("text")).as("fingerprint"))
      .filter(col("fingerprint").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val dBands = Dedup.bandTable(
      accepted, "id", "text", numHashes, bands, spread = false)
      .localCheckpoint(true)
    val dSpans = Dedup.spanFpSet(accepted, "id", "text", w, spread = false)
      .localCheckpoint(true)
    val dSim = Dedup.simhashBandTable(
      accepted, "id", "text", simhashBlocks, spread = false)
      .localCheckpoint(true)
    val dNgramRows = Dedup
      .ngramShingleRows(accepted, "id", "text", ngramBlockCol, ngramN,
        spread = false)
      .localCheckpoint(true)
    val dNgramDf = dNgramRows
      .groupBy("blk", "shingle")
      .agg(count(lit(1)).as("df"))
    val dSets = Dedup.shingleSetsOfRows(dNgramRows).localCheckpoint(true)
    val newDf = s0.ngramDf
      .unionByName(dNgramDf)
      .groupBy("blk", "shingle")
      .agg(sum(col("df")).as("df"))
      .localCheckpoint(true)
    val newPostings = s0.ngramPostings
      .unionByName(dNgramRows.select("blk", "shingle", "id"))
      .join(
        newDf.filter(col("df") <= maxShingleDf).select("blk", "shingle"),
        Seq("blk", "shingle"))
      .select("blk", "shingle", "id")
      .localCheckpoint(true)
    state = Committed(
      fingerprints =
        s0.fingerprints.unionByName(dFps).distinct().localCheckpoint(true),
      bandTable = s0.bandTable.unionByName(dBands).localCheckpoint(true),
      spanFps =
        s0.spanFps.unionByName(dSpans).distinct().localCheckpoint(true),
      simhashBands =
        s0.simhashBands.unionByName(dSim).localCheckpoint(true),
      ngramPostings = newPostings,
      ngramDf = newDf,
      shingleSets =
        s0.shingleSets.unionByName(dSets).localCheckpoint(true),
      accepted = s0.accepted.unionByName(accepted).localCheckpoint(true),
      rawLedger = s0.rawLedger
        .unionByName(acceptedRaw.select("fingerprint"))
        .localCheckpoint(true),
      // Cross-batch deltas are disjoint by construction (a later batch's
      // accepted fps/ids can't repeat an earlier one's — the gate runs
      // against the updated committed set), so plain unions accumulate
      // exactly the one-shot batch face's deltas.
      deltaFingerprints =
        s0.deltaFingerprints.unionByName(dFps).localCheckpoint(true),
      deltaBands = s0.deltaBands.unionByName(dBands).localCheckpoint(true),
      deltaSpanFps = s0.deltaSpanFps.unionByName(dSpans)
        .distinct().localCheckpoint(true),
      deltaSimhashBands =
        s0.deltaSimhashBands.unionByName(dSim).localCheckpoint(true),
      deltaNgramRows =
        s0.deltaNgramRows.unionByName(dNgramRows).localCheckpoint(true),
      deltaShingleSets =
        s0.deltaShingleSets.unionByName(dSets).localCheckpoint(true))
  }
}
