package graft.similarity

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TABLE-BACKED kNN-graph index — the production shape of
  * [[Ivf.knnIndexFold]]'s chained fold (which stays as the in-memory
  * verification twin): probe table and cell assignment are stored
  * parquet tables PARTITIONED BY CELL, directed edges are stored
  * VERSIONED (a fold appends re-ranked rows under a new `ver`; the
  * current graph is each query's max-ver rows), and every fold appends
  * batch-sized deltas — the full-table `unionByName().localCheckpoint()`
  * copy the in-memory fold pays per delivery is gone, which is exactly
  * the VERDICT r11 item: its near-flat 16× curve held only because
  * fixed overhead dominated; this store's per-delivery work is
  * delta-sized by construction.
  *
  * The fold avoids re-running the cell-keyed score join over stored
  * probe rows entirely, via the TOP-K MERGE law: arrivals only ADD
  * candidates, so an affected query's new top-k equals
  * top-k(old top-k ∪ its scored batch candidates) — a vector outside
  * the old top-k can never enter (the new kth-best score is ≥ the old
  * kth-best, and [[Similarity.rankTopK]]'s (score desc, vec_id asc)
  * order is deterministic, so boundary ties resolve identically).
  * Per delivery that is:
  *
  *   1. batch probes/assignment against the frozen broadcast centroids
  *      (batch-sized map work), appended;
  *   2. batch queries' edges: one score join of the batch probes
  *      against the stored assignment PRUNED to the batch-probed cells
  *      (PartitionFilters) plus the batch itself;
  *   3. affected stored queries (probe rows in an arrival cell — a
  *      cell-pruned read) score ONLY the arrivals (probe-rows ⋈ batch
  *      assignment), merge with their current stored top-k (edge read
  *      pruned to the affected id hash-partitions), re-rank, append
  *      under the new version.
  *
  * KnnStoreSpec pins the chain law (N folded deliveries read back the
  * from-scratch [[Ivf.knnEdges]] of corpus ∪ all arrivals) against both
  * the oracle-checked from-scratch build and the in-memory fold. */
class KnnStore(
    spark: SparkSession,
    base: String,
    nProbe: Int,
    k: Int,
    parts: Int = 16) {

  import spark.implicits._

  private var centArr: DataFrame = _
  private var ver: Long = 0L
  private val seen = scala.collection.mutable.HashSet.empty[Long]

  private def p(rel: String) = s"$base/$rel"
  private def partOf(c: org.apache.spark.sql.Column) =
    pmod(hash(c), lit(parts))

  private def readProbes: DataFrame = spark.read.parquet(p("probes"))
    .withColumn("cell", col("cell").cast("long"))
  private def readAsg: DataFrame = spark.read.parquet(p("asg"))
    .withColumn("cell", col("cell").cast("long"))
  private def readEdges: DataFrame = spark.read.parquet(p("edges"))

  /** Each query's rows under its highest version — the current graph. */
  private def currentEdges(edges: DataFrame): DataFrame = {
    val w = Window.partitionBy("q_vec_id")
    edges
      .withColumn("mx", max(col("ver")).over(w))
      .filter(col("ver") === col("mx"))
      .select("q_vec_id", "vec_id", "score")
  }

  def deploy(
      corpus: DataFrame,
      centroidIds: Seq[Long]
  ): KnnStore = {
    require(nProbe >= 1, s"need nProbe >= 1, got $nProbe")
    Similarity.ensureFunctions(corpus)
    val cent = Ivf.fixedCentroidsDouble(corpus, centroidIds)
    centArr = cent
      .agg(collect_list(struct(col("cell"), col("cemb"))).as("cents"))
      .localCheckpoint(true)
    // Persist the frozen quantizer next to the index tables so a crash
    // recovery ([[KnnStore.reopen]]) restores the complete store.
    centArr.write.mode(SaveMode.Overwrite).parquet(p("cent"))
    val c0 = Ivf.prepDouble(corpus)
    val probes = Ivf.knnProbeFrame(c0, centArr, nProbe)
      .withColumn("cell", col("cell").cast("long"))
      .localCheckpoint(true)
    val asg = Ivf.knnAsgFrame(c0, centArr)
      .withColumn("cell", col("cell").cast("long"))
      .localCheckpoint(true)
    probes.write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(p("probes"))
    asg.write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(p("asg"))
    Ivf.knnEdgesCore(probes, asg, k)
      .select("q_vec_id", "vec_id", "score")
      .withColumn("ver", lit(0L))
      .withColumn("part", partOf(col("q_vec_id")))
      .coalesce(4)
      .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(p("edges"))
    this
  }

  /** Fold one delivery of (vec_id, embedding) arrivals. Replay-safe by
    * batch id; every job is batch-sized or a partition-pruned read. */
  def foldBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!seen.add(batchId)) return
    Similarity.ensureFunctions(batch)
    val b0 = Ivf.prepDouble(batch).localCheckpoint(true)
    if (b0.isEmpty) return
    ver += 1
    val bProbes = Ivf.knnProbeFrame(b0, centArr, nProbe)
      .withColumn("cell", col("cell").cast("long"))
      .localCheckpoint(true)
    val bAsg = Ivf.knnAsgFrame(b0, centArr)
      .withColumn("cell", col("cell").cast("long"))
      .localCheckpoint(true)
    // (2) batch queries rank against the stored members of their probed
    // cells (pruned read) plus the batch itself.
    val probeCells = bProbes.select("cell").distinct().as[Long].collect().toSeq
    val bEdges = Ivf.knnEdgesCore(
      bProbes,
      readAsg.filter(col("cell").isin(probeCells: _*)).unionByName(bAsg),
      k).select("q_vec_id", "vec_id", "score")
    // (3) affected stored queries: probe rows in an ARRIVAL cell.
    val arrivalCells = bAsg.select("cell").distinct().as[Long].collect().toSeq
    val affProbes = readProbes
      .filter(col("cell").isin(arrivalCells: _*))
      .localCheckpoint(true)
    val dot = Similarity.dotSql _
    val newCand = affProbes
      .join(bAsg, Seq("cell"))
      .filter(col("vec_id") =!= col("q_vec_id"))
      .withColumn("score",
        round(expr(dot("emb", "q_emb")) / (col("nrm") * col("q_nrm")), 6))
      .select("q_vec_id", "vec_id", "score")
      .localCheckpoint(true)
    val affIds = newCand.select("q_vec_id").distinct().localCheckpoint(true)
    val affParts = affIds.select(partOf(col("q_vec_id")).as("part"))
      .distinct().as[Int].collect().toSeq
    val oldTopK =
      if (affParts.isEmpty) newCand.limit(0)
      else currentEdges(readEdges.filter(col("part").isin(affParts: _*)))
        .join(broadcast(affIds), Seq("q_vec_id"), "left_semi")
    val merged = Similarity
      .rankTopK(oldTopK.unionByName(newCand), k)
      .select("q_vec_id", "vec_id", "score")
    bEdges.unionByName(merged)
      .withColumn("ver", lit(ver))
      .withColumn("part", partOf(col("q_vec_id")))
      .coalesce(1)
      .write.mode(SaveMode.Append).partitionBy("part").parquet(p("edges"))
    bProbes.coalesce(1).write.mode(SaveMode.Append).partitionBy("cell")
      .parquet(p("probes"))
    bAsg.coalesce(1).write.mode(SaveMode.Append).partitionBy("cell")
      .parquet(p("asg"))
  }

  /** The directed edge set the store currently encodes. */
  def directedEdges: DataFrame = currentEdges(readEdges)

  /** The mutual graph the store currently encodes. */
  def mutualGraph: DataFrame = Ivf.mutualize(directedEdges)

  private[similarity] def restore(): KnnStore = {
    centArr = spark.read.parquet(p("cent")).localCheckpoint(true)
    ver = readEdges.agg(max(col("ver"))).head().getLong(0)
    this
  }

  /** COMPACTION — the versioned edge table's deliberate corpus-scale
    * maintenance op: rewrite it keeping only each query's CURRENT rows
    * (ver resets to 0), so the read-time max-ver window stops paying
    * for superseded versions. Probe/assignment tables are append-only
    * (arrivals never supersede rows), so only edges compact. A
    * committed-face no-op, spec-pinned, and later folds land on an
    * uncompacted twin exactly. */
  def compact(): Unit = synchronized {
    val cur = directedEdges.localCheckpoint(true)
    cur
      .withColumn("ver", lit(0L))
      .withColumn("part", partOf(col("q_vec_id")))
      .repartition(parts, col("part"))
      .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(p("edges"))
    ver = 0L
  }
}

object KnnStore {
  /** CRASH RECOVERY: reopen a store over existing index tables — the
    * persisted quantizer reloads and the version counter resumes from
    * the stored edge maximum; the seen-batch-id set is per-process
    * (re-deliver under fresh ids only after external dedup, or accept
    * the idempotence that id-disjoint folds give). Spec-pinned: fold →
    * drop the instance → reopen → fold more lands on a never-crashed
    * twin exactly. */
  def reopen(
      spark: SparkSession,
      base: String,
      nProbe: Int,
      k: Int,
      parts: Int = 16): KnnStore =
    new KnnStore(spark, base, nProbe, k, parts).restore()
}
