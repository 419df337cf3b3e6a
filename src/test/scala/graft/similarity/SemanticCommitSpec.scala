package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Commit face of the semantic family's stored cell-assignment artifact
  * ([[Ivf.commitCellAssignments]]) and the gate that reads it
  * ([[Ivf.semanticIncrementalFromArtifacts]]): the committed table must
  * equal a rebuild from scratch under the same frozen centroids, fold
  * batching-invariantly, refuse id collisions loudly — and the
  * artifact-driven gate must agree row-for-row with the recomputing
  * incremental gate, so deploying the artifact can never change a
  * verdict. */
class SemanticCommitSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val centroidIds = (0 until 8).map(_ * 37L)
  private lazy val corpus = emb.filter(col("vec_id") % 9 =!= 8)
  private lazy val batch = emb.filter(col("vec_id") % 9 === 8)
  private lazy val cent =
    Ivf.fixedCentroidsDouble(corpus, centroidIds).localCheckpoint(true)
  private lazy val stored = Ivf.assignCells(corpus, cent).localCheckpoint(true)

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("committed == rebuilt from scratch on corpus ∪ accepted under frozen centroids") {
    val committed = rows(Ivf.commitCellAssignments(stored, cent, batch))
    val rebuilt = rows(Ivf.assignCells(emb, cent))
    assert(committed == rebuilt)
    assert(rows(stored).subsetOf(committed))
  }

  test("map-side assignCells == the window-ranked assignment of the dedup face") {
    // semanticDedup assigns via crossJoin + row_number window
    // (nearestCellsIn); the commit face assigns via the array_min
    // lambda. Same (dist, cell) argmin, same arithmetic — pin it.
    val viaWindow = Ivf
      .fixedIndexArtifacts(corpus, centroidIds)._2
      .select("vec_id", "cell")
    assert(rows(Ivf.assignCells(corpus, cent)) == rows(viaWindow))
  }

  test("the fold is batching-invariant: b1 then b2 == b1 ∪ b2") {
    val b1 = batch.filter(col("vec_id") % 2 === 0)
    val b2 = batch.filter(col("vec_id") % 2 =!= 0)
    val twoStep = rows(Ivf.commitCellAssignments(
      Ivf.commitCellAssignments(stored, cent, b1), cent, b2))
    val oneShot = rows(Ivf.commitCellAssignments(stored, cent, batch))
    assert(twoStep == oneShot)
  }

  test("an arrival reusing a stored vec_id is refused, not conflated") {
    val e = intercept[IllegalArgumentException] {
      Ivf.commitCellAssignments(stored, cent, corpus.limit(1))
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("an empty delivery commits as a no-op") {
    val committed = rows(
      Ivf.commitCellAssignments(stored, cent, emb.filter(lit(false))))
    assert(committed == rows(stored))
  }

  test("retraction == rebuilt on survivors; retract ∘ commit == identity") {
    val del = emb.filter(col("vec_id") % 10 === 3).select("vec_id")
    val full = Ivf.assignCells(emb, cent).localCheckpoint(true)
    assert(rows(Ivf.retractCellAssignments(full, del)) ==
      rows(Ivf.assignCells(emb.filter(col("vec_id") % 10 =!= 3), cent)))
    val roundTrip = Ivf.retractCellAssignments(
      Ivf.commitCellAssignments(stored, cent, batch),
      batch.select("vec_id"))
    assert(rows(roundTrip) == rows(stored))
  }

  test("artifact-driven gate == the recomputing incremental gate row-for-row") {
    val threshold = 0.35
    val fromArtifacts = Ivf
      .semanticIncrementalFromArtifacts(corpus, stored, batch, cent, threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val recomputed = Ivf
      .semanticDedupIncremental(corpus, batch, centroidIds, threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(fromArtifacts == recomputed)
    assert(fromArtifacts.nonEmpty,
      "fixture must exercise the gate: no verdicts means the pin is vacuous")
  }
}
