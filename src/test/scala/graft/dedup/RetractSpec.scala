package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus retraction ([[Dedup.retractArtifacts]]) — the takedown
  * inverse of the commit. The defining laws:
  *   1. every retracted artifact == the artifact rebuilt from scratch
  *      on corpus \ deleted (row-level, all seven tables);
  *   2. the df-capped posting repair: a shingle whose df falls back
  *      under the cap gets its remaining postings RECONSTRUCTED (the
  *      exact inverse of the commit fold's cap-crossing drop);
  *   3. retract ∘ commit == identity on the commit's accepted batch.
  */
class RetractSpec extends SparkSuite {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: scala.collection.Seq[_] => a.toList
      case x => x
    }).toSet

  private def assertAllEqual(
      r: Dedup.RetractedArtifacts, want: Dedup.GateArtifacts): Unit = {
    assert(rows(r.fingerprints) == rows(want.fingerprints), "fingerprints")
    assert(rows(r.bandTable) == rows(want.bandTable), "bandTable")
    assert(rows(r.spanFps) == rows(want.spanFps), "spanFps")
    assert(rows(r.simhashBands) == rows(want.simhashBands), "simhashBands")
    assert(rows(r.ngramPostings) == rows(want.ngramPostings), "ngramPostings")
    assert(rows(r.ngramDf) == rows(want.ngramDf), "ngramDf")
    assert(rows(r.shingleSets) == rows(want.shingleSets), "shingleSets")
  }

  test("every retracted artifact equals the rebuild on corpus \\ deleted (real fixture)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val del = docs
      .filter(col("doc_id") % 7 === 3)
      .select(col("doc_id").as("id"))
    val stored = Dedup.gateArtifactsOf(
      docs, "doc_id", "text", 8, 4, 8, maxShingleDf = 8)
    val r = Dedup.retractArtifacts(
      stored, docs, del, "doc_id", "text", 8, maxShingleDf = 8)
    val remaining = docs.filter(col("doc_id") % 7 =!= 3)
    val want = Dedup.gateArtifactsOf(
      remaining, "doc_id", "text", 8, 4, 8, maxShingleDf = 8)
    assertAllEqual(r, want)
  }

  test("cap-crossing postings are repaired, not lost (synthetic)") {
    import spark.implicits._
    // Shingle alpha_beta_gamma has df 3 > cap 2: stored postings hold
    // NO rows for it. Deleting doc 3 drops its df to 2 <= cap — the
    // repair must reconstruct the remaining carriers' rows.
    val docs = Seq(
      (1L, "alpha beta gamma one two three four five six seven eight nine"),
      (2L, "alpha beta gamma uno dos tres cuatro cinco seis siete ocho nueve"),
      (3L, "alpha beta gamma un deux trois quatre cinq six sept huit neuf"),
      (4L, "totally different words here nothing shared at all right now friend")
    ).toDF("doc_id", "text")
    val stored = Dedup.gateArtifactsOf(
      docs, "doc_id", "text", 8, 4, 8, maxShingleDf = 2)
    val del = Seq(3L).toDF("id")
    val r = Dedup.retractArtifacts(
      stored, docs, del, "doc_id", "text", 8, maxShingleDf = 2)
    assert(r.repairedShingles.count() > 0, "the crossing set must be live")
    val want = Dedup.gateArtifactsOf(
      docs.filter(col("doc_id") =!= 3), "doc_id", "text", 8, 4, 8,
      maxShingleDf = 2)
    assertAllEqual(r, want)
    // The repaired shingle's remaining carriers are really back.
    val carriers = r.ngramPostings
      .join(r.repairedShingles, Seq("blk", "shingle"), "left_semi")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(carriers == Set(1L, 2L))
  }

  test("a shared fingerprint and shared spans survive a partial delete (synthetic)") {
    import spark.implicits._
    // Docs 1 and 2 are byte-identical (shared content fingerprint and
    // every span fp shared); deleting doc 2 must retract NEITHER.
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, t), (2L, t),
      (3L, "other words entirely for the third document in this tiny corpus yes")
    ).toDF("doc_id", "text")
    val stored = Dedup.gateArtifactsOf(
      docs, "doc_id", "text", 8, 4, 8, maxShingleDf = 2)
    val r = Dedup.retractArtifacts(
      stored, docs, Seq(2L).toDF("id"), "doc_id", "text", 8,
      maxShingleDf = 2)
    val want = Dedup.gateArtifactsOf(
      docs.filter(col("doc_id") =!= 2), "doc_id", "text", 8, 4, 8,
      maxShingleDf = 2)
    assertAllEqual(r, want)
    assert(rows(r.fingerprints) == rows(stored.fingerprints),
      "the shared fingerprint must survive")
    assert(rows(r.spanFps) == rows(stored.spanFps),
      "every span fp is shared with doc 1 and must survive")
  }

  test("retract after commit restores the corpus-only artifacts (identity)") {
    val all = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val corpus = all.filter(col("id") % 10 =!= 0)
    val batch = all.filter(col("id") % 10 === 0)
    val base = Dedup.gateArtifactsOf(corpus, "id", "text", 8, 4, 8)
    val c = Dedup.commitArtifacts(corpus, batch, "id", "text", 8, 4, 8)
    val committedDocs = corpus.unionByName(c.accepted)
    val storedAfterCommit = Dedup.GateArtifacts(
      fingerprints = c.fingerprints,
      bandTable = c.bandTable,
      spanFps = c.spanFps,
      simhashBands = c.simhashBands,
      ngramPostings = c.ngramPostings,
      ngramDf = c.ngramDf,
      shingleSets = c.shingleSets)
    val r = Dedup.retractArtifacts(
      storedAfterCommit, committedDocs, c.accepted.select("id"),
      "id", "text", 8)
    assertAllEqual(r, base)
  }
}
