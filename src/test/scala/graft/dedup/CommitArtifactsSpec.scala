package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The defining law of corpus commit: each committed artifact equals the
  * artifact recomputed FROM SCRATCH on corpus ∪ accepted — the
  * incremental fold and the full rebuild can never drift. Plus: the loop
  * actually closes (re-gating the accepted docs against the committed
  * fingerprint set flags every one of them), and the fixture keeps every
  * stage live. */
class CommitArtifactsSpec extends SparkSuite {

  private val Mod = 10
  private lazy val docs =
    graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val corpus = docs.filter(col("doc_id") % Mod =!= 0)
  private lazy val batch = docs.filter(col("doc_id") % Mod === 0)
  private lazy val arts =
    Dedup.commitArtifacts(corpus, batch, "doc_id", "text", 8, 4, 8)

  private def symDiff(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  test("committed artifacts == artifacts rebuilt from scratch on corpus ∪ accepted") {
    val full = corpus
      .select(col("doc_id").as("id"), col("text"))
      .unionByName(arts.accepted)
    val fpc = graft.text.TextFunctions.fingerprintCol _
    assert(symDiff(
      arts.fingerprints,
      full.select(fpc(col("text")).as("fingerprint"))
        .filter(col("fingerprint").isNotNull).distinct()) == 0,
      "fingerprint set drifted from the full rebuild")
    assert(symDiff(
      arts.bandTable,
      Dedup.bandTable(full, "id", "text", 8, 4)) == 0,
      "band table drifted from the full rebuild")
    assert(symDiff(
      arts.spanFps,
      Dedup.spanFpSet(full, "id", "text", 8)) == 0,
      "span fp set drifted from the full rebuild")
  }

  test("the loop closes: every accepted doc re-gates as dup against the committed set") {
    val fpc = graft.text.TextFunctions.fingerprintCol _
    val acceptedFps = arts.accepted
      .select(fpc(col("text")).as("fingerprint")).distinct()
    assert(acceptedFps.exceptAll(arts.fingerprints).count() == 0,
      "an accepted doc's fingerprint is missing from the committed set")
  }

  test("every stage is live on the fixture") {
    assert(arts.accepted.count() > 0, "gate accepted nothing")
    assert(arts.deltaFingerprints.count() > 0)
    assert(arts.deltaBands.count() > 0)
    assert(arts.deltaSpanFps.count() > 0)
    // Committed sets actually grew.
    assert(arts.fingerprints.count() > arts.corpusFingerprints.count())
    assert(arts.spanFps.count() > arts.corpusSpanFps.count())
  }

  test("the gate rejects: a corpus duplicate and an intra-batch duplicate never commit") {
    import spark.implicits._
    val c = Seq((1L, "alpha bravo charlie delta echo foxtrot golf hotel india"))
      .toDF("doc_id", "text")
    val b = Seq(
      (10L, "alpha bravo charlie delta echo foxtrot golf hotel india"), // dup_corpus
      (11L, "fresh words never seen before in this tiny corpus at all"), // new
      (12L, "fresh words never seen before in this tiny corpus at all")  // dup_batch
    ).toDF("doc_id", "text")
    val a = Dedup.commitArtifacts(c, b, "doc_id", "text", 8, 4, 8)
    assert(a.accepted.select("id").as[Long].collect().toSeq == Seq(11L))
    // The committed fingerprint set gains exactly one fingerprint.
    assert(a.fingerprints.count() == a.corpusFingerprints.count() + 1)
  }

  test("id reuse with different content is refused loudly, never conflated") {
    import spark.implicits._
    val c = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india"),
      (2L, "juliet kilo lima mike november oscar papa quebec romeo"))
      .toDF("doc_id", "text")
    // Same id as a corpus doc, DIFFERENT text: the content gate passes it
    // (fingerprints differ) — without the disjointness check the band
    // union would conflate two documents under id 1.
    val clash = Seq((1L, "totally different words that share nothing here"))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.commitArtifacts(c, clash, "doc_id", "text", 8, 4, 8)
    }
    assert(ex.getMessage.contains("ids must be disjoint"), ex.getMessage)
    // Same id SAME text never reaches the check: the gate rejects it as
    // dup_corpus, so the commit is a clean no-op, not an error.
    val sameText =
      Seq((1L, "alpha bravo charlie delta echo foxtrot golf hotel india"))
        .toDF("doc_id", "text")
    val a = Dedup.commitArtifacts(c, sameText, "doc_id", "text", 8, 4, 8)
    assert(a.accepted.count() == 0L)
  }
}
