package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property laws of the table-backed store over RANDOM corpora and
  * RANDOM op interleavings — the fixed TableCommitSpec scenarios
  * generalized: any split of a random batch folds to the one-shot
  * [[Dedup.commitArtifacts]] (id-free faces exactly; id-carrying faces
  * up to kept id), and any split of a random takedown set — with
  * replayed and never-committed ids thrown in — retracts to the
  * one-shot [[Dedup.retractArtifacts]], row for row. The tiny word
  * pool forces heavy fingerprint/span/shingle sharing, so the signed-
  * multiset retention arithmetic is exercised where it can actually go
  * wrong. */
class TableCommitPropertySpec extends SparkSuite {

  private val Cap = 3
  private val word =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
  private val docGen = Gen.chooseNum(3, 9)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val corpusGen: Gen[List[(Long, String)]] = Gen.chooseNum(5, 9)
    .flatMap(n => Gen.listOfN(n, docGen))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  private val batchGen: Gen[List[(Long, String)]] = Gen.chooseNum(4, 10)
    .flatMap(n => Gen.listOfN(n, docGen))
    .map(_.zipWithIndex.map { case (t, i) => (1000L + i, t) })

  private def symDiff(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  private def mk(corpus: DataFrame): TableCommit =
    new TableCommit(
      spark,
      java.nio.file.Files.createTempDirectory("graft_tc_prop_").toString,
      4, 2, 3, maxShingleDf = Cap)
      .deploy(corpus, "doc_id", "text")

  test("random 3-way batch splits fold to the one-shot commit") {
    import spark.implicits._
    val gen = for {
      c <- corpusGen
      b <- batchGen
      sp <- Gen.listOfN(b.size, Gen.chooseNum(0, 2))
    } yield (c, b, sp)
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(3)
        .withInitialSeed(org.scalacheck.rng.Seed(31L)),
      Prop.forAll(gen) { case (c, b, sp) =>
        val corpus = c.toDF("doc_id", "text").localCheckpoint(true)
        val store = mk(corpus)
        b.zip(sp).groupBy(_._2).toSeq.sortBy(_._1).foreach {
          case (bucket, docs) =>
            store.foldBatch(
              docs.map(_._1).toDF("id", "text").localCheckpoint(true),
              bucket.toLong)
        }
        val a = Dedup.commitArtifacts(
          corpus, b.toDF("doc_id", "text"), "doc_id", "text", 4, 2, 3,
          maxShingleDf = Cap)
        // Id-free faces: exact. Id-carrying faces: exact up to kept id
        // (duplicate-content keepers may differ across splits).
        val diffs = Seq(
          "fingerprints" ->
            symDiff(store.committedFingerprints, a.fingerprints),
          "span fps" -> symDiff(store.committedSpanFps, a.spanFps),
          "ngram df" -> symDiff(store.committedNgramDf, a.ngramDf),
          "bands (id-free)" -> symDiff(
            store.committedBands.drop("id"), a.bandTable.drop("id")),
          "postings (id-free)" -> symDiff(
            store.committedNgramPostings.drop("id"),
            a.ngramPostings.drop("id")),
          "sets (id-free)" -> symDiff(
            store.committedShingleSets.drop("id"),
            a.shingleSets.drop("id")))
        val bad = diffs.filter(_._2 != 0)
        if (bad.isEmpty) Prop.passed
        else Prop.falsified :| s"faces off: $bad corpus=$c batch=$b split=$sp"
      })
    assert(res.passed, res.status.toString)
  }

  test("random takedown splits (with replays and bogus ids) retract to the one-shot retraction") {
    import spark.implicits._
    val gen = for {
      c <- corpusGen
      mask <- Gen.listOfN(9, Gen.oneOf(true, false))
    } yield (c, mask)
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(3)
        .withInitialSeed(org.scalacheck.rng.Seed(32L)),
      Prop.forAll(gen) { case (c, mask) =>
        val corpus = c.toDF("doc_id", "text").localCheckpoint(true)
        val store = mk(corpus)
        val delIds = c.map(_._1).zip(mask).collect { case (id, true) => id }
        val half1 = delIds.filter(_ % 2 == 0) :+ 5000L // bogus id: no-op
        val half2 = delIds.filter(_ % 2 == 1)
        store.retractBatch(half1.toDF("id"), 0L)
        store.retractBatch(half2.toDF("id"), 1L)
        store.retractBatch(half1.toDF("id"), 2L) // content replay: no-op
        val r = Dedup.retractArtifacts(
          Dedup.gateArtifactsOf(corpus, "doc_id", "text", 4, 2, 3,
            maxShingleDf = Cap),
          corpus, delIds.toDF("id"), "doc_id", "text", 3,
          maxShingleDf = Cap)
        val diffs = Seq(
          "fingerprints" ->
            symDiff(store.committedFingerprints, r.fingerprints),
          "bands" -> symDiff(store.committedBands, r.bandTable),
          "span fps" -> symDiff(store.committedSpanFps, r.spanFps),
          "simhash" ->
            symDiff(store.committedSimhashBands, r.simhashBands),
          "postings" ->
            symDiff(store.committedNgramPostings, r.ngramPostings),
          "ngram df" -> symDiff(store.committedNgramDf, r.ngramDf),
          "sets" -> symDiff(store.committedShingleSets, r.shingleSets))
        val bad = diffs.filter(_._2 != 0)
        if (bad.isEmpty) Prop.passed
        else Prop.falsified :| s"faces off: $bad corpus=$c del=$delIds"
      })
    assert(res.passed, res.status.toString)
  }
}
