package graft.dedup

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property laws of the cross-doc sentence dedup over random corpora:
  * the keep-first election keeps EXACTLY one instance of every
  * distinct sentence corpus-wide, and the incremental gate keeps
  * exactly each batch doc's distinct sentences absent from the frozen
  * corpus set. */
class SentenceDedupPropertySpec extends SparkSuite {

  private val word = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
  private val sentenceGen = Gen.chooseNum(1, 4)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val docGen = Gen.chooseNum(1, 5)
    .flatMap(n => Gen.listOfN(n, sentenceGen).map(_.mkString(". ")))
  private val corpusGen: Gen[List[(Long, String)]] = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, docGen))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def sentences(t: String): Seq[String] =
    t.split("[.!?]+\\s+").map(_.trim).filter(_.nonEmpty).toSeq

  test("keep-first keeps exactly one instance of every distinct sentence") {
    import spark.implicits._
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(20)
        .withInitialSeed(org.scalacheck.rng.Seed(11L)),
      Prop.forAll(corpusGen) { docs =>
        val out = Dedup
          .crossDocSentenceDedup(docs.toDF("doc_id", "text"),
            "doc_id", "text")
          .collect()
        val distinct = docs.flatMap(d => sentences(d._2)).toSet
        val totalKept = out.map(_.getAs[Long]("n_kept")).sum
        val perDocOk = out.forall(r =>
          r.getAs[Long]("n_kept") <= r.getAs[Long]("n_sentences"))
        if (totalKept == distinct.size && perDocOk) Prop.passed
        else Prop.falsified :| s"docs=$docs kept=$totalKept " +
          s"distinct=${distinct.size}"
      })
    assert(res.passed, res.status.toString)
  }

  test("incremental gate keeps exactly batch-distinct minus corpus set") {
    import spark.implicits._
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(15)
        .withInitialSeed(org.scalacheck.rng.Seed(12L)),
      Prop.forAll(corpusGen, corpusGen) { (c, b) =>
        val corpus = c.toDF("doc_id", "text")
        val batch = b.map { case (i, t) => (i + 1000L, t) }
          .toDF("doc_id", "text")
        val byDoc = Dedup
          .sentenceDedupIncremental(corpus, batch, "doc_id", "text")
          .collect()
          .map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_kept")).toMap
        val corpusSet = c.flatMap(d => sentences(d._2)).toSet
        val bad = b.filter { case (i, t) =>
          byDoc(i + 1000L) !=
            sentences(t).distinct.count(s => !corpusSet(s)).toLong
        }
        if (bad.isEmpty) Prop.passed
        else Prop.falsified :| s"bad docs: $bad"
      })
    assert(res.passed, res.status.toString)
  }
}
