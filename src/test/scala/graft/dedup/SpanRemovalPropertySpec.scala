package graft.dedup

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Randomized equivalence for [[Dedup.removeDuplicateSpans]]: random
  * small-alphabet corpora (the adversarial shape for window collisions —
  * few distinct words make cross-doc duplicate windows and OVERLAPPING
  * keeper/removable windows common) are rewritten by the distributed
  * operator and by a trivially-correct local reference implementing the
  * declared semantics directly: per fingerprint with ≥ minDocs distinct
  * docs, the min-id doc keeps; every other doc interval-unions its
  * removable window positions and drops the covered tokens. */
class SpanRemovalPropertySpec extends SparkSuite {

  /** Local reference: the declared semantics, computed naively. */
  private def localRemove(
      docs: Seq[(Long, String)], w: Int, minDocs: Int
  ): Map[Long, (Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+", -1).toSeq
    }.toMap
    // fingerprint = the window text itself (the md5 indirection cannot
    // change semantics; collisions at 2^-60 are not reachable here).
    val windows: Map[Long, Seq[(Int, String)]] = toks.map { case (id, wd) =>
      id -> (if (wd.size < w) Seq.empty
             else (0 to wd.size - w).map(p => p -> wd.slice(p, p + w).mkString("_")))
    }
    val byFp = windows.toSeq
      .flatMap { case (id, ws) => ws.map { case (_, fp) => (fp, id) } }
      .distinct
      .groupBy(_._1)
      .map { case (fp, rows) => fp -> rows.map(_._2) }
    val keeper = byFp.collect {
      case (fp, ids) if ids.distinct.size >= minDocs => fp -> ids.min
    }
    toks.map { case (id, wd) =>
      val removable = windows(id).collect {
        case (p, fp) if keeper.get(fp).exists(_ != id) => p
      }.sorted
      val covered = removable.flatMap(p => p until p + w).toSet
      val kept = wd.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> ((wd.size.toLong, kept.size.toLong,
        (wd.size - kept.size).toLong, kept.mkString(" ")))
    }
  }

  private val genCorpus: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 8)
    alphabet <- Gen.choose(3, 6) // small vocab → frequent shared windows
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(0, 18)
      ws <- Gen.listOfN(len, Gen.choose(0, alphabet - 1).map(i => s"w$i"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def check(
      spark: org.apache.spark.sql.SparkSession,
      docs: List[(Long, String)], w: Int): Prop = {
    import spark.implicits._
    val got = Dedup
      .removeDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        w = w, minDocs = 2L)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))))
      .toMap
    val want = localRemove(docs, w, 2)
    if (got == want) Prop.passed
    else Prop.falsified :| s"w=$w docs=$docs\n got=$got\nwant=$want"
  }

  test("distributed span removal equals the local reference on random corpora") {
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(20)
        .withInitialSeed(org.scalacheck.rng.Seed(9L)),
      Prop.forAll(genCorpus, Gen.oneOf(2, 3, 4)) { (docs, w) =>
        check(spark, docs, w)
      })
    assert(res.passed, res.status.toString)
  }
}
