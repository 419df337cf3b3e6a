package graft.queries

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Randomized equivalence for [[TextQueries.interleavedPackDocs]]: random
  * multi-language corpora are packed by the distributed operator and by
  * a local reference that lays the stream out naively — global
  * top-[[TextQueries.VocabSize]] dictionary (count desc, token asc),
  * per-language doc_id-ordered concatenation, the mid-document image
  * anchor pmod(doc_id, n+1) with post-anchor tokens shifted by the
  * image budget, EOS after the text, fixed-length chunking — and
  * aggregates the same per-(lang, seq) counts and checksums. */
class InterleavedPackPropertySpec extends SparkSuite {

  private def localPack(
      docs: Seq[(Long, String, String)]
  ): Map[(String, Long), (Long, Long, Long, Long, Long, Long)] = {
    import TextQueries._
    val tokenized = docs.map { case (id, lang, text) =>
      (id, lang,
        java.util.regex.Pattern.compile(BpePattern).matcher(text) match {
          case m =>
            val b = scala.collection.mutable.ArrayBuffer.empty[String]
            while (m.find()) b += m.group()
            b.toSeq
        })
    }
    val counts = tokenized.flatMap(_._3)
      .groupBy(identity).map { case (t, xs) => t -> xs.size }
    val vocab = counts.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(VocabSize).map(_._1).zipWithIndex.toMap
    // One stream per language, docs in id order, languages independent.
    val slots = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long)] // (lang, gpos, tid, media)
    tokenized.groupBy(_._2).foreach { case (lang, ds) =>
      var off = 0L
      ds.sortBy(_._1).foreach { case (id, _, toks) =>
        val n = toks.size
        val islots = if (id % ImgEvery == 0) ImageTokenCost else 0
        val pstar = (((id % (n + 1)) + (n + 1)) % (n + 1)).toInt
        toks.zipWithIndex.foreach { case (t, p) =>
          val shift = if (islots > 0 && p >= pstar) islots else 0
          slots += ((lang, off + p + shift,
            vocab.getOrElse(t, -1).toLong, 0L))
        }
        val eosShift = if (islots > 0) islots else 0
        slots += ((lang, off + n + eosShift, EosId, 0L))
        (0 until islots).foreach { s =>
          slots += ((lang, off + pstar + s, ImgId, id))
        }
        off += n + 1 + islots
      }
    }
    slots.groupBy { case (lang, g, _, _) => (lang, g / TrainSeqLen) }
      .map { case (k, xs) =>
        val sps = xs.map { case (_, g, tid, media) =>
          (g % TrainSeqLen, tid, media)
        }
        k -> ((xs.size.toLong,
          sps.count { case (_, t, _) => t != EosId && t != ImgId }.toLong,
          sps.count(_._2 == ImgId).toLong,
          sps.count(_._2 == EosId).toLong,
          sps.map { case (sp, t, _) => t * (sp + 1) }.sum,
          sps.map { case (sp, _, m) => m * (sp + 1) }.sum))
      }
  }

  private val genDocs: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(1, 9)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 30)
      ws <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "d1", "e,", "ff"))
      lang <- Gen.oneOf("en", "xx")
    } yield (lang, ws.mkString(" ")))
  } yield docs.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }

  test("distributed interleaved packing equals the local layout reference") {
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(15)
        .withInitialSeed(org.scalacheck.rng.Seed(13L)),
      Prop.forAll(genDocs) { docs =>
        import spark.implicits._
        val df = docs.toDF("doc_id", "lang", "text")
        val got = TextQueries.interleavedPackDocs(spark, df, withImages = true)
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
              r.getLong(6), r.getLong(7))))
          .toMap
        val want = localPack(docs)
        if (got == want) Prop.passed
        else Prop.falsified :| s"docs=$docs\n got=$got\nwant=$want"
      })
    assert(res.passed, res.status.toString)
  }
}
