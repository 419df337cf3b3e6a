package graft.textanalysis

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSuite {

  /** Reference encoder: subword-nmt `apply` semantics — merges in learned
    * order, each a left-to-right non-overlapping pass. */
  private def refEncode(
      tok: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = tok.replace(Bpe.Sep, "").map(_.toString).toVector
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
          out += a + b; j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("frozen MergesV1 is exactly what the trainer produces on sf0.001") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(Bpe.trainMergesFromCorpus(docs, 24) == Bpe.MergesV1)
  }

  test("expression encode equals the reference encoder on every corpus type") {
    import spark.implicits._
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val types = docs
      .select(explode(regexp_extract_all(
        col("text"),
        lit(graft.queries.TextQueries.BpePattern), lit(0))).as("tok"))
      .distinct()
    val got = types
      .withColumn("enc", Bpe.encodeExpr(col("tok"), Bpe.MergesV1))
      .withColumn("n_sub", Bpe.subwordCount(col("enc")))
      .as[(String, String, Long)]
      .collect()
    assert(got.nonEmpty)
    got.foreach { case (tok, enc, nSub) =>
      val ref = refEncode(tok, Bpe.MergesV1)
      val refWrapped = ref.map(s => Bpe.Sep + s + Bpe.Sep).mkString
      assert(enc == refWrapped, s"token '$tok': $enc vs $refWrapped")
      assert(nSub == ref.length.toLong, s"token '$tok' count")
    }
  }

  test("adjacent same-pair occurrences all merge (no shared-boundary skip)") {
    import spark.implicits._
    // "baba" + merge (b,a): both pairs must merge -> ["ba","ba"], the
    // case a single-separator representation gets wrong.
    val merges = Seq(("b", "a"))
    val got = Seq("baba", "bbb", "abab")
      .toDF("tok")
      .withColumn("n_sub",
        Bpe.subwordCount(Bpe.encodeExpr(col("tok"), merges)))
      .as[(String, Long)].collect().toMap
    assert(got("baba") == 2L)
    assert(got("bbb") == 3L)
    assert(got("abab") == 3L) // a + ba + b? no: a,b,a,b -> a,(ba),b
  }

  test("property: expression encode equals reference on random corpora") {
    import spark.implicits._
    // Random corpora over an alphabet including the characters most
    // likely to break a string-fold encoder: space, underscore (the
    // trainer's own join char is NOT underscore — symbols are raw),
    // quote, regex metachars.
    val rnd = new scala.util.Random(11)
    val alphabet = "abcXY '_.$*"
    def randTok(): String =
      (0 to rnd.nextInt(7))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 5).foreach { round =>
      val corpus = (0 until 30).map(_ => (randTok(), 1L + rnd.nextInt(5)))
      val merges = Bpe.trainMerges(corpus, 12)
      val toks = (0 until 50).map(_ => randTok()).distinct
      val got = toks.toDF("tok")
        .withColumn("enc", Bpe.encodeExpr(col("tok"), merges))
        .withColumn("n", Bpe.subwordCount(col("enc")))
        .as[(String, String, Long)].collect()
      got.foreach { case (tok, enc, n) =>
        val ref = refEncode(tok, merges)
        assert(enc == ref.map(s => Bpe.Sep + s + Bpe.Sep).mkString,
          s"round $round token '$tok' merges $merges")
        assert(n == ref.length.toLong)
      }
    }
  }

  test("training on a tiny hand corpus produces the expected merges") {
    // "aa" x3, "ab" x1: pair (a,a) count 3 beats (a,b) count 1; after
    // merging, no adjacent pairs remain except inside "ab".
    val merges = Bpe.trainMerges(Seq(("aa", 3L), ("ab", 1L)), 4)
    assert(merges == Seq(("a", "a"), ("a", "b")))
  }

  test("separator chars in input are stripped before encoding") {
    import spark.implicits._
    val got = Seq("a" + Bpe.Sep + "b").toDF("tok")
      .withColumn("n_sub",
        Bpe.subwordCount(Bpe.encodeExpr(col("tok"), Nil)))
      .as[(String, Long)].collect()
    assert(got.head._2 == 2L)
  }
}
