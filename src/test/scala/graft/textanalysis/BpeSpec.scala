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

  test("frozen MergesWordFull is the trainer's full saturation table") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    // Asking for 512 stops at saturation — every type a single symbol.
    val trained = Bpe.trainMergesFromCorpus(docs, 512)
    assert(trained == Bpe.MergesWordFull)
    assert(trained.size == 127, s"saturation moved: ${trained.size}")
  }

  test("frozen Merges512Hex is what the trainer produces on the hex stream") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val trained = Bpe.trainMergesFromTokens(
      Bpe.hexTokenStream(docs).select("tok"), 512)
    assert(trained == Bpe.Merges512Hex)
    assert(trained.size == 512)
  }

  test("every frozen table is training-consistent (encodeLocal precondition)") {
    assert(Bpe.isTrainingConsistent(Bpe.MergesV1))
    assert(Bpe.isTrainingConsistent(Bpe.MergesWordFull))
    assert(Bpe.isTrainingConsistent(Bpe.Merges512Hex))
    // A table whose input symbol was never produced is rejected.
    assert(!Bpe.isTrainingConsistent(Seq(("ab", "c"))))
  }

  test("encodeLocal equals the sequential reference on all frozen tables") {
    // Corpus word types under the word tables; hex types under the hex
    // table — every (token, table) pair the declared queries encode.
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    import spark.implicits._
    val wordToks = docs
      .select(explode(regexp_extract_all(
        col("text"),
        lit(graft.queries.TextQueries.BpePattern), lit(0))).as("tok"))
      .distinct().as[String].collect()
    val hexToks = Bpe.hexTokenStream(docs)
      .select("tok").distinct().as[String].collect()
    for ((toks, merges) <- Seq(
        (wordToks, Bpe.MergesV1),
        (wordToks, Bpe.MergesWordFull),
        (hexToks, Bpe.Merges512Hex))) {
      val idx = merges.toIndexedSeq
      val ranks = idx.zipWithIndex.toMap
      toks.foreach { tok =>
        assert(Bpe.encodeLocal(tok, idx, ranks) == refEncode(tok, merges),
          s"token '$tok' (${merges.size} merges)")
      }
    }
  }

  test("subwordCountsForTypes picks the right path and both agree with the spec") {
    import spark.implicits._
    // A 512-deep chained-replace Column tree is not merely slow — the
    // analyzer's ColumnNode conversion overflows the stack (verified),
    // which is WHY tables past ExprMergeLimit must take the
    // priority-merge path. Both paths are pinned here against the
    // sequential reference encoder at the DataFrame level.
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(Bpe.Merges512Hex.size > Bpe.ExprMergeLimit)
    assert(Bpe.MergesV1.size <= Bpe.ExprMergeLimit)
    val hexTypes = Bpe.hexTokenStream(docs).select("tok").distinct().limit(64)
    val viaTrie = Bpe.subwordCountsForTypes(hexTypes, "tok", Bpe.Merges512Hex)
      .as[(String, Long)].collect().toMap
    assert(viaTrie.nonEmpty)
    viaTrie.foreach { case (tok, n) =>
      assert(n == refEncode(tok, Bpe.Merges512Hex).length.toLong,
        s"trie path, token '$tok'")
    }
    val wordTypes = docs
      .select(explode(regexp_extract_all(
        col("text"),
        lit(graft.queries.TextQueries.BpePattern), lit(0))).as("tok"))
      .distinct()
    val viaExpr = Bpe.subwordCountsForTypes(wordTypes, "tok", Bpe.MergesV1)
      .as[(String, Long)].collect().toMap
    assert(viaExpr.nonEmpty)
    viaExpr.foreach { case (tok, n) =>
      assert(n == refEncode(tok, Bpe.MergesV1).length.toLong,
        s"expression path, token '$tok'")
    }
  }

  test("duplicate merge pairs are refused loudly on the trie path") {
    import spark.implicits._
    // encodeLocal's rank map keeps only the LAST rank of a duplicate
    // pair while encodeExpr would apply it at both positions — the
    // silent-divergence case must fail at call time instead. The table
    // must exceed ExprMergeLimit to reach the trie path and stay
    // training-consistent so the duplicate check is what fires.
    val base = Bpe.Merges512Hex
    assert(base.size > Bpe.ExprMergeLimit)
    val dup = base :+ base.head
    assert(Bpe.isTrainingConsistent(dup),
      "fixture must reach the duplicate check, not the consistency one")
    val types = Seq("ab", "cd").toDF("tok")
    val ex = intercept[IllegalArgumentException] {
      Bpe.subwordCountsForTypes(types, "tok", dup)
    }
    assert(ex.getMessage.contains("duplicate"), ex.getMessage)
  }

  test("null tokens yield null n_sub on BOTH encode paths") {
    import spark.implicits._
    // The expression path propagates null through the merge fold; the
    // mapPartitions path used to NPE in encodeLocal — the same frame
    // must behave identically regardless of merge-table size.
    val types = Seq(Some("2b"), None, Some("ff")).toDF("tok")
    val small = Bpe.subwordCountsForTypes(types, "tok", Bpe.MergesV1)
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getLong(1)))
    val big = Bpe.subwordCountsForTypes(types, "tok", Bpe.Merges512Hex)
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getLong(1)))
    assert(small.count(_._1 == null) == 1 && big.count(_._1 == null) == 1)
    assert(small.filter(_._1 == null).forall(_._2 == null),
      "expression path: null in, null n_sub out")
    assert(big.filter(_._1 == null).forall(_._2 == null),
      "trie path: null in, null n_sub out")
    // Non-null tokens still encode on both paths.
    assert(small.filter(_._1 != null).forall(_._2 != null))
    assert(big.filter(_._1 != null).forall(_._2 != null))
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
      val idx = merges.toIndexedSeq
      val ranks = idx.zipWithIndex.toMap
      got.foreach { case (tok, enc, n) =>
        val ref = refEncode(tok, merges)
        assert(enc == ref.map(s => Bpe.Sep + s + Bpe.Sep).mkString,
          s"round $round token '$tok' merges $merges")
        assert(n == ref.length.toLong)
        // Trained tables are training-consistent by construction, so the
        // priority-merge encoder must agree too.
        assert(Bpe.encodeLocal(tok, idx, ranks) == ref,
          s"round $round token '$tok' encodeLocal vs ref")
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
