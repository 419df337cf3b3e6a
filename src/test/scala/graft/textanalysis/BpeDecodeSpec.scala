package graft.textanalysis

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** decode ∘ encode == identity (modulo separator strip) over the
  * pre-token alphabet — the invariant behind `q_token_decode`, pinned
  * for ALL THREE frozen table sizes (127 / 512 / 4096), plus the
  * DataFrame faces on real fixture tokens and the canonical-id rule for
  * duplicate merge outputs. */
class BpeDecodeSpec extends SparkSuite {

  /** Local round trip: encode a token to ids the way
    * [[Bpe.encodeIdsForTypes]] does, decode with ONLY the id table. */
  private def roundTrip(tok: String, merges: Seq[(String, String)]): String = {
    val idx = merges.toIndexedSeq
    val ranks = idx.zipWithIndex.toMap
    val symToId = Bpe.mergeIdRows(merges).map { case (id, s) => (s, id) }.toMap
    val ids = Bpe.encodeLocal(tok, idx, ranks).map { s =>
      if (s.length == 1) s.charAt(0).toLong else symToId(s)
    }
    Bpe.decodeIds(ids, Bpe.mergeIdRows(merges).toMap)
  }

  private lazy val tables = Seq(
    "MergesWordFull" -> Bpe.MergesWordFull,
    "Merges512Hex" -> Bpe.Merges512Hex,
    "Merges4kHex" -> Bpe.Merges4kHex)

  test("decode(encode(x)) == x for random strings, all three frozen tables") {
    // Merge-active chars (hex digits + common English letters) so merges
    // actually fire, plus digits, punctuation, whitespace, non-ASCII code
    // points, and the reserved separator (stripped by encode).
    val charGen = Gen.frequency(
      6 -> Gen.oneOf("abcdef0123456789".toSeq),
      3 -> Gen.oneOf("the quick brown".toSeq),
      1 -> Gen.oneOf(Seq(' ', '.', ',', '!', 'é', 'ß', '中',
        Bpe.Sep.charAt(0))))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    tables.foreach { case (name, merges) =>
      val res = ScTest.check(
        ScTest.Parameters.default.withMinSuccessfulTests(200),
        Prop.forAll(strGen) { x =>
          roundTrip(x, merges) == x.replace(Bpe.Sep, "")
        })
      assert(res.passed, s"$name round-trip failed: ${res.status}")
    }
  }

  test("DataFrame faces invert on fixture types; ids match deployed counts") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val types = docs.select(
      explode(regexp_extract_all(col("text"),
        lit(graft.queries.TextQueries.BpePattern), lit(0))).as("tok"))
      .distinct()
    val dec = Bpe.decodeIdsForTypes(
      Bpe.encodeIdsForTypes(types, "tok", Bpe.MergesWordFull),
      "tok", Bpe.MergesWordFull)
    assert(dec.filter(col("dec") =!= col("tok")).count() == 0,
      "decode must reproduce every fixture token")
    val joined = dec.join(
      Bpe.subwordCountsForTypes(types, "tok", Bpe.MergesWordFull), "tok")
    assert(
      joined.filter(size(col("ids")).cast("long") =!= col("n_sub")).count() == 0,
      "id-sequence lengths must equal the deployed subword counts")
  }

  test("merge ids are canonical: duplicate outputs keep the first index") {
    // ("ab","c") and ("a","bc") both emit "abc" — only the first enters
    // the decode table, so symbol→id stays a function.
    val t = Vector(("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc"))
    val rows = Bpe.mergeIdRows(t)
    assert(rows.map(_._2).distinct == rows.map(_._2))
    assert(rows.find(_._2 == "abc").get._1 == Bpe.MergeIdBase + 1)
    assert(rows.size == 3)
  }

  test("decodeIds rejects out-of-range fallback ids instead of mangling them") {
    val tab = Bpe.mergeIdRows(Vector(("a", "b"))).toMap
    // In-range: known merge id decodes via the table, a bare code point
    // via the fallback.
    assert(Bpe.decodeIds(Seq('x'.toLong, Bpe.MergeIdBase), tab) == "xab")
    // Unknown id in the merge-id range: descriptive failure, not the
    // JDK's bare IllegalArgumentException from appendCodePoint.
    val exHigh = intercept[IllegalStateException] {
      Bpe.decodeIds(Seq(Bpe.MergeIdBase + 99), tab)
    }
    assert(exHigh.getMessage.contains("neither a known merge id"))
    // The truncation trap: 0x100000041 & 0xFFFFFFFF = 0x41 — without the
    // range check this would silently decode as 'A'.
    val exTrunc = intercept[IllegalStateException] {
      Bpe.decodeIds(Seq(0x100000041L), tab)
    }
    assert(exTrunc.getMessage.contains("corrupt"))
    intercept[IllegalStateException] { Bpe.decodeIds(Seq(-1L), tab) }
  }
}
