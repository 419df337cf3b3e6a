package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Randomized equivalence for [[Sharding.assign]]: random item sets
  * (including duplicate strings and unicode) must match a local
  * reference computing the same md5-slice key, modular shard, and
  * within-shard (key, item) rank directly — pinning the seeded-hash
  * arithmetic AND the bucketed prefix-sum rank machinery against plain
  * Scala. */
class ShardingPropertySpec extends SparkSuite {

  private def md5slice60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private val genItems: Gen[List[String]] = for {
    n <- Gen.choose(1, 60)
    items <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumStr.map(s => s"i$s".take(12)),
      Gen.choose(0, 999).map(i => s"doc-$i"),
      Gen.const("dup-item")))
  } yield items

  test("distributed shard assignment equals the local md5 reference") {
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(15)
        .withInitialSeed(org.scalacheck.rng.Seed(11L)),
      Prop.forAll(genItems, Gen.oneOf(1, 4, 7)) { (items, n) =>
        import spark.implicits._
        val got = Sharding
          .assign(items.toDF("k"), col("k"), n, "prop-seed")
          .collect()
          .map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3))
        // Duplicate item strings are interchangeable rows: compare as
        // sorted multisets of ((item, shard), rank).
        val want = {
          // local reference over DISTINCT items, then re-expand dups:
          // equal items share skey/shard and occupy consecutive ranks.
          val keyed = items.map(i => (i, md5slice60(s"prop-seed:$i")))
          keyed.groupBy { case (_, k) => k % n }
            .toSeq.flatMap { case (shard, rows) =>
              rows.sortBy { case (i, k) => (k, i) }.zipWithIndex.map {
                case ((i, _), idx) => (i, shard) -> (idx + 1L)
              }
            }
        }
        if (got.sorted.toSeq == want.sorted.toSeq) Prop.passed
        else Prop.falsified :| s"n=$n items=$items\n got=${got.sorted.toSeq}\nwant=${want.sorted}"
      })
    assert(res.passed, res.status.toString)
  }
}
