package graft.dedup

import graft.SparkSuite

/** The DSIR importance-weight law ([[Dedup.dsirWeights]]) pinned on
  * hand-computable inputs: per distinct hashed 3-gram feature,
  * `weight = (df_target + 1) · 10^6 DIV (df_raw + 1)` and a document's
  * score is the exact BIGINT sum — so a raw document sharing the
  * target's features scores the full smoothed ratio and an unrelated
  * one scores exactly the smoothing floor. The cross-engine face is
  * the q_dsir_weights oracle; this spec pins the arithmetic itself. */
class DsirSpec extends SparkSuite {

  test("target-sharing features score the exact smoothed ratio; unrelated ones the floor") {
    import spark.implicits._
    // 4 words -> 2 distinct 3-gram shingles per doc; no shingle is
    // shared between docA and docB.
    val target = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma delta"), // both features in the target
      (2L, "zeta eta theta iota") // no feature in the target
    ).toDF("id", "text")
    val rows = Dedup.dsirWeights(raw, target, "id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows.keySet == Set(1L, 2L))
    // docA: 2 features, each df_t = 1, df_r = 1 ->
    //   weight = (1+1)*1000000 DIV (1+1) = 1000000; score = 2000000.
    assert(rows(1L) == ((2L, 2000000L)))
    // docB: 2 features, df_t = 0, df_r = 1 ->
    //   weight = 1000000 DIV 2 = 500000; score = 1000000.
    assert(rows(2L) == ((2L, 1000000L)))
  }

  test("a feature shared by many raw docs dilutes: df_raw sits in the denominator") {
    import spark.implicits._
    val target = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    // Three raw docs with the SAME text: each of the 2 features has
    // df_r = 3 -> weight = 2000000 DIV 4 = 500000; score = 1000000 —
    // exactly half of the unshared case above.
    val raw = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta")).toDF("id", "text")
    val rows = Dedup.dsirWeights(raw, target, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(rows == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }
}
