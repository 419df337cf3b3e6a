package graft.queries

import graft.SparkSuite

/** Tokenizer-health drift ([[TextQueries.fertilityDrift]]): the split
  * must conserve the whole-corpus token/subword mass the fertility
  * query measures — corpus + batch sides per language add back to
  * q_token_fertility's totals, and the fixture exercises both sides. */
class FertilityDriftSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("corpus + batch token mass == the whole-corpus fertility totals per lang") {
    val drift = TextQueries.fertilityDrift(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val whole = TextQueries.tokenFertility(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(drift.keySet == whole.keySet)
    drift.foreach { case (lang, (c, b)) =>
      assert(c + b == whole(lang), s"token mass not conserved for $lang")
    }
    assert(drift.values.exists(_._2 > 0), "fixture batch side is empty")
    assert(drift.values.forall(_._1 > 0), "fixture corpus side is empty")
  }
}
