package graft.queries

import graft.SparkSuite

/** The hamming threshold sweep must be the exact cumulative histogram
  * of the banded pair set every hash face shares: nondecreasing in the
  * threshold, internally consistent (cumulative == running sum of the
  * exact counts), and its top row equal to the q_image_phash pair
  * count. The planted brightness twins guarantee mass at low hamming. */
class HammingSweepSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("sweep rows are the exact cumulative pair histogram") {
    val P = PipelineQueries
    val rows = P.hammingSweep(spark, d).collect()
      .map(r => (r.getAs[Long]("threshold"), r.getAs[Long]("n_at_threshold"),
        r.getAs[Long]("n_pairs_le")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to P.PhashMaxHamming).toSeq)
    // cumulative == running sum of exact counts, and nondecreasing
    var run = 0L
    rows.foreach { case (_, nAt, nLe) =>
      run += nAt
      assert(nLe == run)
    }
    // the planted twins put pairs at hamming 0
    assert(rows.head._3 > 0, "twins should collide at hamming 0")
    // the top threshold sees every pair the phash face emits
    val pairCount = P.imagePhash(spark, d).count()
    assert(rows.last._3 == pairCount)
  }
}
