package graft.queries

import graft.SparkSuite

/** LSH band-planner ([[PipelineQueries.lshPlanner]]): the fixed-point
  * S-curve must be monotone in jaccard within every config, collapse to
  * its boundary identities at the single-band / single-row configs, and
  * mark exactly the deployed banding. */
class LshPlannerSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private lazy val rows = PipelineQueries.lshPlanner(spark, d).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))

  test("flag probability is monotone in jaccard within every config") {
    rows.groupBy(_._1).foreach { case (_, cfg) =>
      val curve = cfg.sortBy(_._3).map(_._6)
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b })
    }
  }

  test("boundary configs collapse to their identities") {
    // bands = 1: flagging needs the ONE band to match — flag == t^H.
    rows.filter(_._1 == 1L).foreach { r =>
      assert(r._6 == r._5, "single band: flag prob must equal band match")
    }
    // rows_per_band = 1: a band matches iff the single hash does —
    // band match == t itself.
    val h = PipelineQueries.MinhashHashes.toLong
    rows.filter(_._2 == 1L).foreach { r =>
      val tm = math.round(r._3 * 1000000L).toLong
      assert(r._5 == tm, "single-row band: band match must equal jaccard")
      assert(r._1 == h)
    }
  }

  test("exactly the deployed banding is marked") {
    val deployed = rows.filter(_._8).map(_._1).distinct
    assert(deployed.toSeq == Seq(PipelineQueries.MinhashBands.toLong))
  }
}
