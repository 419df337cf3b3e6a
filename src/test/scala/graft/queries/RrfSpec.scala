package graft.queries

import graft.SparkSuite

/** Reciprocal-rank-fusion semantics of the hybrid retrieval query on the
  * real fixture: one-sided candidates, sentinel columns, and the exact
  * rounded-micros arithmetic (recomputed independently here). */
class RrfSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private lazy val rows = TextQueries.hybridRrf(spark, d).collect()

  private def contrib(rank: Long): Long =
    if (rank < 0) 0L
    else math.round(1000000.0 / (TextQueries.RrfK + rank))

  test("every query returns a gapless top-10 ranking") {
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == TextQueries.Bm25QueryFixture.map(_._1).toSet)
    byQ.foreach { case (q, rs) =>
      val rnks = rs.map(_.getLong(1)).sorted.toSeq
      assert(rnks == (1L to rnks.size), s"query $q ranks: $rnks")
      assert(rnks.size == TextQueries.RrfTopK)
    }
  }

  test("the nonsense-terms query is dense-only (lexical sentinel everywhere)") {
    // Query 4's words ("zzzunseen qqqabsent") match no document, so its
    // whole fused list must come from the dense ranker alone.
    val q4 = rows.filter(_.getLong(0) == 4L)
    assert(q4.nonEmpty)
    q4.foreach { r =>
      assert(r.getLong(4) == -1L, s"q4 has a lexical rank: $r")
      assert(r.getLong(5) >= 1L)
    }
  }

  test("fused scores are exactly the sum of the two rounded-micros contributions") {
    rows.foreach { r =>
      val expected = contrib(r.getLong(4)) + contrib(r.getLong(5))
      assert(r.getLong(3) == expected,
        s"rrf_micro mismatch for query ${r.getLong(0)} doc ${r.getLong(2)}: " +
          s"${r.getLong(3)} != $expected")
    }
    // Both systems contribute somewhere (a broken fusion join that
    // never matched a key would make one side's ranks all-sentinel).
    assert(rows.exists(_.getLong(4) >= 1L), "no lexical contribution at all")
    assert(rows.exists(_.getLong(5) >= 1L), "no dense contribution at all")
  }

  test("ranking is by fused score descending with doc-id tie-break") {
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val ok = a.getLong(3) > b.getLong(3) ||
            (a.getLong(3) == b.getLong(3) && a.getLong(2) < b.getLong(2))
          assert(ok, s"order violation: $a then $b")
        case _ => ()
      }
    }
  }
}
