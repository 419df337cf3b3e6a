package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Data-selection operators: token-budget greedy selection and the
  * epoch-schedule mix materialization. */
class SelectionSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("budget select keeps exactly the quality-descending prefix") {
    val rows = PipelineQueries.budgetSelect(spark, d).collect()
    val kept = rows.filter(_.getAs[Boolean]("keep"))
    val dropped = rows.filterNot(_.getAs[Boolean]("keep"))
    assert(kept.nonEmpty && dropped.nonEmpty,
      "the in-plan half-corpus budget must bite on the fixture")
    // Selection order is (quality desc, doc_id asc): every kept doc must
    // precede every dropped doc in that order — keeps form a prefix.
    def key(r: org.apache.spark.sql.Row) =
      (-math.round(r.getAs[Double]("quality") * 1e6), r.getAs[Long]("doc_id"))
    val worstKept = kept.map(key).max
    val bestDropped = dropped.map(key).min
    assert(worstKept._1 < bestDropped._1 ||
      (worstKept._1 == bestDropped._1 && worstKept._2 < bestDropped._2),
      s"kept set is not a prefix: worst kept $worstKept vs best dropped $bestDropped")
    // The budget rule: a doc is kept iff the tokens BEFORE it are under
    // the half-corpus budget — so kept token mass reaches the budget and
    // stops within one document of it.
    val budget = rows.map(_.getAs[Long]("n_tokens")).sum / 2
    val keptTokens = kept.map(_.getAs[Long]("n_tokens")).sum
    val maxKeptDoc = kept.map(_.getAs[Long]("n_tokens")).max
    assert(keptTokens >= budget && keptTokens < budget + maxKeptDoc)
  }

  test("mix select keeps a per-source quality prefix under the mix-weighted budget") {
    val rows = PipelineQueries.mixSelect(spark, d).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.size > 1)
    var anyDropped = false
    bySource.foreach { case (src, rs) =>
      val kept = rs.filter(_.getAs[Boolean]("keep"))
      val dropped = rs.filterNot(_.getAs[Boolean]("keep"))
      if (dropped.nonEmpty) anyDropped = true
      // Within a source, keeps form the (quality desc, doc_id) prefix.
      if (kept.nonEmpty && dropped.nonEmpty) {
        def key(r: org.apache.spark.sql.Row) =
          (-math.round(r.getAs[Double]("quality") * 1e6),
            r.getAs[Long]("doc_id"))
        assert(Ordering[(Long, Long)].lt(kept.map(key).max, dropped.map(key).min),
          s"$src: kept set is not a quality prefix")
      }
      // Budget rule: kept token mass reaches the source's target and
      // overshoots by at most one document.
      val target = rs.head.getAs[Long]("target_tokens")
      val keptTokens = kept.map(_.getAs[Long]("n_tokens")).sum
      if (kept.nonEmpty) {
        val maxKept = kept.map(_.getAs[Long]("n_tokens")).max
        assert(keptTokens < target + maxKept, s"$src overshoots its budget")
      }
      if (dropped.nonEmpty)
        assert(keptTokens >= target, s"$src stopped before its budget with docs left")
    }
    assert(anyDropped, "the half-corpus mix budget must bite somewhere")
  }

  test("epoch schedule: integer epochs plus a deterministic fractional remainder") {
    val rows = TextQueries.epochSchedule(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getAs[Long]("u_micros")
      val nDocs = r.getAs[Long]("n_docs")
      val nEmitted = r.getAs[Long]("n_emitted")
      val nExtra = r.getAs[Long]("n_extra")
      assert(nExtra >= 0 && nExtra <= nDocs)
      assert(nEmitted == nDocs * (u / 1000000L) + nExtra,
        s"emitted copies must decompose into base epochs + extras for ${r.getString(0)}")
      // The realized factor tracks the target within the granularity the
      // hash residue can express (one doc of slack per source).
      val target = nDocs.toDouble * u / 1e6
      assert(math.abs(nEmitted - target) <= nDocs.toDouble,
        s"realized ${nEmitted} vs target $target for ${r.getString(0)}")
    }
    // The fixture must exercise genuine fractional epochs: at least one
    // source with 0 < n_extra < n_docs.
    assert(rows.exists { r =>
      val e = r.getAs[Long]("n_extra"); e > 0 && e < r.getAs[Long]("n_docs")
    }, "no source has a strictly fractional epoch — the operator's point")
    // Determinism: a second run is identical.
    val again = TextQueries.epochSchedule(spark, d).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
