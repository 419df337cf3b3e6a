package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall tripwire for the cross-modal IVF scale path: determinism of
  * both faces is oracle-checked (q_crossmodal_topk / q_crossmodal_ivf);
  * this quantifies what the cell restriction trades against the exact
  * cross-modal scan on the real fixture — and pins that self-exclusion
  * stays OFF (a numeric id collision across modalities is not a
  * self-match). */
class CrossmodalRecallSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def retrieved(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_vec_id", "vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  test("IVF cross-modal recall@k stays above its measured floor") {
    import graft.queries.PipelineQueries
    val exact = retrieved(PipelineQueries.crossmodalTopK(spark, d))
    val ivf = retrieved(PipelineQueries.crossmodalIvf(spark, d))
    assert(exact.keySet == ivf.keySet, "query sets must match")
    val per = exact.map { case (q, ex) =>
      ivf.getOrElse(q, Set.empty).count(ex).toDouble / ex.size
    }
    val r = per.sum / per.size
    info(f"cross-modal recall@${PipelineQueries.CrossModalK} ivf = $r%.3f")
    assert(r >= 0.5, f"ivf cross-modal recall collapsed: $r%.3f")
  }

  test("self-exclusion stays off: an id shared across modalities can be retrieved") {
    // Every ivf result where q_vec_id == vec_id is a text hitting ITS OWN
    // image id — legal cross-modally. With excludeSelf accidentally on,
    // this count is structurally zero.
    import graft.queries.PipelineQueries
    val own = PipelineQueries.crossmodalIvf(spark, d)
      .filter(col("q_vec_id") === col("vec_id"))
      .count()
    assert(own > 0, "fixture must surface own-id cross-modal hits")
  }
}
