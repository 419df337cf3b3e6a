package graft.queries

import graft.SparkSuite

/** BM25 invariants on the real documents table (exact values are gated by
  * the q_bm25 DuckDB oracle; this guards the scorer's shape). */
class Bm25Spec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("scores are positive, descending, with ties broken by doc_id") {
    val rows = TextQueries.bm25(spark, d).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(r => (r.getLong(1), r.getLong(0)))
    scores.foreach { case (s, _) => assert(s > 0L) }
    val resorted = scores.sortBy { case (s, id) => (-s, id) }.toSeq
    assert(scores.toSeq == resorted)
  }

  test("every returned doc matched at least one and at most |Q| terms") {
    val rows = TextQueries.bm25(spark, d).collect()
    rows.foreach { r =>
      val n = r.getLong(2)
      assert(n >= 1L && n <= TextQueries.BM25Terms.size.toLong)
    }
  }
}
