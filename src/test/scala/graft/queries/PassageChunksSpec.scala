package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Tiling invariants for the sliding passage chunker. */
class PassageChunksSpec extends SparkSuite {

  test("windows tile every document: contiguous ids, regular starts, exact coverage") {
    val P = TextQueries.PassageLen
    val S = TextQueries.PassageStride
    val rows = TextQueries.passageChunks(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val toksPerDoc = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(TextQueries.BpePattern), lit(0)))
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, ws) =>
      val n = toksPerDoc(doc)
      val ids = ws.map(_.getAs[Long]("window_id")).sorted.toSeq
      // Window ids are 0..W-1 with W = floor((n-1)/S)+1.
      assert(ids == (0L until ((n - 1) / S + 1)), s"doc $doc ids $ids for n=$n")
      ws.foreach { w =>
        val wid = w.getAs[Long]("window_id")
        assert(w.getAs[Long]("start_tok") == wid * S)
        val expectLen = math.min(P.toLong, n - wid * S)
        assert(w.getAs[Long]("n_toks") == expectLen,
          s"doc $doc window $wid has ${w.getAs[Long]("n_toks")} toks, want $expectLen")
      }
    }
    // Token conservation: each position p is covered by exactly
    // |[max(0,ceil((p-P+1)/S)), floor(p/S)]| windows — checked in
    // aggregate: sum of window sizes == sum over positions of coverage.
    val gotMass = rows.map(_.getAs[Long]("n_toks")).sum
    val wantMass = toksPerDoc.values.map { n =>
      (0L until n).map { p =>
        val lo = math.max(0L, (p - P + S) / S)
        val hi = p / S
        hi - lo + 1
      }.sum
    }.sum
    assert(gotMass == wantMass)
  }

  test("passage-level BM25 returns ranked windows that decode to real passages") {
    val d = "/root/testdata/sf0.001"
    val valid = TextQueries.passageChunks(spark, d)
      .select("doc_id", "window_id").collect()
      .map(r => r.getLong(0) * 1000000L + r.getLong(1)).toSet
    val hits = TextQueries.bm25Passages(spark, d).collect()
    assert(hits.nonEmpty)
    hits.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val rnks = rows.map(_.getAs[Long]("rnk")).sorted.toSeq
      assert(rnks == (1L to rnks.size))
    }
    hits.foreach { h =>
      assert(valid(h.getAs[Long]("doc_id")),
        s"retrieved passage ${h.getAs[Long]("doc_id")} does not exist")
    }
  }
}
