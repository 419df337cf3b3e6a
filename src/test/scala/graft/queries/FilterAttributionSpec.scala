package graft.queries

import graft.SparkSuite

/** Invariants of the filter-attribution readout, plus a synthetic corpus
  * where the unique-fail accounting is known exactly. */
class FilterAttributionSpec extends SparkSuite {

  test("attribution invariants hold on the real fixture") {
    val rows = PipelineQueries
      .filterAttribution(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 8)
    val nDocs = rows.head.getLong(3)
    rows.foreach { r =>
      val (fail, unique) = (r.getLong(1), r.getLong(2))
      assert(unique <= fail, s"${r.getString(0)}: unique $unique > fail $fail")
      assert(fail <= nDocs)
    }
    // Unique-failure sets are disjoint by definition (a doc failing only
    // rule A cannot also fail only rule B), so their sum is bounded by
    // the doc count.
    assert(rows.map(_.getLong(2)).sum <= nDocs)
  }

  test("a doc failing exactly one rule lands in that rule's unique count") {
    import spark.implicits._
    // goodText passes everything; the bullet doc fails ONLY the bullet
    // rule (plenty of words, stopwords and letters on every line).
    val good = (("the data and that of a pipeline have run with care " * 6).trim)
    val bulletLine = "- the data and that of a pipeline have run with care"
    val allBullets = Seq.fill(10)(bulletLine).mkString("\n")
    val docs = Seq((1L, good), (2L, allBullets)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("attr_docs")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = PipelineQueries.filterAttribution(spark, tmp.toString)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows("r_bullet") == ((1L, 1L)), s"got ${rows("r_bullet")}")
    // Every other rule: zero failures.
    (rows - "r_bullet").foreach { case (rule, (f, _)) =>
      assert(f == 0L, s"$rule unexpectedly failed $f docs")
    }
  }
}
