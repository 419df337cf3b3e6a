package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Behavioral invariants for the round-7 training-mix surface:
  * temperature mixing weights and length-grouped batching. The DuckDB
  * oracle pins exact values; these pin the PROPERTIES the operators exist
  * for (temperature compresses the domain distribution; batches tile the
  * sorted length axis with exact waste accounting). */
class MixBatchSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("mix weights normalize to 1 and upweight small domains (α = 1/2)") {
    val rows = SparkEntry.queries("q_mix_weights")(spark, d).collect()
    assert(rows.length > 1, "need at least two domains to mix")
    val w = rows.map(_.getAs[Double]("weight"))
    // Rounded micros-over-total: sums to 1 within per-domain rounding.
    assert(math.abs(w.sum - 1.0) < 1e-4 * rows.length)
    // The whole point of temperature < 1: relative to raw token share,
    // the smallest domain gains probability mass, the largest loses it.
    val toks = rows.map(_.getAs[Long]("n_tokens").toDouble)
    val raw = toks.map(_ / toks.sum)
    val iMin = toks.indexOf(toks.min)
    val iMax = toks.indexOf(toks.max)
    assert(toks(iMin) < toks(iMax), "degenerate fixture: equal domains")
    assert(w(iMin) > raw(iMin),
      s"smallest domain not upweighted: w=${w(iMin)} raw=${raw(iMin)}")
    assert(w(iMax) < raw(iMax),
      s"largest domain not downweighted: w=${w(iMax)} raw=${raw(iMax)}")
  }

  test("length batches tile the sorted length axis with exact waste accounting") {
    val rows = SparkEntry.queries("q_length_batches")(spark, d).collect()
    val nDocs = Tables.documents(spark, d).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // Every batch is full except possibly the last (rank is a total
    // order, so batch sizes are deterministic).
    rows.init.foreach { r =>
      assert(r.getAs[Long]("n_docs") == TextQueries.LengthBatchSize)
    }
    // Consecutive batches cover non-overlapping, ordered length ranges —
    // the property that makes padding small.
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_len") <= b.getAs[Long]("min_len"),
          s"batch ${a.getAs[Long]("batch_id")} overlaps its successor")
      case _ =>
    }
    rows.foreach { r =>
      val waste = r.getAs[Long]("n_docs") * r.getAs[Long]("max_len") -
        r.getAs[Long]("sum_len")
      assert(r.getAs[Long]("pad_waste") == waste)
      assert(waste >= 0L)
      val fill = r.getAs[Long]("fill_micros")
      assert(fill >= 0L && fill <= 1000000L)
    }
  }
}
