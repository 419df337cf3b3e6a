package graft.similarity

import graft.SparkSuite

/** Pins the distributed integer-Lloyd's plan against a driver-side
  * reference implementation over the (bounded, sf0.001) embeddings —
  * the same role the DuckDB oracle plays at sf0.01, but engine-internal
  * and run on every `sbt test`. */
class LloydIntSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val ids = graft.queries.PipelineQueries.IvfCentroidIds
  private val iters = 3

  private def truncDiv(s: Long, n: Long): Long = s / n // JVM / truncates

  test("lloydInt matches the reference Lloyd's on sf0.001") {
    val emb = graft.queries.Tables.embeddings(spark, dir)
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val q: Map[Long, Array[Long]] = rows.map { case (vid, e) =>
      vid -> e.map(x =>
        BigDecimal(x.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }.toMap
    var cent: Map[Long, Array[Long]] = ids.sorted.zipWithIndex
      .map { case (vid, c) => c.toLong -> q(vid).clone() }.toMap
    var asg: Map[Long, Long] = Map.empty
    for (_ <- 1 to iters) {
      asg = q.map { case (vid, qe) =>
        val best = cent.toSeq
          .map { case (c, ce) =>
            (qe.zip(ce).map { case (a, b) => (a - b) * (a - b) }.sum, c)
          }
          .min
        vid -> best._2
      }
      cent = cent.map { case (c, old) =>
        val members = asg.collect { case (vid, cc) if cc == c => q(vid) }.toSeq
        if (members.isEmpty) c -> old
        else {
          val n = members.size.toLong
          c -> old.indices.map(i => truncDiv(members.map(_(i)).sum, n)).toArray
        }
      }
    }
    val expect = cent.keys.toSeq.sorted.map { c =>
      val mem = asg.collect { case (vid, cc) if cc == c => vid }.toSeq
      (c, mem.size.toLong, mem.sum, cent(c).sum)
    }
    val got = Ivf.lloydInt(emb, ids, iters)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
  }
}
