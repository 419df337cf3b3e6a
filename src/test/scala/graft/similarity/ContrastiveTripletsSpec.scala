package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Triplet-mining semantics on the real embeddings table. */
class ContrastiveTripletsSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val centroidIds = (0 until 8).map(_ * 37L)

  private lazy val labelOf: Map[Long, Int] =
    emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("roles respect labels: pos matches the anchor, negs differ") {
    val rows = Ivf.contrastiveTriplets(emb, centroidIds,
      iters = 2, nProbe = 2, kNeg = 3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val anchor = labelOf(r.getLong(0))
      val isPos = r.getString(1) == "pos"
      if (isPos) {
        assert(r.getInt(4) == anchor, s"pos with wrong label: $r")
        assert(r.getLong(2) == 1L, s"pos must be rank 1: $r")
      } else assert(r.getInt(4) != anchor, s"neg with anchor label: $r")
      assert(r.getLong(3) != r.getLong(0), s"self-pair leaked: $r")
    }
    // Per anchor: at most one positive, at most kNeg negatives with
    // gapless ranks.
    rows.groupBy(_.getLong(0)).foreach { case (a, rs) =>
      val pos = rs.filter(_.getString(1) == "pos")
      assert(pos.length <= 1, s"anchor $a has ${pos.length} positives")
      val negRnks = rs.filter(_.getString(1) == "neg")
        .map(_.getLong(2)).sorted.toSeq
      assert(negRnks == (1L to negRnks.size) && negRnks.size <= 3)
    }
  }

  test("probing ALL cells reproduces the exact same-label top-1 and cross-label top-k") {
    val got = Ivf.contrastiveTriplets(emb, centroidIds,
      iters = 3, nProbe = 8, kNeg = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // Exact positives: brute-force nearest same-label neighbor.
    val exactNeg = Similarity.hardNegatives(emb, emb, k = 3)
      .collect()
      .map(r => (r.getLong(0), "neg", r.getLong(1)) -> r.getLong(2))
      .toMap
    val negGot = got.filter(_._1._2 == "neg")
    assert(negGot == exactNeg)
    // Exact positives via a brute-force same-label scan on the driver
    // (500 vectors — fine in a spec).
    val vecs = emb.selectExpr("vec_id", "label",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val exactPos = vecs.map { case (id, lbl, e) =>
      val best = vecs
        .filter { case (oid, olbl, _) => oid != id && olbl == lbl }
        .map { case (oid, _, oe) => (cos(e, oe), oid) }
        .sortBy { case (s, oid) => (-s, oid) }
        .headOption
      id -> best.map(_._2)
    }.toMap
    val posGot = got.collect { case ((a, "pos", 1L), v) => a -> v }
    exactPos.foreach { case (a, expect) =>
      expect match {
        case Some(v) =>
          assert(posGot.get(a).contains(v),
            s"anchor $a: pos ${posGot.get(a)} != exact $v")
        case None =>
          assert(!posGot.contains(a), s"anchor $a has no same-label mate")
      }
    }
  }
}
