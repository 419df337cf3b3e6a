package graft.similarity

import graft.SparkSuite
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Mutual kNN graph ([[Ivf.mutualKnnEdges]]) and the embedding-space
  * clusters built on it: with full probing the IVF-blocked graph must
  * equal the brute-force mutual-kNN graph exactly (the family's
  * candidate-superset law), hub degree is capped at k by construction,
  * and the CC labels obey the min-id-per-component convention every
  * other cluster face uses. */
class KnnGraphSpec extends SparkSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val centroidIds = (0 until 8).map(_ * 37L)
  private val k = 4

  test("nProbe = K: IVF-blocked mutual graph == brute-force mutual kNN") {
    val blocked = Ivf
      .mutualKnnEdges(emb, centroidIds, nProbe = 8, k = k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val directed = Similarity
      .cosineTopK(emb, emb, k)
      .select("q_vec_id", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val brute = directed
      .filter { case (a, b) => a < b && directed.contains((b, a)) }
    assert(blocked == brute)
    assert(brute.nonEmpty, "fixture must produce mutual edges")
  }

  test("hub degree is capped at k on both endpoints") {
    val edges = Ivf
      .mutualKnnEdges(emb, centroidIds, nProbe = 2, k = k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val degree = edges
      .flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity)
      .map { case (_, v) => v.size }
    assert(degree.nonEmpty && degree.max <= k)
  }

  test("incremental fold == from-scratch graph on corpus ∪ batch") {
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    val batch = emb.filter(col("vec_id") % 9 === 8)
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = edges(
      Ivf.mutualKnnIncremental(corpus, batch, centroidIds, nProbe = 2, k = k))
    val scratch = edges(Ivf.mutualKnnEdges(emb, centroidIds, nProbe = 2, k = k))
    assert(inc == scratch)
  }

  test("chained folds over three deliveries == from-scratch graph") {
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    val batch = emb.filter(col("vec_id") % 9 === 8)
    val idx0 = Ivf.knnIndexArtifacts(corpus, centroidIds, nProbe = 2, k = k)
    val folded = Seq(0, 1, 2)
      .map(r => batch.filter(col("vec_id") % 3 === r))
      .foldLeft(idx0)(Ivf.knnIndexFold)
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(edges(Ivf.mutualGraph(folded)) ==
      edges(Ivf.mutualKnnEdges(emb, centroidIds, nProbe = 2, k = k)))
  }

  test("retraction == from-scratch graph on the survivors; retract ∘ fold == identity") {
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    val batch = emb.filter(col("vec_id") % 9 === 8)
    // Rebuild law: delete a slice from the full index.
    val del = emb.filter(col("vec_id") % 10 === 3).select("vec_id")
    val full = Ivf.knnIndexArtifacts(emb, centroidIds, nProbe = 2, k = k)
    assert(edges(Ivf.mutualGraph(Ivf.knnIndexRetract(full, del))) ==
      edges(Ivf.mutualKnnEdges(
        emb.filter(col("vec_id") % 10 =!= 3), centroidIds, nProbe = 2, k = k)))
    // Inverse law: folding a batch then retracting its ids restores the
    // stored graph exactly.
    val idx0 = Ivf.knnIndexArtifacts(corpus, centroidIds, nProbe = 2, k = k)
    val roundTrip = Ivf.knnIndexRetract(
      Ivf.knnIndexFold(idx0, batch), batch.select("vec_id"))
    assert(edges(Ivf.mutualGraph(roundTrip)) == edges(Ivf.mutualGraph(idx0)))
  }

  test("an empty delivery folds as a no-op") {
    val corpus = emb.filter(col("vec_id") % 9 =!= 8)
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = edges(Ivf.mutualKnnIncremental(
      corpus, emb.filter(lit(false)), centroidIds, nProbe = 2, k = k))
    assert(inc == edges(Ivf.mutualKnnEdges(corpus, centroidIds, nProbe = 2, k = k)))
  }

  test("semantic keep-list keeps exactly one representative per cluster plus isolates") {
    val P = graft.queries.PipelineQueries
    val d = "/root/testdata/sf0.001"
    val kept = P.semanticKeeplist(spark, d).collect().map(_.getLong(0)).toSet
    val comp = P.semanticClusters(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clustered = comp.map(_._1).toSet
    val roots = comp.groupBy(_._2).map { case (_, m) => m.map(_._1).min }.toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == (all -- clustered) ++ roots)
  }

  test("graph stats conserve edge and vector mass") {
    val P = graft.queries.PipelineQueries
    val d = "/root/testdata/sf0.001"
    val rows = P.graphStats(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val deg = rows.filter(_._1 == "degree")
    val cs = rows.filter(_._1 == "component_size")
    val edges = P.knnGraph(spark, d).count()
    // Handshake: sum of k·n over the degree histogram == 2·|edges|.
    assert(deg.map(r => r._2 * r._3).sum == 2 * edges)
    // Component sizes cover exactly the clustered vectors.
    val clustered = P.semanticClusters(spark, d).count()
    assert(cs.map(r => r._2 * r._3).sum == clustered)
    assert(cs.forall(_._2 >= 2), "a component needs at least one edge")
  }

  test("quality keeper elects the best-quality member of every cluster") {
    val P = graft.queries.PipelineQueries
    val d = "/root/testdata/sf0.001"
    val rows = P.semanticQualityKeeplist(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, members) =>
      val keeper = members.map(m => (-m._3, m._1)).min._2
      assert(members.forall(_._4 == keeper), "keeper column inconsistent")
      members.foreach(m => assert(m._5 == (m._1 == keeper)))
    }
  }

  test("pagerank: isolated vectors hold exactly the teleport mass, hubs more") {
    val P = graft.queries.PipelineQueries
    val d = "/root/testdata/sf0.001"
    val ranks = P.graphPagerank(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val connected = Ivf
      .mutualKnnEdges(emb, centroidIds, nProbe = 2, k = k)
      .select(explode(array(col("id_a"), col("id_b"))).as("v"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ranks.size == emb.count())
    // every rank carries at least the teleport mass
    assert(ranks.values.forall(_ >= P.PagerankTeleportMicros))
    // an isolated vector holds EXACTLY the teleport mass
    val isolated = ranks.keySet -- connected
    assert(isolated.nonEmpty, "fixture should have isolated vectors")
    isolated.foreach(v =>
      assert(ranks(v) == P.PagerankTeleportMicros, s"isolated $v drifted"))
    // connectivity moves mass: some connected vector outranks teleport
    assert(connected.exists(v => ranks(v) > P.PagerankTeleportMicros))
  }

  test("pagerank keeper elects the highest-rank member of every cluster") {
    val P = graft.queries.PipelineQueries
    val rows = P.pagerankKeeplist(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, members) =>
      val keeper = members.map(m => (-m._3, m._1)).min._2
      assert(members.forall(_._4 == keeper), "keeper column inconsistent")
      members.foreach(m => assert(m._5 == (m._1 == keeper)))
    }
    // exactly one keeper per component; isolates keep themselves
    val keptPerComp = rows.groupBy(_._2).map { case (_, ms) => ms.count(_._5) }
    assert(keptPerComp.forall(_ == 1))
  }

  test("graph drift: readout arithmetic is exact and mass-consistent") {
    val P = graft.queries.PipelineQueries
    val rows = P.graphDrift(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("k") >= 1 && r.getAs[Long]("k") <= k)
      assert(r.getAs[Long]("delta_micros") ==
        math.abs(r.getAs[Long]("cur_frac_micros") -
          r.getAs[Long]("base_frac_micros")))
    }
    // truncating fracs sum to at most 1e6 and within k of it
    Seq("base_frac_micros", "cur_frac_micros").foreach { c =>
      val s = rows.map(_.getAs[Long](c)).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"$c sums to $s")
    }
  }

  test("cluster labels are the component minimum and cover every edge endpoint") {
    val edges = Ivf
      .mutualKnnEdges(emb, centroidIds, nProbe = 2, k = k)
      .select("id_a", "id_b")
      .localCheckpoint(true)
    val comp = Dedup.connectedComponents(edges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    edges.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(comp(a) == comp(b), s"edge ($a, $b) split across components")
    }
    comp.groupBy(_._2).foreach { case (label, members) =>
      assert(label == members.keys.min,
        s"component $label is not its members' min id")
    }
  }
}
