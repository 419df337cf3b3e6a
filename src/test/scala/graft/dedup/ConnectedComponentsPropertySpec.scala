package graft.dedup

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Randomized equivalence for [[Dedup.connectedComponents]] — the
  * operator under three declared queries (dup clusters, keep-list,
  * leakage-safe split). Random graphs (including self-loops, duplicate
  * and reversed edges, null endpoints) are labeled by BOTH distributed
  * paths — the gated driver union-find fast path and the label-prop
  * loop — and each must match a trivially-correct local union-find
  * oracle exactly: every non-null node labeled with its component's
  * min id, null-endpoint edges contributing nothing. */
class ConnectedComponentsPropertySpec extends SparkSuite {

  /** Plain local union-find with path compression — the oracle. */
  private def localComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // Two passes: roots settle first, then every node maps to root min.
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min
      ns.map(_ -> m)
    }.toMap
  }

  private val genEdges: Gen[List[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 40)
    nEdges <- Gen.choose(1, 80)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong - 1)
      b <- Gen.choose(0L, nNodes.toLong - 1) // self-loops allowed
    } yield (a, b))
  } yield edges

  private def check(spark: org.apache.spark.sql.SparkSession,
      edges: List[(Long, Long)], nullEvery: Int): Prop = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Poison every nullEvery-th edge with a null endpoint: these must be
    // ignored by both paths (null joins nothing / matches nothing).
    val df = edges.zipWithIndex.map { case ((a, b), i) =>
      if (nullEvery > 0 && i % nullEvery == 0)
        (if (i % (2 * nullEvery) == 0) None else Some(a),
          if (i % (2 * nullEvery) == 0) Some(b) else None)
      else (Some(a), Some(b))
    }.toDF("id_a", "id_b")
    val realEdges = edges.zipWithIndex
      .filterNot { case (_, i) => nullEvery > 0 && i % nullEvery == 0 }
      .map(_._1)
    val expected =
      if (realEdges.isEmpty) Map.empty[Long, Long]
      else localComponents(realEdges)
    // Drive both distributed paths via the edge gate: the default gate
    // takes the driver union-find fast path at this size, a zero gate
    // forces the label-propagation loop.
    val got = Seq(Long.MaxValue, 0L).map { gate =>
      Dedup.connectedComponents(df, driverEdgeLimit = gate)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    if (got.forall(_ == expected)) Prop.passed
    else Prop.falsified :| s"edges=$edges nullEvery=$nullEvery " +
      s"uf=${got.head} lp=${got(1)} oracle=$expected"
  }

  test("both CC paths equal a local union-find oracle on random graphs") {
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(25)
        .withInitialSeed(org.scalacheck.rng.Seed(6L)),
      Prop.forAll(genEdges, Gen.oneOf(0, 3, 5)) { (edges, nullEvery) =>
        check(spark, edges, nullEvery)
      })
    assert(res.passed, res.status.toString)
  }
}
