package graft.queries

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property laws of the fixed-point PageRank recurrence over random
  * graphs: every vertex holds at least the teleport mass, isolated
  * vertices hold exactly it, and total mass stays bounded by |V|·1e6
  * (Σ contrib·deg ≤ Σ rank each step; truncation only loses mass). */
class PagerankPropertySpec extends SparkSuite {

  private val caseGen: Gen[(Int, Seq[(Long, Long)])] = for {
    n <- Gen.chooseNum(2, 12)
    m <- Gen.chooseNum(0, 16)
    edges <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0, n - 1)
      b <- Gen.chooseNum(0, n - 1)
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
  } yield (n, edges.filter(e => e._1 != e._2).distinct)

  test("teleport floor, isolated exactness, bounded total mass") {
    import spark.implicits._
    val P = PipelineQueries
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(15)
        .withInitialSeed(org.scalacheck.rng.Seed(13L)),
      Prop.forAll(caseGen) { case (nV, edges) =>
        val verts = (0L until nV.toLong).toDF("v")
        val ranks = P
          .pagerankOverEdges(edges.toDF("id_a", "id_b"), verts)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val connected = edges.flatMap(e => Seq(e._1, e._2)).toSet
        val floorOk =
          ranks.values.forall(_ >= P.PagerankTeleportMicros)
        val isolatedOk = (ranks.keySet -- connected)
          .forall(v => ranks(v) == P.PagerankTeleportMicros)
        val massOk = ranks.values.sum <= nV.toLong * 1000000L
        if (ranks.size == nV && floorOk && isolatedOk && massOk) Prop.passed
        else Prop.falsified :| s"n=$nV edges=$edges ranks=$ranks"
      })
    assert(res.passed, res.status.toString)
  }
}
