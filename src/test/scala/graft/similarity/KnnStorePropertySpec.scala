package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property law of the table-backed kNN store over RANDOM geometry and
  * RANDOM fold/retract interleavings — KnnStoreSpec's fixed scenarios
  * generalized: for any random vector set, any pool split and any two
  * takedown masks (the second deliberately allowed to re-delete already
  * tombstoned ids — content replays must no-op), the store's chain
  *
  *   deploy ∘ fold(s1) ∘ retract(d1) ∘ fold(s2) ∘ retract(d2)
  *
  * reads back (a) the from-scratch [[Ivf.mutualKnnEdges]] of the
  * SURVIVORS and (b) the in-memory [[Ivf.knnIndexFold]] /
  * [[Ivf.knnIndexRetract]] twin chain, edge for edge. Small dense
  * vector sets force heavy cell sharing, so the re-score path (the
  * merge law's non-invertible inverse) is exercised where candidates
  * genuinely get ADMITTED from below the old top-k. */
class KnnStorePropertySpec extends SparkSuite {

  private val Dims = 6
  private val NVec = 30
  private val NCorpus = 18 // ids 0..17 deploy; 18..29 arrive in two slices
  private val centroidIds = Seq(0L, 5L, 11L)
  private val k = 3

  private def vecGen: Gen[List[Array[Float]]] =
    Gen.listOfN(NVec,
      Gen.listOfN(Dims, Gen.chooseNum(1, 999))
        .map(_.map(v => v / 1000.0f + 0.05f).toArray))

  private def maskGen(ids: Seq[Long]): Gen[List[Long]] =
    Gen.listOfN(ids.size, Gen.oneOf(true, false))
      .map(m => ids.zip(m).collect { case (id, true) => id }.toList)

  private def df(rows: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding").localCheckpoint(true)
  }

  private def edges(d: DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("random fold/retract interleavings read back the survivors' from-scratch graph and the in-memory twin") {
    import spark.implicits._
    val gen = for {
      vs <- vecGen
      split <- Gen.chooseNum(NCorpus + 2, NVec - 2)
      d1 <- maskGen((0L until split.toLong)
        .filterNot(centroidIds.contains))
      d2 <- maskGen((0L until NVec.toLong)
        .filterNot(centroidIds.contains))
    } yield (vs, split, d1, d2)
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(3)
        .withInitialSeed(org.scalacheck.rng.Seed(33L)),
      Prop.forAll(gen) { case (vs, split, d1, d2) =>
        val all = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        val corpus = df(all.take(NCorpus))
        val s1 = df(all.slice(NCorpus, split))
        val s2 = df(all.drop(split))
        val d1f = d1.toDF("vec_id").localCheckpoint(true)
        val d2f = d2.toDF("vec_id").localCheckpoint(true)
        val store = new KnnStore(
          spark,
          java.nio.file.Files
            .createTempDirectory("graft_knn_prop_").toString,
          nProbe = 2, k = k)
          .deploy(corpus, centroidIds)
        store.foldBatch(s1, 0L)
        store.retractBatch(d1f, 1L)
        store.foldBatch(s2, 2L)
        store.retractBatch(d2f, 3L)
        val deleted = (d1 ++ d2).toSet
        val survivors = df(all.filterNot { case (id, _) =>
          deleted.contains(id) })
        val scratch = edges(
          Ivf.mutualKnnEdges(survivors, centroidIds, nProbe = 2, k = k))
        val twin = Ivf.knnIndexRetract(
          Ivf.knnIndexFold(
            Ivf.knnIndexRetract(
              Ivf.knnIndexFold(
                Ivf.knnIndexArtifacts(corpus, centroidIds,
                  nProbe = 2, k = k),
                s1),
              d1f),
            s2),
          d2f)
        val got = edges(store.mutualGraph)
        val gotDirected = edges(store.directedEdges)
        val twinDirected =
          edges(twin.edges.select("q_vec_id", "vec_id", "score"))
        if (got == scratch && gotDirected == twinDirected) Prop.passed
        else Prop.falsified :| {
          val mg = (got -- scratch).take(3)
          val ms = (scratch -- got).take(3)
          s"split=$split d1=$d1 d2=$d2 store-only=$mg scratch-only=$ms " +
            s"directed==twin: ${gotDirected == twinDirected}"
        }
      })
    assert(res.passed, res.status.toString)
  }
}
