package graft.textanalysis

import graft.SparkSuite
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Randomized equivalence of the two BPE encode paths over random VALID
  * (training-consistent, duplicate-free) merge tables — proving the
  * equivalence CLASS, not just the two frozen fixture tables BpeSpec
  * pins. For every generated table and token set, three computations
  * must agree exactly:
  *
  *   1. the codegen expression fold ([[Bpe.encodeExpr]] +
  *      [[Bpe.subwordCount]]) — evaluated at EVERY table size here,
  *      including past [[Bpe.ExprMergeLimit]] where production would
  *      not choose it;
  *   2. the broadcast-ranks priority encoder ([[Bpe.encodeLocal]]),
  *      driver-evaluated as the oracle;
  *   3. the deployed dispatcher ([[Bpe.subwordCountsForTypes]]), which
  *      picks path 1 or the mapPartitions form of path 2 by table size.
  *
  * Tables are generated the way training produces them: each merge's
  * inputs are single alphabet chars or outputs of earlier merges (so
  * [[Bpe.isTrainingConsistent]] holds by construction), pairs are
  * unique, and duplicate OUTPUT strings (e.g. "abc" via (ab,c) and
  * (a,bc)) are allowed — the ambiguity the scaladoc's rank-ordering
  * argument must survive. Tokens include the separator char (stripped
  * identically on both paths), empty strings, out-of-alphabet chars,
  * and a null (null in → null count out on every path). */
class BpePropertySpec extends SparkSuite {

  private val Alphabet = Vector("a", "b", "c")

  /** Training-shaped random table: grow an available-symbol pool from
    * the alphabet, each merge drawing both inputs from the pool. */
  private def genTable(target: Int): Gen[Vector[(String, String)]] = {
    def step(
        acc: Vector[(String, String)],
        avail: Vector[String],
        used: Set[(String, String)]): Gen[Vector[(String, String)]] =
      if (acc.size >= target) Gen.const(acc)
      else
        for {
          a <- Gen.oneOf(avail)
          b <- Gen.oneOf(avail)
          next <-
            if (used((a, b))) step(acc, avail, used) // re-draw collisions
            else {
              val out = a + b
              step(
                acc :+ (a -> b),
                if (avail.contains(out)) avail else avail :+ out,
                used + ((a, b)))
            }
        } yield next
    step(Vector.empty, Alphabet, Set.empty)
  }

  // Balanced across the dispatcher's branch point: half the runs land
  // on the expression path (≤ ExprMergeLimit), half on mapPartitions.
  private val genSize: Gen[Int] = Gen.oneOf(
    Gen.choose(1, Bpe.ExprMergeLimit),
    Gen.choose(Bpe.ExprMergeLimit + 1, Bpe.ExprMergeLimit + 16))

  private val genTokens: Gen[List[String]] =
    Gen.listOfN(
      12,
      Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd', '\u001f'))
        .map(_.mkString)).map(ts => (ts :+ "").distinct)

  private def check(
      merges: Vector[(String, String)], tokens: List[String]): Prop = {
    require(Bpe.isTrainingConsistent(merges))
    import spark.implicits._
    val idx = merges.toIndexedSeq
    val ranks = idx.zipWithIndex.toMap
    val toks: List[String] = null :: tokens
    val expected: Map[String, Option[Long]] = toks.map { t =>
      t -> (if (t == null) None
            else Some(Bpe.encodeLocal(t, idx, ranks).length.toLong))
    }.toMap
    val df = toks.toDF("tok")
    def collectMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map { r =>
        r.getAs[String]("tok") ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))
      }.toMap
    val viaExpr = collectMap(
      df.select(col("tok"),
        Bpe.subwordCount(Bpe.encodeExpr(col("tok"), merges)).as("n_sub"))
        .collect())
    val viaDispatch = collectMap(
      Bpe.subwordCountsForTypes(df, "tok", merges).collect())
    if (viaExpr == expected && viaDispatch == expected) Prop.passed
    else Prop.falsified :| s"merges=$merges tokens=$toks " +
      s"expr=$viaExpr dispatch=$viaDispatch oracle=$expected"
  }

  test("expr fold, priority encoder and dispatcher agree on random valid tables") {
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(20)
        .withInitialSeed(org.scalacheck.rng.Seed(17L)),
      Prop.forAll(genSize.flatMap(genTable), genTokens) { (merges, toks) =>
        check(merges, toks)
      })
    assert(res.passed, res.status.toString)
  }
}
