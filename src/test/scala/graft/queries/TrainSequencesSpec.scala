package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[TextQueries.trainSequencesDocs]] beyond the oracle fixture: the
  * offset prefix-sum's bucket width adapts to the OBSERVED id range, so
  * the plan must stay bounded-stitch for dense ids AND sparse hashed
  * ids (including negative Longs — the xxhash64 id shape a production
  * pipeline actually has). Equality reference: the straightforward
  * lang-window formulation, correct at test scale. */
class TrainSequencesSpec extends SparkSuite {

  private def refTrainSequences(
      docs: org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.expressions.Window
    val s = docs.sparkSession
    import s.implicits._
    val tok = docs.select(
      col("doc_id"), col("lang"),
      posexplode_outer(regexp_extract_all(
        col("text"), lit(TextQueries.BpePattern), lit(0))).as(Seq("pos", "tok")))
    val nDoc = tok.groupBy("doc_id", "lang").agg(count(col("tok")).as("n"))
    val realTok = tok.filter(col("tok").isNotNull)
    val top = realTok.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(TextQueries.VocabSize).collect()
    val vocab = top.zipWithIndex
      .map { case (r, i) => (r.getAs[String]("tok"), i.toLong) }
      .toSeq.toDF("tok", "tid")
    val ids = realTok.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("tid"), lit(-1L)).as("tid"))
    val eos = nDoc.select(
      col("doc_id"), col("n").as("pos"), lit(TextQueries.EosId).as("tid"))
    val offs = nDoc.withColumn(
      "off",
      coalesce(
        sum(col("n") + 1L).over(
          Window.partitionBy("lang").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    ids.unionByName(eos)
      .join(offs.select("doc_id", "lang", "off"), Seq("doc_id"))
      .withColumn("gpos", col("off") + col("pos"))
      .withColumn("seq_id", expr(s"gpos div ${TextQueries.TrainSeqLen}"))
      .groupBy("lang", "seq_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === TextQueries.EosId, 1L).otherwise(0L))
          .as("n_doc_ends"),
        sum(col("tid") * (expr(s"gpos % ${TextQueries.TrainSeqLen}") + lit(1L)))
          .as("checksum"))
      .orderBy("lang", "seq_id")
      .collect()
  }

  test("sparse hashed ids (negative Longs, full 64-bit spread) equal the window reference") {
    import spark.implicits._
    // Ids spread across the whole signed-Long range, like xxhash64
    // output: the fixed-divisor bucketing this replaced would have put
    // every doc in its own bucket; the adaptive width must both stay
    // bounded AND preserve the signed (lang, doc_id) fold order.
    val base = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    val hashed = base.withColumn(
      "doc_id", xxhash64(col("doc_id").cast("string")))
    assert(hashed.agg(min("doc_id")).head().getLong(0) < 0L,
      "fixture must actually contain negative hashed ids")
    val got = TextQueries.trainSequencesDocs(spark, hashed).collect()
    val ref = refTrainSequences(hashed)
    assert(got.nonEmpty)
    assert(got.map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq)
  }

  test("dense ids equal the window reference (fixture shape)") {
    val base = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    val got = TextQueries.trainSequencesDocs(spark, base).collect()
    val ref = refTrainSequences(base)
    assert(got.nonEmpty)
    assert(got.map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq)
  }
}
