package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Laws for the SFT dialogue-pair builder and the FIM transform:
  * the pair count is exactly (events minus one context-less head per
  * conversation), context never exceeds the configured turn budget,
  * and the FIM thirds partition each document without loss. */
class PairsFimSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("dialogue pairs: one context-less head per conversation, budget kept") {
    val ev = Tables.events(spark, d)
      .withColumn("conv_id",
        (unix_millis(col("ts")) / lit(3600000L)).cast("long"))
    val nEvents = ev.count()
    val nConvs = ev.select("conv_id").distinct().count()
    val pairs = EventQueries.dialoguePairs(spark, d).collect()
    assert(pairs.length == nEvents - nConvs)
    assert(pairs.forall { r =>
      val n = r.getAs[Long]("n_context")
      n >= 1 && n <= EventQueries.DialogueContextTurns
    })
  }

  test("dialogue pairs: a 1-context pair digests exactly its predecessor") {
    val rows = EventQueries.dialoguePairs(spark, d)
      .filter(col("n_context") === 1L)
      .limit(1).collect()
    assert(rows.nonEmpty)
    val r = rows.head
    // the single-context digest must be md5 of ONE utterance — find it
    // by recomputing the conversation head's utterance
    val ev = Tables.events(spark, d)
      .withColumn("conv_id",
        (unix_millis(col("ts")) / lit(3600000L)).cast("long"))
      .withColumn("utt", concat(col("event_type"), lit(":"),
        Tables.cents(col("value")).cast("string")))
      .filter(col("conv_id") === r.getAs[Long]("conv_id"))
      .orderBy(col("ts"), col("event_id"))
      .select("utt").collect().map(_.getString(0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("context_md5") == md5hex(ev.head))
  }

  test("SFT pack: mask offsets bracket exactly the response, bins advance monotonically") {
    val rows = EventQueries.sftPack(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("train_to") - r.getAs[Long]("train_from") ==
        r.getAs[Long]("n_resp_tokens"))
      assert(r.getAs[Long]("train_from") - r.getAs[Long]("seq_off") ==
        r.getAs[Long]("n_ctx_tokens"))
      assert(r.getAs[Long]("seq_off") >= 0 &&
        r.getAs[Long]("seq_off") < EventQueries.SftPackBudget)
    }
    // bins never decrease within a conversation (pairs are packed in order)
    rows.groupBy(_.getAs[Long]("conv_id")).foreach { case (_, rs) =>
      val bins = rs.sortBy(_.getAs[Long]("event_id")).map(_.getAs[Long]("bin"))
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    }
    // one pair count law shared with the dialogue builder
    assert(rows.length ==
      EventQueries.dialoguePairs(spark, d).count())
  }

  test("FIM thirds partition every document exactly") {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = TextQueries.fimTransform(spark, d).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val total = r.getAs[Long]("n_prefix") + r.getAs[Long]("n_middle") +
        r.getAs[Long]("n_suffix")
      assert(total == docs(r.getAs[Long]("doc_id")))
    }
  }

  test("FIM digest is the PSM rendering of the exact thirds") {
    val doc = Tables.documents(spark, d)
      .orderBy("doc_id").select("doc_id", "text").limit(1).collect().head
    val text = doc.getString(1)
    val n = text.codePointCount(0, text.length)
    assert(n == text.length, "fixture head doc should be BMP-only here")
    val (a, b) = (n / 3, 2 * n / 3)
    val expected = "<PRE>" + text.substring(0, a) +
      "<SUF>" + text.substring(b) +
      "<MID>" + text.substring(a, b)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = TextQueries.fimTransform(spark, d)
      .filter(col("doc_id") === doc.getLong(0)).collect().head
      .getAs[String]("fim_md5")
    assert(got == md5hex(expected))
  }
}
