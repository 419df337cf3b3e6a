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

  test("interleaved pack with no images degenerates to trainSequences exactly") {
    // The contract that makes interleavedPack the multimodal face of
    // the SAME packer: an empty image stream yields trainSequences'
    // layout verbatim (shared columns equal row-for-row; the
    // image-only columns read all-zero).
    val base = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    val noImg = TextQueries.interleavedPackDocs(spark, base, withImages = false)
    val plain = TextQueries.trainSequencesDocs(spark, base)
    assert(noImg.filter(
      col("n_image_slots") =!= 0L || col("media_checksum") =!= 0L).count() == 0L)
    val a = noImg.select("lang", "seq_id", "n_tokens", "n_doc_ends", "checksum")
      .collect().map(_.toSeq).toSeq
    val b = plain.select("lang", "seq_id", "n_tokens", "n_doc_ends", "checksum")
      .collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("sequence decode aligns slot-for-slot with the packed layout") {
    val d = "/root/testdata/sf0.001"
    val dec = graft.queries.TextQueries.seqDecode(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    val packed = graft.queries.TextQueries.trainSequences(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(dec.keySet == packed.keySet,
      "decode must produce exactly the packed sequences")
    dec.foreach { case (k, (nTok, nUnk, text)) =>
      val (pTok, pEnds) = packed(k)
      assert(nTok == pTok, s"$k: token count drifted")
      assert(nUnk >= 0 && nUnk <= nTok)
      assert(text != null && text.nonEmpty)
      val eosCount = "<eos>".r.findAllIn(text).size
      assert(eosCount == pEnds,
        s"$k: rendered <eos> count $eosCount != packed n_doc_ends $pEnds")
    }
    // The sf0.001 vocabulary fits the 256-entry dictionary, so no <unk>
    // appears there; the branch is exercised on a synthetic corpus below.
    assert(dec.values.forall(_._2 == 0))
  }

  test("sequence decode renders <unk> for out-of-dictionary tokens") {
    import spark.implicits._
    // 300 distinct rare tokens + a few frequent ones: the dictionary
    // keeps the top 256, the tail decodes as <unk>.
    val common = (1 to 50).map(_ => "common").mkString(" ")
    val rare = (0 until 300).map(i => f"rare$i%03d").mkString(" ")
    val docs = Seq((0L, "en", common), (1L, "en", rare))
      .toDF("doc_id", "lang", "text")
    val dec = graft.queries.TextQueries.seqDecodeDocs(spark, docs)
    val nUnk = dec.agg(org.apache.spark.sql.functions.sum("n_unk"))
      .collect().head.getLong(0)
    assert(nUnk > 0, "the synthetic tail must decode as <unk>")
    assert(dec.filter(col("text").contains("<unk>")).count() > 0)
    assert(dec.filter(col("text").contains("common")).count() > 0)
  }

  test("aligned pack: empty keep set degenerates to the no-images pack exactly") {
    // The alignment gate's degenerate contract: if NO pair is aligned,
    // the alignment-aware pack is the no-images pack bit-for-bit —
    // wiring alignment in changed nothing about the degenerate case.
    val base = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    val emptyKeep = base.select("doc_id").limit(0)
    val gatedOut = TextQueries
      .interleavedPackDocs(spark, base, withImages = true,
        aligned = Some(emptyKeep))
      .collect().map(_.toSeq).toSeq
    val noImg = TextQueries
      .interleavedPackDocs(spark, base, withImages = false)
      .collect().map(_.toSeq).toSeq
    assert(gatedOut.nonEmpty && gatedOut == noImg)
  }

  test("aligned pack: only keep-verdict docs carry image slots; text always packs") {
    val d = "/root/testdata/sf0.001"
    val align = graft.queries.PipelineQueries.imgtextAlign(spark, d)
    val nKeep = align.filter(col("keep")).count()
    val nDrop = align.filter(!col("keep")).count()
    assert(nKeep > 0 && nDrop > 0, "both verdict branches must be live")
    val aligned = graft.queries.PipelineQueries.alignedPack(spark, d)
    val full = TextQueries.interleavedPackDocs(
      spark,
      graft.queries.Tables.documents(spark, d)
        .select(col("doc_id"), col("lang"), col("text")),
      withImages = true)
    val slotsAligned = aligned.agg(sum("n_image_slots")).collect().head.getLong(0)
    val slotsFull = full.agg(sum("n_image_slots")).collect().head.getLong(0)
    assert(slotsAligned == nKeep * TextQueries.ImageTokenCost,
      "every kept pair (and only kept pairs) carries its image budget")
    assert(slotsAligned < slotsFull, "the gate must actually drop images")
    // Dropping an image never drops text: text token + EOS counts match
    // the ungated pack's.
    val textAligned = aligned
      .agg(sum("n_text_tokens"), sum("n_doc_ends")).collect().head
    val textFull = full
      .agg(sum("n_text_tokens"), sum("n_doc_ends")).collect().head
    assert(textAligned.getLong(0) == textFull.getLong(0))
    assert(textAligned.getLong(1) == textFull.getLong(1))
  }

  test("interleaved pack: image slots shift the stream by exactly ImageTokenCost per image") {
    val base = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    val got = TextQueries.interleavedPackDocs(spark, base, withImages = true)
      .agg(
        sum("n_tokens").as("total"),
        sum("n_image_slots").as("slots"),
        sum("n_doc_ends").as("ends"))
      .collect().head
    val nImgDocs = base
      .filter(col("doc_id") % TextQueries.ImgEvery === 0).count()
    val plainTotal = TextQueries.trainSequencesDocs(spark, base)
      .agg(sum("n_tokens")).collect().head.getLong(0)
    assert(got.getAs[Long]("slots") ==
      nImgDocs * TextQueries.ImageTokenCost)
    assert(got.getAs[Long]("total") ==
      plainTotal + nImgDocs * TextQueries.ImageTokenCost)
    assert(got.getAs[Long]("ends") == base.count())
  }
}
