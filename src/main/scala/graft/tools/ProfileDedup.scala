package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.queries.{PipelineQueries, Tables}

/** Ad-hoc stage profiler for the dedup bench queries (not part of the
  * driver contract; dev tool only). */
object ProfileDedup {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = Tables.documents(spark, d)
    time("docs count")(docs.count())

    // minhash stages
    val sh = Dedup.shingleRows(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingleRows+persist")(println(s"  shingles=${sh.count()}"))
    val sigs = time("signatures plan")(
      Dedup.minhashSignature(docs, "doc_id", "text", PipelineQueries.MinhashHashes))
    time("signatures noop")(noop(sigs))
    val cands = Dedup.lshCandidates(
      Dedup.minhashSignature(docs, "doc_id", "text", PipelineQueries.MinhashHashes),
      PipelineQueries.MinhashBands,
      PipelineQueries.MinhashHashes / PipelineQueries.MinhashBands)
    time("lshCandidates count")(println(s"  cands=${cands.count()}"))
    time("full q_dedup_minhash")(noop(PipelineQueries.dedupMinhash(spark, d)))
    sh.unpersist()

    // simhash stages
    val sim = Dedup.simhash(docs, "doc_id", "text")
    time("simhash values noop")(noop(sim))
    time("simhash explode+agg x3")((1 to 3).foreach(_ => noop(sim)))
    val simNs = Dedup.simhashNoShuffle(docs, "doc_id", "text")
    time("simhash no-shuffle x3")((1 to 3).foreach(_ => noop(simNs)))
    val diff = sim.withColumnRenamed("simhash", "a")
      .join(simNs.withColumnRenamed("simhash", "b"), Seq("id"), "full")
      .filter(col("a").isNull || col("b").isNull || col("a") =!= col("b"))
      .count()
    println(s"  simhash variants diff rows = $diff")
    time("full q_dedup_simhash")(noop(PipelineQueries.dedupSimhash(spark, d)))

    // ngram jaccard
    time("full q_ngram_jaccard")(noop(PipelineQueries.ngramJaccard(spark, d)))

    // cosine duplicates
    time("full q_dedup_cosine")(noop(PipelineQueries.cosineDuplicates(spark, d)))
    spark.stop()
  }
}
