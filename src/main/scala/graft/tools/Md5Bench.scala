package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Md5Bench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.dedup.Dedup
    import graft.queries.PipelineQueries._
    val d = "/root/testdata/sf0.1"
    val docs0 = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % 7 =!= 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_md5b_").toString
    val docs = time("docs ckpt")(docs0
      .select(col("doc_id").as("id"), col("text")).localCheckpoint(true))
    val rows = time("ngramRows ckpt")(
      Dedup.ngramShingleRows(docs, "id", "text", lit(0L), 3)
        .localCheckpoint(true))
    def w(label: String, df: org.apache.spark.sql.DataFrame): Unit =
      time(label)(df.write.mode("overwrite").parquet(s"$tmp/$label"))
    w("w_docs", docs.withColumn("part", pmod(col("id"), lit(16))))
    w("w_bands", Dedup.bandTable(docs, "id", "text", MinhashHashes, MinhashBands))
    w("w_simhash", Dedup.simhashBandTable(docs, "id", "text", SimhashBlocks))
    w("w_postings", rows.select("blk", "shingle", "id"))
    w("w_sets", rows.groupBy("id").agg(sort_array(collect_set(col("shingle"))).as("shingles")))
    // now the same five CONCURRENTLY
    time("par 5 writes") {
      graft.Par.all(
        () => docs.withColumn("part", pmod(col("id"), lit(16)))
          .write.mode("overwrite").parquet(s"$tmp/p_docs"),
        () => Dedup.bandTable(docs, "id", "text", MinhashHashes, MinhashBands)
          .write.mode("overwrite").parquet(s"$tmp/p_bands"),
        () => Dedup.simhashBandTable(docs, "id", "text", SimhashBlocks)
          .write.mode("overwrite").parquet(s"$tmp/p_simhash"),
        () => rows.select("blk", "shingle", "id")
          .write.mode("overwrite").parquet(s"$tmp/p_postings"),
        () => rows.groupBy("id").agg(sort_array(collect_set(col("shingle"))).as("shingles"))
          .write.mode("overwrite").parquet(s"$tmp/p_sets"))
    }
    spark.stop()
  }
}
