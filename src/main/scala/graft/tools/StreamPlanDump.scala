package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Dev aid: print the EXECUTED micro-batch physical plan of the n-gram
  * stream gate (the plan StreamingQueries.streamNgram runs), which a
  * batch-side explain cannot show. Not part of any driver surface. */
object StreamPlanDump {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.PipelineQueries
    import PipelineQueries.{NgramIncMod, NgramDfCap, JaccardThreshold}
    val corpusRows = PipelineQueries.docShingleRows(spark, d)
      .filter(col("id") % NgramIncMod =!= 0)
    val (p0, s0) = graft.dedup.Dedup
      .ngramArtifactsFromRows(corpusRows, NgramDfCap)
    val postings = p0.localCheckpoint(true)
    val cSets = s0.localCheckpoint(true)
    println(s"postings rows=${postings.count()} parts=${postings.rdd.getNumPartitions}")
    println(s"cSets rows=${cSets.count()} parts=${cSets.rdd.getNumPartitions}")
    // Stream face
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft-stream-$tag", "documents").toString
    val arrivals = graft.streaming.StreamingOps
      .readDocuments(spark, dir)
      .filter(col("doc_id") % NgramIncMod === 0)
    val verdicts = graft.streaming.StreamingOps.ngramGateStream(
      arrivals, postings, cSets, col("lang"), JaccardThreshold)
    val q = verdicts.writeStream
      .format("memory").queryName("dump_ngram")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println(q.explain(true))
    spark.stop()
  }
}
