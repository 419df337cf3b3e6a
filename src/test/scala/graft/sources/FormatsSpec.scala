package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FormatsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("csv and json round-trip the documents table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for (fmt <- Seq("csv", "json")) {
      val dir = tmp(s"fmt_$fmt")
      Formats.write(docs, fmt, s"$dir/out")
      val back = Formats.read(spark, fmt, s"$dir/out", Some(docs.schema))
      assert(back.count() == docs.count(), fmt)
      val origIds = docs.select("doc_id").collect().map(_.getLong(0)).sorted
      val backIds = back.select("doc_id").collect().map(_.getLong(0)).sorted
      assert(backIds.toSeq == origIds.toSeq, fmt)
    }
  }

  test("partitioned write prunes partitions on read") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = tmp("part")
    Formats.writePartitioned(docs, s"$dir/bylang", Seq("lang"))
    // One directory per language on disk.
    val subdirs = new java.io.File(s"$dir/bylang").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs.exists(_.startsWith("lang=")))
    val pruned = spark.read.parquet(s"$dir/bylang").filter(col("lang") === "en")
    assert(pruned.count() ==
      docs.filter(col("lang") === "en").count())
    // The physical plan must show a partition filter, not a data filter scan.
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang"), plan.take(400))
  }

  test("two co-bucketed tables join with no exchange on either side") {
    // The 100 TB co-located join: both sides bucketed on the join key
    // with the same bucket count → sort-merge join reads bucket i
    // against bucket i, zero shuffle of either table. This is the
    // persisted-layout answer a recurring fact⋈fact join should use
    // instead of paying its exchange every run.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumnRenamed("vec_id", "doc_id")
    Formats.writeBucketed(docs, "docs_b", "doc_id", 4, sortCol = Some("doc_id"))
    Formats.writeBucketed(emb, "emb_b", "doc_id", 4, sortCol = Some("doc_id"))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force SMJ so the exchange question is real
    try {
      val joined = spark.table("docs_b")
        .join(spark.table("emb_b"), Seq("doc_id"))
        .select("doc_id", "lang", "label")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(600))
      assert(joined.count() ==
        docs.join(emb, Seq("doc_id")).count())
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS docs_b")
      spark.sql("DROP TABLE IF EXISTS emb_b")
    }
  }

  test("bucketed table removes the exchange from a bucketed-key aggregation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Formats.writeBucketed(docs, "docs_bucketed", "doc_id", 4,
      sortCol = Some("doc_id"))
    val agg = spark.table("docs_bucketed")
      .groupBy("doc_id").agg(count(lit(1)))
    val plan = agg.queryExecution.executedPlan.toString
    // Bucketed layout: the groupBy on the bucket key needs no shuffle.
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(600))
    assert(agg.count() == docs.count())
    spark.sql("DROP TABLE IF EXISTS docs_bucketed")
  }
}
