package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.queries.Tables

/** Scale-stress harness (dev tool): replicates the sf0.1 corpus N× with a
  * one-token perturbation per replica (making each replica a NEAR-dup of
  * its source, the realistic dedup workload), then runs the dedup and
  * vocab pipelines end-to-end. The point is to observe that cost grows
  * linearly in corpus size (shingling, signatures) and in Σ dup-group²
  * (candidate verification) — the scaling the operators were designed
  * for — rather than to produce a polished benchmark number.
  */
object ScaleStress {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "8").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val reps = spark.range(replicas).select(col("id").as("rep"))
    val corpus = base
      .crossJoin(reps)
      .select(
        (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" replica"), col("rep")))
          .as("text"),
        col("lang"),
        col("source"))
      .persist()
    println(s"[stress] corpus rows = ${corpus.count()} (${replicas}x sf0.1)")

    time("exact dedup")(noop(Dedup.exactGroups(corpus, "doc_id", "text")))
    time("minhash signatures")(
      noop(Dedup.minhashSignature(corpus, "doc_id", "text", 8)))
    time("minhash near-dup e2e")(
      noop(Dedup.minhashDuplicates(corpus, "doc_id", "text", 8, 4, 0.5)))
    time("simhash values")(noop(Dedup.simhash(corpus, "doc_id", "text")))
    time("simhash near-dup e2e")(
      noop(Dedup.simhashDuplicates(corpus, "doc_id", "text", 3, 4)))
    // Round-4: df-capped blocked n-gram Jaccard — the cap bounds each
    // (block, shingle) posting self-join at df², so this must stay
    // near-linear in replicas even though every replica is a near-dup.
    time("ngram jaccard (df-capped)")(
      noop(Dedup.ngramJaccardBlocked(
        corpus, "doc_id", "text", col("lang"), 0.5)))
    time("vocab top-50")(
      noop(
        corpus
          .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("word"))
          .filter(col("word") =!= "")
          .distinct()
          .groupBy("word")
          .agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("word").asc)
          .limit(50)))
    // Round-3 additions: the corpus-curation family. Bench set (the part
    // that must stay linear in corpus size): one broadcast-join pass each.
    val benchDocs = corpus.filter(col("doc_id") % 13 === 0)
    time("decontaminate")(
      noop(Dedup.contamination(
        corpus.filter(col("doc_id") % 13 =!= 0), benchDocs, "doc_id", "text")))
    time("intra-doc sentence dedup")(
      noop(Dedup.intraDocSentenceDedup(corpus, "doc_id", "text")))
    time("incremental exact dedup")(
      noop(Dedup.incrementalExact(
        corpus.filter(col("doc_id") % 10 =!= 0),
        corpus.filter(col("doc_id") % 10 === 0), "doc_id", "text")))
    time("global prefix sum (hierarchical)")(
      noop(graft.operators.PrefixSum.globalCumsum(
        corpus.withColumn("n", length(col("text")).cast("long")),
        expr("doc_id div 1000"), Seq(col("doc_id")), col("n"), "cum")))
    // Round-4: duplicate spans on a corpus where every replica shares
    // almost every window with its source — the dense-duplication worst
    // case for the interval-union pass; must stay linear in corpus size
    // (flag join + doc-keyed windows, no pair blowup).
    time("duplicate spans")(
      noop(Dedup.duplicateSpans(corpus, "doc_id", "text")))
    // Round-5 additions: the remaining round-4/5 operators whose scale
    // claims were plan-shape reasoning only. Each must stay linear in
    // corpus size: bigram LM is two vocabulary-keyed aggs + one
    // vocabulary join; domain quota's TopKPerKey partial pass ships ≤ k
    // rows per (source, partition); BPE encode cost is per DISTINCT
    // token type (constant here — replicas add occurrences, not types),
    // so only the explode + per-doc agg grows.
    time("bigram LM")(
      noop(graft.queries.TextQueries.lmBigramDocs(corpus)))
    time("domain quota (TopKPerKey)")(
      noop(graft.queries.TextQueries.domainQuotaDocs(corpus)))
    time("bpe encode (127 merges, trie)")(
      noop(graft.queries.TextQueries.tokenBpeMergesDocs(
        corpus, graft.textanalysis.Bpe.MergesWordFull)))
    time("bpe encode 512-merge hex (trie)") {
      import graft.textanalysis.Bpe
      val tok = Bpe.hexTokenStream(corpus)
      val perDoc = tok.groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("n_occ"))
      val types = Bpe.subwordCountsForTypes(
        perDoc.select("tok").distinct(), "tok", Bpe.Merges512Hex)
      noop(perDoc.join(types, Seq("tok"))
        .groupBy("doc_id")
        .agg(
          sum(col("n_occ")).as("n_tokens"),
          sum(col("n_occ") * col("n_sub")).as("n_subwords")))
    }
    corpus.unpersist()
    spark.stop()
  }
}
