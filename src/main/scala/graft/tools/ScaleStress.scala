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
  /** Dev aid: SPARK_GRAFT_STRESS_ONLY=<substring> runs only the stages
    * whose label contains it (skipped stages return null — stage groups
    * share a prefix so dependent stages filter together). */
  private val only: Option[String] = sys.env.get("SPARK_GRAFT_STRESS_ONLY")

  def time[A](label: String)(f: => A): A =
    if (only.exists(sel => !label.contains(sel))) null.asInstanceOf[A]
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Shared CC frame for the memoized-trio stress stages below (built in
    * one timed stage, replayed by three). */
  private var trioCc: DataFrame = _

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
    // Round-9: the IMAGE face of the hamming engine — real PNG decode +
    // 56-bit dHash over the replicated corpus (per-replica texts give
    // distinct md5 pixel chains) plus one brightness twin per image, so
    // every image has exactly one planted near-dup. Decode + hash is
    // per-image map work; the pair join's only shuffle key is
    // (band, band-value) with ~uniform 8-bit band values — Σ bucket²
    // grows with (n/256)² per band, so the curve bends gently above
    // linear at these sizes and the decode must dominate.
    time("image dhash + hamming pairs") {
      val mm = graft.multimodal.Multimodal
      import spark.implicits._
      val docs = corpus.select("doc_id", "text")
      val originals = mm.syntheticPngCorpus(docs, "doc_id", "text")
      val twins = mm
        .syntheticPngCorpus(docs, "doc_id", "text", brightnessDelta = 4)
        .map(m => m.copy(mediaId = m.mediaId + 1000000000L))
      val hashes = mm.imageDHash(originals.union(twins))
        .toDF()
        .filter(col("ok"))
        .select(col("mediaId").as("id"), col("phash").as("simhash"))
      noop(Dedup.hammingPairs(hashes, 56, 6, 7))
    }
    // Round-10: the VIDEO face of the hamming engine — real multi-frame
    // GIF decode + per-frame dHash over the replicated corpus plus one
    // brightness-twin per video. Same shape as the image stage: decode
    // and hash are per-blob map work, the pair join keys on (band,
    // band-value) only; per-frame rows multiply the hash count ~3.5×.
    time("frame dhash + hamming pairs") {
      val mm = graft.multimodal.Multimodal
      import spark.implicits._
      val docs = corpus.select("doc_id", "text")
      val originals = mm.syntheticGifCorpus(docs, "doc_id", "text")
      val twins = mm
        .syntheticGifCorpus(docs, "doc_id", "text", brightnessDelta = 4)
        .map(m => m.copy(mediaId = m.mediaId + 1000000000L))
      val hashes = mm.gifFrameHashes(originals.union(twins))
        .toDF()
        .select(
          (col("mediaId") * 10L + col("frameIdx")).as("id"),
          col("phash").as("simhash"))
      noop(Dedup.hammingPairs(hashes, 56, 6, 7))
    }
    // Round-11: the AUDIO face of the hamming engine — real WAV decode +
    // per-window 56-bit energy fingerprint over the replicated corpus
    // plus one amplitude-twin per clip. Same shape again: decode and
    // fingerprint are per-blob map work (the blob never shuffles), the
    // pair join keys on (band, band-value) only; 2 windows per clip
    // double the hash count.
    time("audio fp + hamming pairs") {
      val mm = graft.multimodal.Multimodal
      import spark.implicits._
      val docs = corpus.select("doc_id", "text")
      // extraSamples pushes clips to ~2k samples so every one of the 57
      // energy buckets per window is populated — all 56 bits content-
      // live, the realistic regime. (The fixture's 64-sample clips
      // leave most buckets empty; same-length windows would then share
      // structural bits and the stage would measure a fixture artifact,
      // not the engine.)
      val originals =
        mm.syntheticWavCorpus(docs, "doc_id", "text", extraSamples = 1936)
      val twins = mm
        .syntheticWavCorpus(docs, "doc_id", "text", amplitudeDelta = 3,
          extraSamples = 1936)
        .map(m => m.copy(mediaId = m.mediaId + 1000000000L))
      val hashes = mm
        .audioFingerprints(originals.union(twins), 2)
        .toDF()
        .select(
          (col("mediaId") * 10L + col("windowIdx")).as("id"),
          col("fp").as("simhash"))
      noop(Dedup.hammingPairs(hashes, 56, 6, 7))
    }
    // Round-11: CROSS-MODAL retrieval over a GROWING image index with a
    // FIXED query set (the production shape: the index is the corpus,
    // the queries are a bounded text batch). Both faces pay the same
    // per-blob feature extraction (linear map work, the blob never
    // shuffles); the exact face then scores |index|×|Q| pairs while the
    // IVF face scores only the probed nProbe/nCells fraction of the
    // index — at 100 TB the cell restriction is the difference between
    // a full-corpus scan per query batch and a bounded one.
    locally {
      val pq = graft.queries.PipelineQueries
      val mm = graft.multimodal.Multimodal
      graft.functions.DotProduct.register(spark)
      def index = pq
        .imageFeatureFrame(mm.mediaFromDocs(corpus.select(
          col("doc_id"), col("text"),
          length(col("text")).cast("long").as("n_chars"))))
        .select(col("doc_id").as("vec_id"), col("ih").as("emb"))
      // The FULL 500-row embeddings table as the query batch (the
      // oracle-checked query caps at 30 for fixture determinism; the
      // amortization claim below needs a production-sized batch).
      def queries = pq
        .textProjection(Tables.embeddings(spark, "/root/testdata/sf0.1"))
        .select(col("doc_id").as("vec_id"), col("tf").as("emb"))
      time("crossmodal exact topk e2e")(
        noop(graft.similarity.Similarity
          .crossTopK(index, queries, pq.CrossModalK)))
      time("crossmodal ivf topk e2e")(
        noop(graft.similarity.Ivf.fixedTopK(
          index.withColumnRenamed("emb", "embedding"),
          queries.withColumnRenamed("emb", "embedding"),
          pq.CrossModalCentroidIds, pq.CrossModalNProbe, pq.CrossModalK,
          excludeSelf = false)))
    }
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
        graft.operators.PrefixSum.adaptiveRangeBucket(
          corpus, col("doc_id"), 12),
        Seq(col("doc_id")), col("n"), "cum")))
    // Round-4: duplicate spans on a corpus where every replica shares
    // almost every window with its source — the dense-duplication worst
    // case for the interval-union pass; must stay linear in corpus size
    // (flag join + doc-keyed windows, no pair blowup).
    time("duplicate spans")(
      noop(Dedup.duplicateSpans(corpus, "doc_id", "text")))
    // Round-9: the REWRITE companion — same fp-keyed flag join and
    // doc-keyed interval union as the detector, plus keeper election
    // (one more fp-keyed agg) and the map-side per-doc token filter;
    // the increment over the detector is per-doc work, never cross-doc,
    // so the curve must track "duplicate spans".
    time("duplicate span removal")(
      noop(Dedup.removeDuplicateSpans(corpus, "doc_id", "text")))
    // Round-9 tail: the batch×corpus face — replica 0 plays the corpus
    // (fixed), the remaining replicas the arriving batch (grows with
    // the scale knob); the corpus collapses to its distinct fp set and
    // everything else is batch-sized, so cost tracks the batch.
    time("duplicate span removal (incremental)")(
      noop(Dedup.removeDuplicateSpansIncremental(
        corpus.filter(col("doc_id") < 10000000L),
        corpus.filter(col("doc_id") >= 10000000L),
        "doc_id", "text")))
    // Round-9 tail: span removal composed with sequence packing — the
    // dedup-then-train pipeline end to end; must track the sum of its
    // two curved stages.
    time("clean pack e2e") {
      val cleaned = Dedup
        .removeDuplicateSpans(corpus, "doc_id", "text")
        .select(col("id").as("doc_id"), col("clean_text").as("text"))
        .join(corpus.select("doc_id", "lang"), Seq("doc_id"))
      noop(graft.queries.TextQueries.trainSequencesDocs(spark, cleaned))
    }
    // Round-8 tail: the Gopher repetition battery. Every shuffle key is
    // doc-scoped ((id, n, fp) counts, (id, n) islands, (id, line)
    // groups), so replicas never interact and cost must stay linear in
    // corpus size even though every replica is internally repetitive in
    // exactly the same way.
    time("repetition battery")(
      noop(graft.textanalysis.Repetition.repetitionFilters(
        corpus, "doc_id", "text")))
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
    // Round-8: the 4096-merge realistic-vocabulary table over the same
    // hex stream as the 512 stage above — the A/B that pins the
    // encoder's O(token) claim: per-type cost depends on token length,
    // not table size, so this stage must track the 512 one near-flat
    // (same stream, 8x the merges).
    time("bpe 4096-merge table train (driver, once per JVM)") {
      graft.textanalysis.Bpe.Merges4kHex.size
    }
    time("bpe encode 4096-merge hex (rank scan)") {
      import graft.textanalysis.Bpe
      val tok = Bpe.hexTokenStream(corpus)
      val perDoc = tok.groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("n_occ"))
      val types = Bpe.subwordCountsForTypes(
        perDoc.select("tok").distinct(), "tok", Bpe.Merges4kHex)
      noop(perDoc.join(types, Seq("tok"))
        .groupBy("doc_id")
        .agg(
          sum(col("n_occ")).as("n_tokens"),
          sum(col("n_occ") * col("n_sub")).as("n_subwords")))
    }
    // Round-6 additions: the round-5 operators whose scale claims were
    // plan-shape reasoning only, plus the trainSequences offset A/B.
    // Each pipeline must stay near-linear in corpus size.
    time("train sequences e2e")(
      noop(graft.queries.TextQueries.trainSequencesDocs(spark, corpus)))
    // Round-9 tail: sliding passage chunking — one tokenizing scan +
    // map-side closed-form window assignment + (doc, window) partial
    // agg; strictly linear in token count.
    time("passage chunks e2e") {
      val P = graft.queries.TextQueries.PassageLen
      val S = graft.queries.TextQueries.PassageStride
      val toks = corpus.select(
        col("doc_id"),
        posexplode(regexp_extract_all(
          col("text"), lit(graft.queries.TextQueries.BpePattern), lit(0)))
          .as(Seq("pos", "tok")))
      noop(toks
        .select(col("doc_id"), col("pos"),
          (Dedup.hash60(col("tok")) % 1000003L).as("h"),
          explode(expr(
            s"sequence(greatest(0, (pos - $P + $S) div $S), pos div $S)"))
            .as("w"))
        .groupBy("doc_id", "w")
        .agg(count(lit(1)).as("n_toks"),
          sum(col("h") * (col("pos") - col("w") * S + lit(1L))).as("checksum")))
    }
    // Round-9: the interleaved multimodal packer — same offsets/placement
    // machinery plus ImageTokenCost reference rows per third doc; must
    // track "train sequences e2e" with a small constant increment.
    time("interleaved pack e2e")(
      noop(graft.queries.TextQueries.interleavedPackDocs(
        spark, corpus, withImages = true)))
    // Round-9: seeded shard assignment of the corpus doc ids into 64
    // shards — the bucketed prefix sum and the md5 keying are both
    // linear; the N-row driver fold is constant.
    time("shard assign (64 shards)")(
      noop(graft.operators.Sharding.shardReadout(
        corpus.select("doc_id"), col("doc_id"), 64, "stress-seed")))
    // Round-9: token-budget selection — one quality scan, the bucketed
    // running total, a 1-row broadcast budget; linear by construction.
    time("budget select e2e") {
      val scored = corpus.select(
          col("doc_id"),
          graft.textanalysis.TextAnalysis.qualityScore(col("text")).as("quality"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
        .withColumn("qm", round(col("quality") * 1e6, 0).cast("long"))
        .localCheckpoint(true)
      val ranked = graft.operators.PrefixSum.globalCumsum(
        scored,
        bucket = format_string(
          "%020d",
          graft.operators.PrefixSum.adaptiveRangeBucket(scored, -col("qm"), 12)),
        order = Seq(col("qm").desc, col("doc_id").asc),
        value = col("n_tokens"),
        out = "cum_tokens")
      val tot = scored.agg(expr("sum(n_tokens) div 2").as("budget"))
      noop(ranked.crossJoin(broadcast(tot))
        .select(col("doc_id"),
          (col("cum_tokens") - col("n_tokens") < col("budget")).as("keep")))
    }
    // Round-9: epoch-schedule materialization — a #sources broadcast
    // factor table and one map+rollup corpus pass; linear.
    time("epoch schedule e2e")(
      noop(graft.queries.TextQueries.epochScheduleDocs(
        corpus.withColumn("n_chars", length(col("text")).cast("long")))))
    // Round-9 tail: per-source budgets at the mix weights — budget
    // select's machinery with (source, quality-range) buckets; the
    // extra work over "budget select e2e" is a #sources fold.
    time("mix select e2e") {
      val d9 = corpus.withColumn("n_chars", length(col("text")).cast("long"))
      val scored = d9.select(
          col("doc_id"), col("source"),
          graft.textanalysis.TextAnalysis.qualityScore(col("text")).as("quality"),
          expr("n_chars div 4").as("n_tokens"))
        .withColumn("qm", round(col("quality") * 1e6, 0).cast("long"))
        .localCheckpoint(true)
      val ranked = graft.operators.PrefixSum.globalCumsum(
        scored,
        bucket = format_string(
          "%s\u0001%020d", col("source"),
          graft.operators.PrefixSum.adaptiveRangeBucket(scored, -col("qm"), 12)),
        order = Seq(col("source"), col("qm").desc, col("doc_id").asc),
        value = col("n_tokens"),
        out = "gcum")
      noop(ranked)
    }
    // Round-9 tail: the per-source scorecard — one battery scan, one
    // fingerprint-keyed keeper window, a #sources rollup; linear.
    time("source scorecard e2e") {
      import org.apache.spark.sql.expressions.Window
      val battery = graft.textanalysis.TextAnalysis.gopherFilters(
          corpus, "doc_id", "text",
          extra = Seq(
            graft.textanalysis.TextAnalysis.qualityScore(col("text")).as("quality"),
            col("lang")))
        .withColumn(
          "keep",
          col("r_word_count") && col("r_mean_word_len") &&
            col("r_symbol_ratio") && col("r_bullet") && col("r_ellipsis") &&
            col("r_alpha") && (col("lang") =!= "en" || col("r_stopword")) &&
            col("quality") >= 0.7)
        .select(col("doc_id"), col("keep"))
      val dup = corpus
        .select(col("doc_id"), col("source"),
          md5(substring(col("text"), 1, 50)).as("dup_key"))
        .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy("dup_key")))
        .select(col("doc_id"), col("source"),
          when(col("doc_id") > col("keeper"), 1L).otherwise(0L).as("is_dup"))
      noop(dup.join(battery, Seq("doc_id")).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
          sum(col("is_dup")).as("n_dup")))
    }
    time("ccnet buckets e2e")(
      noop(graft.queries.TextQueries.ccnetBucketsFrom(
        graft.queries.TextQueries.lmScoreDocs(corpus)
          .select("doc_id", "mean_nll_micro")
          .join(corpus.select("doc_id", "lang"), Seq("doc_id")))))
    time("leakage-safe split e2e") {
      val pairs = Dedup
        .minhashDuplicates(corpus, "doc_id", "text", 8, 4, 0.2)
        .select("id_a", "id_b")
      val cc = Dedup.connectedComponents(pairs)
        .withColumnRenamed("id", "doc_id")
      noop(graft.queries.PipelineQueries.leakageSafeSplitFrom(
        corpus.select("doc_id"), cc))
    }
    // Round-7: multi-query BM25 over the replicated corpus — must stay
    // linear in corpus size (two text scans + postings aggs; the
    // (query, doc) fan-out is bounded by |queries| × matched docs).
    time("bm25 query table") {
      import spark.implicits._
      noop(graft.queries.TextQueries.bm25QueriesDf(
        spark, corpus,
        graft.queries.TextQueries.Bm25QueryFixture.toDF("query_id", "qtext")))
    }
    // Round-10: passage-LEVEL BM25 isolated (round-9 measured it only
    // inside the full battery) — passage construction (map-side window
    // assignment + (doc, window)-bounded collect) feeding the unchanged
    // multi-query ranker; must track "bm25 query table" plus roughly the
    // "passage chunks e2e" term.
    time("bm25 passages e2e")(
      noop(graft.queries.TextQueries.bm25PassagesDocs(spark, corpus)))
    // Round-10: the near-dup ingest gate's batch face — row-local
    // banding of the arriving residue joined to the frozen corpus band
    // table + shingle-set verify. Candidates are band-bucket bounded
    // exactly like the batch incremental operator; the per-row banding
    // is map work, so the curve must stay near the minhash signature
    // cost of the arriving slice.
    time("neardup gate e2e") {
      val arr = corpus.filter(col("doc_id") % 7 === 0)
      val rest = corpus.filter(col("doc_id") % 7 =!= 0)
      noop(graft.streaming.StreamingOps.nearDupGateStream(
        arr,
        Dedup.bandTable(rest, "doc_id", "text", 8, 4),
        Dedup.shingleSetTable(rest, "doc_id", "text"),
        8, 4, 0.2))
    }
    // Round-10 split: the same gate with the corpus artifacts PRE-BUILT
    // (eagerly checkpointed outside the timed window) — the PER-DELIVERY
    // cost a production deploy pays, since the band table and shingle
    // sets are stored once at ingest. The e2e stage above minus this is
    // the one-time artifact build. (Guarded so STRESS_ONLY filtering of
    // other stages skips the eager artifact build too.)
    if (only.forall(sel => "neardup gate per-delivery".contains(sel))) {
      val arr = corpus.filter(col("doc_id") % 7 === 0)
      val rest = corpus.filter(col("doc_id") % 7 =!= 0)
      val bandsArt = Dedup.bandTable(rest, "doc_id", "text", 8, 4)
        .localCheckpoint(true)
      val setsArt = Dedup.shingleSetTable(rest, "doc_id", "text")
        .localCheckpoint(true)
      time("neardup gate per-delivery")(
        noop(graft.streaming.StreamingOps.nearDupGateStream(
          arr, bandsArt, setsArt, 8, 4, 0.2)))
    }
    // Round-10: corpus commit — gate + span-clean + three artifact
    // folds; every commit-time term is batch-sized, the corpus terms are
    // the artifact builds (linear scans).
    time("corpus commit e2e") {
      val a = Dedup.commitArtifacts(
        corpus.filter(col("doc_id") % 10 =!= 0),
        corpus.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", 8, 4, 8)
      noop(a.fingerprints); noop(a.bandTable); noop(a.spanFps)
    }
    // Round-10: BPE id encode + decode round trip — per-distinct-type
    // map work + the doc-keyed reassembly agg; linear in token count.
    time("token decode e2e") {
      import graft.textanalysis.Bpe
      val merges = Bpe.MergesWordFull
      val tok = corpus.select(
        col("doc_id"),
        posexplode(regexp_extract_all(
          col("text"), lit(graft.queries.TextQueries.BpePattern), lit(0)))
          .as(Seq("pos", "tok")))
      val decoded = Bpe.decodeIdsForTypes(
        Bpe.encodeIdsForTypes(tok.select("tok").distinct(), "tok", merges),
        "tok", merges)
      noop(tok.join(decoded, Seq("tok"))
        .groupBy("doc_id")
        .agg(sum(size(col("ids"))).as("n_ids"), count(lit(1)).as("n_tokens")))
    }
    // Round-7: the training-mix additions. mixWeights must stay linear
    // (one pruned scan into domain-keyed partial sums); lengthBatches
    // must stay linear with a bounded stitch (bucket-keyed prefix rank,
    // never a global sort); hardNegatives is |Q|·|corpus| broadcast
    // scoring — linear in corpus size at fixed query count.
    time("trainmix: weights")(
      noop(graft.queries.TextQueries.mixWeightsDocs(
        corpus.withColumn("n_chars", length(col("text")).cast("long")))))
    time("trainmix: length batches")(
      noop(graft.queries.TextQueries.lengthBatchesDocs(
        corpus.withColumn("n_chars", length(col("text")).cast("long")))))
    val embBase = Tables.embeddings(spark, "/root/testdata/sf0.1")
    // ONE replica recipe for every embedding stage (changing the shift
    // or seed spacing in one stage but not another would silently stress
    // differently-shaped corpora and invalidate the A/B ratios):
    // replicated ids, +0.05·rep per-dim shift so replica cells separate
    // and per-replica seeds never collapse onto duplicate centroids,
    // 8 seeds per replica (the SemDeDup K∝N discipline — bounded cells).
    def replicatedEmb(withLabel: Boolean): DataFrame = {
      val cols = Seq(
        (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) + CAST(rep AS DOUBLE) * 0.05)")
          .as("embedding")) ++ (if (withLabel) Seq(col("label")) else Nil)
      embBase.crossJoin(reps).select(cols: _*)
    }
    val replicaSeeds: Seq[Long] = (0 until replicas).flatMap(rep =>
      (0 until 8).map(r => rep * 10000000L + r * 37L))
    time("trainmix: hard negatives") {
      val embCorpus = embBase
        .crossJoin(reps)
        .select(
          (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
          col("embedding"),
          col("label"))
      noop(graft.similarity.Similarity.hardNegatives(
        embCorpus, embBase.filter(col("vec_id") < 10), 5))
    }
    // Round-8: CORPUS-SCALE hard negatives (every vector an anchor) on
    // trained IVF cells. Near-linearity needs bounded cell size via the
    // replica-scaled seed count: pairs ≈ |C| · nProbe · cell-size stays
    // linear; the |C|×K integer assignment passes are the standard IVF
    // coarse cost (broadcast K-row table, embarrassingly parallel).
    time("trainmix: hard negatives IVF (corpus anchors)") {
      noop(graft.similarity.Ivf.hardNegatives(
        replicatedEmb(withLabel = true), replicaSeeds,
        iters = 2, nProbe = 2, k = 5))
    }
    // Round-8: triplet emission on the same cells — hardNegatives' pair
    // stream plus the same-label split, one heap pass; must track the
    // mining stage above (same pair generation, one extra boolean key).
    time("trainmix: contrastive triplets (corpus anchors)") {
      noop(graft.similarity.Ivf.contrastiveTriplets(
        replicatedEmb(withLabel = true), replicaSeeds,
        iters = 2, nProbe = 2, kNeg = 5))
    }
    // Round-8: SemDeDup at K∝N (same replica corpus and seeds): Σ cell²
    // with bounded cells must stay near-linear in corpus size.
    time("semantic dedup (K per replica)") {
      noop(graft.similarity.Ivf.semanticDedup(
        replicatedEmb(withLabel = false), replicaSeeds, 0.35))
    }
    // Round-9: semantic decontamination at K∝N against a FIXED holdout
    // (the realistic shape — the eval suite does not grow with the
    // corpus). Cost = the two map-side assignment passes (linear in
    // corpus) + cell-keyed pairs against the broadcast holdout
    // (≤ |corpus ∩ cell| · |holdout ∩ cell| per probed cell).
    time("semantic decontam (fixed holdout)") {
      noop(graft.similarity.Ivf.semanticContamination(
        replicatedEmb(withLabel = false),
        embBase.filter(col("vec_id") % 13 === 0),
        replicaSeeds, 0.35, nProbe = 2))
    }
    // Round-8: IVF-PQ search over the replicated corpus at a fixed query
    // count — the keyed one-plan training + narrow code rows against a
    // broadcast distance table; linear in corpus size.
    time("ivf-pq topk (fixed queries)") {
      noop(graft.similarity.Ivf.pqTopK(
        replicatedEmb(withLabel = false), embBase.filter(col("vec_id") < 10),
        (0 until 8).map(_ * 37L), dims = 64, m = 4, iters = 2, k = 5))
    }
    // Round-8 tail: TRUE IVF-PQ — probed inverted lists restrict the ADC
    // join to ~nProbe/K of the code rows; the search increment over the
    // unprobed stage above must shrink, not grow, with the probe cut
    // (training cost is shared shape: one coarse + one PQ keyed plan).
    time("ivf-pq probed (fixed queries)") {
      noop(graft.similarity.Ivf.ivfPqProbeTopK(
        replicatedEmb(withLabel = false), embBase.filter(col("vec_id") < 10),
        (0 until 8).map(_ * 37L), (0 until 8).map(_ * 37L),
        dims = 64, m = 4, iters = 2, nProbe = 2, k = 5))
    }
    // Round-11: ANN SERVING per-delivery — the q_stream_ann cost model.
    // The serving artifacts (centroid table + corpus cell assignment)
    // build once at deploy time in their own timed stage; the
    // per-delivery stage is ONLY the query pass a micro-batch pays —
    // probe map work + the probed fraction of the index. With the K∝N
    // seed discipline (replicaSeeds) cells stay bounded, so the probed
    // fraction SHRINKS as the index grows and per-delivery cost must
    // stay near-flat — the claim that makes streaming serving viable
    // against a 100-TB index.
    var annCent: DataFrame = null
    var annAsg: DataFrame = null
    time("ann serve: index build (K∝N)") {
      val (cent, asg) = graft.similarity.Ivf.fixedIndexArtifacts(
        replicatedEmb(withLabel = false), replicaSeeds)
      annCent = cent.localCheckpoint(true)
      annAsg = asg.localCheckpoint(true)
    }
    time("ann serve: per-delivery (500 queries)") {
      noop(graft.similarity.Ivf.fixedSearch(
        annCent, annAsg, embBase, nProbe = 2, k = 5))
    }
    // Round-11: CORPUS RETRACTION e2e — the takedown inverse of the
    // commit, deleting ~14% of the replicated corpus from all seven
    // stored artifacts. Cost must be the artifact-build scans plus
    // id-keyed anti-joins and broadcast-restricted retention scans —
    // linear in corpus, with the cap-crossing repair bounded by the
    // crossing set.
    var retractStored: Dedup.GateArtifacts = null
    time("corpus retract e2e") {
      val stored = Dedup.gateArtifactsOf(
        corpus, "doc_id", "text", 8, 4, 8, maxShingleDf = 8)
      retractStored = Dedup.GateArtifacts(
        stored.fingerprints.localCheckpoint(true),
        stored.bandTable.localCheckpoint(true),
        stored.spanFps.localCheckpoint(true),
        stored.simhashBands.localCheckpoint(true),
        stored.ngramPostings.localCheckpoint(true),
        stored.ngramDf.localCheckpoint(true),
        stored.shingleSets.localCheckpoint(true))
      val del = corpus.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id").as("id"))
      val r = Dedup.retractArtifacts(
        retractStored, corpus, del, "doc_id", "text", 8, maxShingleDf = 8)
      noop(r.fingerprints); noop(r.bandTable); noop(r.spanFps)
      noop(r.simhashBands); noop(r.ngramPostings); noop(r.ngramDf)
      noop(r.shingleSets)
    }
    // The cost a deployment actually pays per takedown: the stored
    // artifacts are READ (pre-checkpointed above), so the timed work is
    // the anti-joins, the broadcast-restricted retention scans, the df
    // decrement and the crosser repair — e2e minus this is the one-time
    // artifact build.
    time("corpus retract per-takedown") {
      val del = corpus.filter(col("doc_id") % 7 === 5)
        .select(col("doc_id").as("id"))
      val r = Dedup.retractArtifacts(
        retractStored, corpus, del, "doc_id", "text", 8, maxShingleDf = 8)
      noop(r.fingerprints); noop(r.bandTable); noop(r.spanFps)
      noop(r.simhashBands); noop(r.ngramPostings); noop(r.ngramDf)
      noop(r.shingleSets)
    }
    // Round-7: the memoized three-query family END-TO-END through one
    // shared CC build — the declared-surface shape (dupComponents memo →
    // clusters + keep-list + leakage split). The build is paid once
    // (checkpointed), the three consumers replay it; total must track
    // the single minhash+CC cost, and each consumer's increment must be
    // corpus-linear (anti-join / hash split / sort of a doc-keyed frame).
    time("memoized trio: shared CC build") {
      val pairs = Dedup
        .minhashDuplicates(corpus, "doc_id", "text", 8, 4, 0.5)
        .select("id_a", "id_b")
      val cc = Dedup.connectedComponents(pairs).localCheckpoint(true)
      trioCc = cc
    }
    time("memoized trio: clusters replay")(
      noop(trioCc.orderBy("id")))
    time("memoized trio: keep-list replay")(
      noop(Dedup.applyDropList(
        corpus.select("doc_id"),
        trioCc.filter(col("id") =!= col("component"))
          .select(col("id").as("doc_id")),
        "doc_id")))
    time("memoized trio: leakage-split replay")(
      noop(graft.queries.PipelineQueries.leakageSafeSplitFrom(
        corpus.select("doc_id"),
        trioCc.withColumnRenamed("id", "doc_id"))))
    // Untimed dependency guard: when SPARK_GRAFT_STRESS_ONLY filtered
    // out the trio build, the CC frame is rebuilt here (outside any
    // timed window) so the dependent stages below still run.
    def trioCcOrBuild(): DataFrame = {
      if (trioCc == null)
        trioCc = Dedup.connectedComponents(
          Dedup.minhashDuplicates(corpus, "doc_id", "text", 8, 4, 0.5)
            .select("id_a", "id_b")).localCheckpoint(true)
      trioCc
    }
    // Round-11b: SOFT-DEDUP weights + sample over the shared CC build —
    // one component-keyed groupBy joined back to the corpus plus a
    // map-side hash draw; the increment over the trio replays must be
    // corpus-linear (no new pair generation, no window).
    if (only.exists(sel => "r11b soft-dedup: weights + sample".contains(sel) ||
        "r11b inc clusters: per-delivery fold".contains(sel)))
      trioCcOrBuild()
    time("r11b soft-dedup: weights + sample") {
      val withComp = corpus.select("doc_id")
        .join(trioCcOrBuild().withColumnRenamed("id", "doc_id"),
          Seq("doc_id"), "left")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
      val sizes = withComp.groupBy("component")
        .agg(count(lit(1)).as("cluster_size"))
      val weights = withComp.join(sizes, Seq("component"))
        .select(col("doc_id"),
          expr("CAST((2000000 + cluster_size) DIV (2 * cluster_size) AS BIGINT)")
            .as("weight_micros"))
      noop(weights.filter(
        Dedup.hash60(concat_ws(":", lit("graft-wsample-v1"),
          col("doc_id").cast("string"))) % 1000000L < col("weight_micros")))
    }
    // Round-11b: INCREMENTAL CLUSTERING A/B — one fresh replica arrives.
    // Rebuild regenerates the full (corpus ∪ batch) pair set and runs CC
    // from cold; the fold generates only the delivery's pairs
    // (batch×corpus banding + batch×batch) and folds them into the
    // stored assignment's star edges. The fold's advantage must GROW
    // with corpus size — that is the incremental claim.
    time("r11b inc clusters: e2e rebuild") {
      val batch = base.select(
        (col("doc_id") + lit(replicas * 10000000L)).as("doc_id"),
        concat(col("text"), lit(" replicaX")).as("text"))
      val all = corpus.select("doc_id", "text").unionByName(batch)
      noop(Dedup.connectedComponents(
        Dedup.minhashDuplicates(all, "doc_id", "text", 8, 4, 0.5)
          .select("id_a", "id_b")))
    }
    // The deployment's split: band table + shingle rows are deploy-time
    // stored artifacts (timed as the build half); the per-delivery half
    // is ONLY what each arriving replica pays — batch banding, the join
    // against the stored band table, the two-sided verify, and the CC
    // fold from the stored assignment's star edges. The per-delivery
    // cost must stay near-flat as the corpus grows (bounded band
    // buckets), while the rebuild above grows with the corpus.
    var incBands: DataFrame = null
    var incShRows: DataFrame = null
    time("r11b inc clusters: artifacts build") {
      incBands = Dedup.bandTable(corpus, "doc_id", "text", 8, 4)
        .localCheckpoint(true)
      incShRows = Dedup.shingleRows(corpus, "doc_id", "text")
        .localCheckpoint(true)
    }
    time("r11b inc clusters: per-delivery fold") {
      val batch = base.select(
        (col("doc_id") + lit(replicas * 10000000L)).as("doc_id"),
        concat(col("text"), lit(" replicaX")).as("text"))
      val newPairs = Dedup
        .minhashIncrementalFromArtifacts(
          incBands, incShRows, batch, "doc_id", "text", 8, 4, 0.5)
        .select("id_a", "id_b")
        .unionByName(Dedup
          .minhashDuplicates(batch, "doc_id", "text", 8, 4, 0.5)
          .select("id_a", "id_b"))
      noop(Dedup.incrementalComponents(trioCcOrBuild(), newPairs))
    }
    // Round-11b: RELEASE MANIFEST — one map-side pass (hash + length +
    // token count per doc) into an 8-key groupBy with map-side partial
    // aggregation; must be flat-per-row linear, the cheapest curve in
    // the battery.
    time("r11b release manifest") {
      noop(graft.queries.TextQueries.releaseManifestOf(
        corpus.select("doc_id", "text")))
    }
    // Round-11b: CROSS-SOURCE OVERLAP MATRIX — the banded pair engine
    // plus two id-keyed source joins and a sources²-bounded rollup; the
    // fingerprint half's self-join groups are bounded by the source
    // count. Must track the minhash e2e curve, not exceed it.
    time("r11b source overlap matrix") {
      noop(graft.queries.PipelineQueries.sourceOverlapOf(corpus))
    }
    // Round-11b: AUDIO-TEXT ALIGNMENT — real WAV decode + 16-segment
    // energy fold per clip (per-row flatMap; the blob never shuffles),
    // one clip-keyed pivot, a doc-keyed join to the 16-dim text
    // projection, row-local scoring. Decode-bound linear.
    time("r11b audiotext align e2e") {
      graft.functions.DotProduct.register(spark)
      val mm = graft.multimodal.Multimodal
      val aFeat = mm
        .segmentAudio(
          mm.syntheticWavCorpus(
            corpus.select("doc_id", "text"), "doc_id", "text"), 16)
        .toDF()
        .groupBy("mediaId")
        .agg(sort_array(collect_list(struct(col("segmentIdx"), col("sumSq"))))
          .as("segs"))
        .select(
          col("mediaId").as("doc_id"),
          expr("transform(segs, x -> CAST(x.sumSq AS DOUBLE))").as("ih"))
      noop(graft.queries.PipelineQueries.alignScores(
        aFeat,
        graft.queries.PipelineQueries.textProjection(
          replicatedEmb(withLabel = false)
            .select(col("vec_id"), col("embedding")))))
    }
    // Round-11b: PQ DISTORTION MONITOR against a stored index — the
    // index builds once (its own timed stage, the deploy-time cost);
    // the monitor is the recurring pass: one corpus scan exploded to m
    // narrow sub-rows, an id-keyed code join, a broadcast codebook
    // join, an m-key groupBy. Must be flat-per-row linear like the
    // manifest.
    var pqMonCb: DataFrame = null
    var pqMonCodes: DataFrame = null
    time("r11b pq distortion: index build (K∝N)") {
      val (cb, codes) = graft.similarity.Ivf.pqArtifacts(
        replicatedEmb(withLabel = false), replicaSeeds,
        dims = 64, m = 4, iters = 2)
      pqMonCb = cb.localCheckpoint(true)
      pqMonCodes = codes.localCheckpoint(true)
    }
    time("r11b pq distortion: monitor pass") {
      noop(graft.similarity.Ivf.pqDistortion(
        replicatedEmb(withLabel = false), pqMonCb, pqMonCodes,
        dims = 64, m = 4))
    }
    // Round-11c: MUTUAL kNN GRAPH — from-scratch build (K∝N seeds keep
    // cells bounded, so the cell-keyed score join stays near-linear),
    // then the stored-artifact build and a FIXED-size per-delivery fold
    // against the growing index: the fold re-ranks only the arrivals
    // plus the probe rows their cells hit, so its cost must track the
    // affected-cell population (≈ flat per delivery under K∝N), never
    // the corpus.
    time("r11c knn graph: from-scratch build") {
      noop(graft.similarity.Ivf.mutualKnnEdges(
        replicatedEmb(withLabel = false), replicaSeeds, 2, 4))
    }
    var knnIdx: graft.similarity.Ivf.KnnIndex = null
    time("r11c knn graph: artifacts build") {
      knnIdx = graft.similarity.Ivf.knnIndexArtifacts(
        replicatedEmb(withLabel = false)
          .filter(col("vec_id") % 9 =!= 8),
        replicaSeeds.filter(_ % 9 != 8), 2, 4)
    }
    time("r11c knn graph: per-delivery fold") {
      noop(graft.similarity.Ivf.mutualKnnFold(
        knnIdx,
        embBase.filter(col("vec_id") % 9 === 8)))
    }
    // Round-12: the TABLE-BACKED index store's fold, with the fold call
    // ISOLATED (r11's near-flat curve for the in-memory fold held only
    // because fixed overhead dominated — its per-delivery full-table
    // unionByName+localCheckpoint copy is corpus-proportional work this
    // store does not do; here a growing corpus may only grow the
    // affected-cell candidate join, bounded by K∝N cells).
    var knnStore: graft.similarity.KnnStore = null
    time("r12 knn store: deploy") {
      knnStore = new graft.similarity.KnnStore(
        spark,
        java.nio.file.Files.createTempDirectory("graft_stress_knn_")
          .toString,
        nProbe = 2, k = 4)
        .deploy(
          replicatedEmb(withLabel = false).filter(col("vec_id") % 9 =!= 8),
          replicaSeeds.filter(_ % 9 != 8))
    }
    time("r12 knn store: per-delivery fold") {
      knnStore.foldBatch(embBase.filter(col("vec_id") % 9 === 8), 0L)
    }
    // Round-11c: SEMANTIC ASSIGNMENT COMMIT — the stored cell table's
    // per-delivery cost model: a FIXED batch assigns map-side against
    // the frozen centroids and bare-unions into the stored table,
    // vs the full rebuild an artifact-less pipeline would pay.
    var semCent: DataFrame = null
    var semStored: DataFrame = null
    time("r11c semantic commit: stored build") {
      val all = replicatedEmb(withLabel = false)
      semCent = graft.similarity.Ivf.fixedCentroidsDouble(all, replicaSeeds)
        .localCheckpoint(true)
      semStored = graft.similarity.Ivf
        .assignCells(all.filter(col("vec_id") % 9 =!= 8), semCent)
        .localCheckpoint(true)
    }
    time("r11c semantic commit: per-delivery") {
      noop(graft.similarity.Ivf.commitCellAssignments(
        semStored, semCent, embBase.filter(col("vec_id") % 9 === 8)))
    }
    // Round-11c: the DRIFT MONITORS are single-scan aggregations — the
    // quality face collapses to ~a dozen level rows, the fertility face
    // to per-distinct-type encode work + a lang-keyed groupBy. Both
    // must stay flat-per-row linear like the manifest.
    time("r11c quality drift monitor") {
      val scored = corpus.select(
        col("doc_id"),
        graft.textanalysis.TextAnalysis.qualityScore(col("text"))
          .as("quality"))
      noop(graft.queries.PipelineQueries.qualityDriftReadout(
        scored.filter(col("doc_id") % 10 =!= 0)
          .groupBy("quality").agg(count(lit(1)).as("corpus_n")),
        scored.filter(col("doc_id") % 10 === 0)
          .groupBy("quality").agg(count(lit(1)).as("batch_n"))))
    }
    // Round-11d: PAGERANK over the mutual graph — [[PagerankIters]]
    // synchronous iterations, each two vertex-keyed shuffles over
    // (id, long) rows; with K∝N cells the edge build dominates and the
    // iterations must stay flat-per-vertex linear.
    time("r11d pagerank: edges + 5 iters") {
      val emb = replicatedEmb(withLabel = false)
      val edges = graft.similarity.Ivf
        .mutualKnnEdges(emb, replicaSeeds, 2, 4)
        .select("id_a", "id_b")
      noop(graft.queries.PipelineQueries.pagerankOverEdges(
        edges, emb.select(col("vec_id").as("v"))))
    }
    // Round-11d: CROSS-DOC SENTENCE DEDUP — the corpus-wide keep-first
    // election: sentence explode (linear), one groupBy(sh) min-struct
    // (map-side combinable; the planted-footer hot keys are absorbed by
    // partial aggregation) and a hash join back. Must grow linearly in
    // sentence count.
    time("r11d sentence dedup e2e") {
      noop(Dedup.crossDocSentenceDedup(
        corpus.select(col("doc_id"),
          concat(col("text"),
            lit(". generated by example corp. all rights reserved?"))
            .as("text")),
        "doc_id", "text"))
    }
    // Round-11d: the SENTENCE GATE's artifact-vs-delivery split — the
    // corpus hash set builds once (deploy-time), the per-delivery clean
    // of a FIXED batch must stay flat as the corpus grows (one
    // hash-keyed semi-ish join against the stored set).
    var sentSet: DataFrame = null
    time("r11d sentence gate: artifact build") {
      sentSet = Dedup
        .sentenceHashSet(
          corpus.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
        .localCheckpoint(true)
    }
    time("r11d sentence gate: per-delivery clean") {
      noop(Dedup.sentenceCleanAgainstSet(
        sentSet, base.filter(col("doc_id") % 10 === 0), "doc_id", "text"))
    }
    // Round-11d: NGRAM NOVELTY — one shingle-keyed hash join of the
    // fixed batch against the growing corpus set, doc-keyed rollup;
    // per-delivery cost must track the batch, not the corpus.
    var novSet: DataFrame = null
    time("r11d novelty: corpus set build") {
      novSet = Dedup
        .shingleRows(
          corpus.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
        .select("shingle").distinct()
        .localCheckpoint(true)
    }
    time("r11d novelty: per-delivery score") {
      noop(Dedup.ngramNoveltyFromRows(
        novSet,
        Dedup.shingleRows(
          base.filter(col("doc_id") % 10 === 0), "doc_id", "text")))
    }
    // Round-12: TABLE-BACKED COMMIT/RETRACT — the deploy writes the
    // corpus-layer artifact tables once (timed; corpus-proportional BY
    // DESIGN — it is the deploy, not the delivery). The per-delivery
    // fold of a FIXED batch is batch-sized delta appends plus
    // Bloom-prefiltered, partition-pruned gate reads, so it must stay
    // FLAT as the corpus grows — the r11 in-memory fold re-checkpointed
    // the full committed state per delivery (corpus-proportional),
    // which is exactly the curve this stage exists to disprove. The
    // retract delivery is delete-sized signed-decrement appends plus
    // one pruned docs read — same flatness requirement.
    if (only.forall(sel =>
        "r12 table commit: deploy per-delivery fold retract".contains(sel))) {
      val tcBatch = base
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("id"), col("text"))
        .localCheckpoint(true)
      var tcStore: graft.dedup.TableCommit = null
      time("r12 table commit: deploy") {
        tcStore = new graft.dedup.TableCommit(
          spark,
          java.nio.file.Files.createTempDirectory("graft_stress_tc_")
            .toString,
          8, 4, 8)
          .deploy(corpus.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      }
      time("r12 table commit: per-delivery fold") {
        tcStore.foldBatch(tcBatch, 0L)
      }
      time("r12 table commit: per-delivery retract") {
        tcStore.retractBatch(tcBatch.select("id"), 1L)
      }
    }

    // Round-13: the FOLD-COUNT AXIS — the r12 curves varied CORPUS size
    // but timed delivery #1 only; the cost that actually compounds in a
    // long-running ingest is per-DELIVERY-INDEX: the Nth fold's gate
    // reads union N−1 marked delta batches (TableCommit) or pay the
    // max-ver window over every edge version ever written (KnnStore).
    // This stage runs N consecutive micro-batch deliveries (commits
    // with a takedown every 8th) at FIXED corpus, TWICE — trigger OFF
    // (the raw growth curve) and trigger ON (autoCompact on the
    // delta-file bound) — and prints per-delivery wall time by index
    // block plus the delta-file/generation readout. Done-criterion from
    // the r12 verdict: the trigger-ON curve stays bounded (flat or
    // sawtooth) across compactions while file count respects the bound.
    def blockReport(tag: String, secs: Array[Double]): Unit = {
      val n = secs.length
      if (n == 0) { println(f"[stress] $tag%-44s (no deliveries)"); return }
      if (n < 4) {
        // A smoke run with SPARK_GRAFT_FOLD_DELIVERIES < 4 has no
        // quartiles: print the raw per-delivery times instead of
        // clamped duplicate probes and empty-slice means that read as
        // measured zeros (round-13 ADVICE).
        val raw = secs.map(s => f"$s%5.2f").mkString(" ")
        println(f"[stress] $tag%-44s raw (n=$n) $raw s")
        return
      }
      def mean(a: Int, b: Int) = secs.slice(a, b).sum / (b - a)
      println(f"[stress] $tag%-44s d1 ${secs.head}%5.2f  " +
        f"d${n / 4} ${secs(n / 4 - 1)}%5.2f  " +
        f"d${n / 2} ${secs(n / 2 - 1)}%5.2f  " +
        f"d$n ${secs(n - 1)}%5.2f | block means " +
        f"${mean(0, n / 4)}%5.2f ${mean(n / 4, n / 2)}%5.2f " +
        f"${mean(n / 2, 3 * n / 4)}%5.2f ${mean(3 * n / 4, n)}%5.2f s")
    }
    if (only.forall(sel =>
        "r13 fold-count axis: table commit knn store".contains(sel))) {
      val deliveries =
        sys.env.getOrElse("SPARK_GRAFT_FOLD_DELIVERIES", "64").toInt
      val tcCorpus = corpus.filter(col("doc_id") % 10 =!= 0)
      def tcSlice(i: Int) = base
        .filter(col("doc_id") % 10 === 0 &&
          pmod(expr("doc_id div 10"), lit(deliveries)) === i)
        .select(col("doc_id").as("id"), col("text"))
      for (trigger <- Seq(false, true)) {
        val tag = if (trigger) "trigger ON " else "trigger OFF"
        var store: graft.dedup.TableCommit = null
        time(s"r13 fold-count tc deploy   [$tag]") {
          store = new graft.dedup.TableCommit(
            spark,
            java.nio.file.Files
              .createTempDirectory("graft_stress_tcn_").toString,
            8, 4, 8, autoCompact = trigger, compactDeltaRatio = 1e9,
            compactMaxDeltaFiles = 64L)
            .deploy(tcCorpus, "doc_id", "text")
        }
        val secs = (0 until deliveries).map { i =>
          val t0 = System.nanoTime()
          if (i % 8 == 7) store.retractBatch(tcSlice(i - 3).select("id"),
            10000L + i)
          else store.foldBatch(tcSlice(i), i.toLong)
          (System.nanoTime() - t0) / 1e9
        }.toArray
        blockReport(s"r13 fold-count tc per-delivery [$tag]", secs)
        val (cb, db, df, ops, gen) = store.maintenanceStats
        println(f"[stress] r13 fold-count tc state  [$tag] corpus " +
          f"${cb / 1e6}%8.1f MB, delta ${db / 1e6}%6.1f MB, $df%4d files, " +
          f"$ops%3d ops since compact, gen $gen%2d")
      }
      // KnnStore: same axis over the cell-partitioned index — here the
      // no-trigger cost driver is the max-ver window paying for every
      // superseded version (r12 verdict finding #3).
      val embAll = spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet")
      // Seeds must live in the corpus slice (vec_id % 9 != 8).
      val knnSeeds = (0 until 20).map(_ * 37L).filter(_ % 9 != 8).take(16)
      def knnSlice(i: Int) = embAll
        .filter(col("vec_id") % 9 === 8 &&
          pmod(expr("vec_id div 9"), lit(deliveries)) === i)
        .select("vec_id", "embedding")
      for (trigger <- Seq(false, true)) {
        val tag = if (trigger) "trigger ON " else "trigger OFF"
        var store: graft.similarity.KnnStore = null
        time(s"r13 fold-count knn deploy  [$tag]") {
          store = new graft.similarity.KnnStore(
            spark,
            java.nio.file.Files
              .createTempDirectory("graft_stress_knnn_").toString,
            nProbe = 2, k = 4, autoCompact = trigger,
            compactMaxVersions = 16L, compactMaxDeltaFiles = 48L)
            .deploy(embAll.filter(col("vec_id") % 9 =!= 8), knnSeeds)
        }
        val secs = (0 until deliveries).map { i =>
          val t0 = System.nanoTime()
          if (i % 8 == 7)
            store.retractBatch(knnSlice(i - 3).select("vec_id"), 10000L + i)
          else store.foldBatch(knnSlice(i), i.toLong)
          (System.nanoTime() - t0) / 1e9
        }.toArray
        blockReport(s"r13 fold-count knn per-delivery [$tag]", secs)
        val (ver, df, ops, gen) = store.maintenanceStats
        println(f"[stress] r13 fold-count knn state [$tag] ver $ver%3d, " +
          f"$df%4d delta files, $ops%3d ops since compact, gen $gen%2d")
      }
      // PqStore: append-only postings + tombstones — the no-trigger
      // cost drivers are delta file count and the gate's multi-path
      // delta union.
      val (pqCb, pqCodes) = graft.similarity.Ivf.pqArtifacts(
        embAll.filter(col("vec_id") % 9 =!= 8), knnSeeds,
        dims = 64, m = 4, iters = 2)
      val (pqCbC, pqCodesC) =
        (pqCb.localCheckpoint(true), pqCodes.localCheckpoint(true))
      def pqSlice(i: Int) = embAll
        .filter(col("vec_id") % 9 === 8 &&
          pmod(expr("vec_id div 9"), lit(deliveries)) === i)
        .select("vec_id", "embedding")
      for (trigger <- Seq(false, true)) {
        val tag = if (trigger) "trigger ON " else "trigger OFF"
        var store: graft.similarity.PqStore = null
        time(s"r13 fold-count pq deploy   [$tag]") {
          store = new graft.similarity.PqStore(
            spark,
            java.nio.file.Files
              .createTempDirectory("graft_stress_pqn_").toString,
            dims = 64, m = 4, autoCompact = trigger,
            compactDeltaRatio = 1e9, compactMaxDeltaFiles = 24L)
            .deploy(pqCodesC, pqCbC)
        }
        val secs = (0 until deliveries).map { i =>
          val t0 = System.nanoTime()
          if (i % 8 == 7)
            store.retractBatch(pqSlice(i - 3).select("vec_id"), 10000L + i)
          else store.foldBatch(pqSlice(i), i.toLong)
          (System.nanoTime() - t0) / 1e9
        }.toArray
        blockReport(s"r13 fold-count pq per-delivery [$tag]", secs)
        val (_, _, df, ops, gen) = store.maintenanceStats
        println(f"[stress] r13 fold-count pq state  [$tag] $df%4d delta " +
          f"files, $ops%3d ops since compact, gen $gen%2d")
      }
      // SentenceTable: signed-multiset hash rows + stored docs — the
      // no-trigger cost drivers are the multiset aggregation width and
      // the delta file count.
      def sentSlice(i: Int) = base
        .filter(col("doc_id") % 10 === 0 &&
          pmod(expr("doc_id div 10"), lit(deliveries)) === i)
        .select(col("doc_id").as("id"), col("text"))
      for (trigger <- Seq(false, true)) {
        val tag = if (trigger) "trigger ON " else "trigger OFF"
        var store: graft.dedup.SentenceTable = null
        time(s"r13 fold-count sent deploy [$tag]") {
          store = new graft.dedup.SentenceTable(
            spark,
            java.nio.file.Files
              .createTempDirectory("graft_stress_sentn_").toString,
            autoCompact = trigger, compactDeltaRatio = 1e9,
            compactMaxDeltaFiles = 24L)
            .deploy(corpus.filter(col("doc_id") % 10 =!= 0),
              "doc_id", "text")
        }
        val secs = (0 until deliveries).map { i =>
          val t0 = System.nanoTime()
          if (i % 8 == 7)
            store.retractBatch(sentSlice(i - 3).select("id"), 10000L + i)
          else store.foldBatch(sentSlice(i), i.toLong)
          (System.nanoTime() - t0) / 1e9
        }.toArray
        blockReport(s"r13 fold-count sent per-delivery [$tag]", secs)
        val (_, _, df, ops, gen) = store.maintenanceStats
        println(f"[stress] r13 fold-count sent state [$tag] $df%4d delta " +
          f"files, $ops%3d ops since compact, gen $gen%2d")
      }
    }

    // Round-15: the TAKEDOWN-FRACTION axis (r13 #6, carried through the
    // r14 verdict) — the fold-count stage above takes one takedown every
    // 8th delivery; a retraction-HEAVY workload looks different: every
    // 2nd delivery is a takedown (each fold fully retracted one delivery
    // later — the net store hovers at corpus size while the multiset /
    // tombstone machinery churns), plus ONE 50%-of-corpus bulk
    // retraction at the midpoint. Claims under test: KnnStore
    // .retractBatch's cost is DELETE-PROPORTIONAL (bounded by the
    // deleted vectors' appearance count — so per-slice takedowns stay
    // flat and the bulk costs ~a half-deploy re-score, not more), and
    // SentenceTable's signed-multiset shrink keeps per-delivery cost
    // flat as tombstones accumulate. Trigger ON (the production shape).
    if (only.forall(sel =>
        "r15 takedown fraction: knn sentence bulk".contains(sel))) {
      val deliveries =
        sys.env.getOrElse("SPARK_GRAFT_FOLD_DELIVERIES", "64").toInt
      val embAll = spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet")
      val knnSeeds = (0 until 20).map(_ * 37L).filter(_ % 9 != 8).take(16)
      def knnSlice(i: Int) = embAll
        .filter(col("vec_id") % 9 === 8 &&
          pmod(expr("vec_id div 9"), lit(deliveries)) === i)
        .select("vec_id", "embedding")
      locally {
        var store: graft.similarity.KnnStore = null
        time("r15 takedown-fraction knn deploy") {
          store = new graft.similarity.KnnStore(
            spark,
            java.nio.file.Files
              .createTempDirectory("graft_stress_knntf_").toString,
            nProbe = 2, k = 4, autoCompact = true,
            compactMaxVersions = 16L, compactMaxDeltaFiles = 48L)
            .deploy(embAll.filter(col("vec_id") % 9 =!= 8), knnSeeds)
        }
        val foldSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
        val retrSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
        var bulkSec = 0.0
        for (i <- 0 until deliveries) {
          val t0 = System.nanoTime()
          if (i % 2 == 0) {
            store.foldBatch(knnSlice(i), i.toLong)
            foldSecs += (System.nanoTime() - t0) / 1e9
          } else {
            store.retractBatch(knnSlice(i - 1).select("vec_id"), 10000L + i)
            retrSecs += (System.nanoTime() - t0) / 1e9
          }
          if (i == deliveries / 2) {
            // The 50%-corpus bulk retraction: every even corpus id.
            val t1 = System.nanoTime()
            store.retractBatch(
              embAll.filter(col("vec_id") % 9 =!= 8 &&
                col("vec_id") % 2 === 0).select("vec_id"), 20000L)
            bulkSec = (System.nanoTime() - t1) / 1e9
          }
        }
        blockReport("r15 takedown-fraction knn folds", foldSecs.toArray)
        blockReport("r15 takedown-fraction knn retracts", retrSecs.toArray)
        println(f"[stress] r15 takedown-fraction knn bulk 50%% retract " +
          f"$bulkSec%6.2f s (delete-proportional claim: ~half-deploy " +
          "re-score, not corpus-quadratic)")
        val (ver, df, ops, gen) = store.maintenanceStats
        println(f"[stress] r15 takedown-fraction knn state ver $ver%3d, " +
          f"$df%4d delta files, $ops%3d ops since compact, gen $gen%2d, " +
          f"surviving edges ${store.directedEdges.count()}%d")
      }
      def sentSliceTf(i: Int) = base
        .filter(col("doc_id") % 10 === 0 &&
          pmod(expr("doc_id div 10"), lit(deliveries)) === i)
        .select(col("doc_id").as("id"), col("text"))
      locally {
        var store: graft.dedup.SentenceTable = null
        time("r15 takedown-fraction sent deploy") {
          store = new graft.dedup.SentenceTable(
            spark,
            java.nio.file.Files
              .createTempDirectory("graft_stress_senttf_").toString,
            autoCompact = true, compactDeltaRatio = 1e9,
            compactMaxDeltaFiles = 24L)
            .deploy(base.filter(col("doc_id") % 10 =!= 0),
              "doc_id", "text")
        }
        val foldSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
        val retrSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
        var bulkSec = 0.0
        for (i <- 0 until deliveries) {
          val t0 = System.nanoTime()
          if (i % 2 == 0) {
            store.foldBatch(sentSliceTf(i), i.toLong)
            foldSecs += (System.nanoTime() - t0) / 1e9
          } else {
            store.retractBatch(sentSliceTf(i - 1).select("id"), 10000L + i)
            retrSecs += (System.nanoTime() - t0) / 1e9
          }
          if (i == deliveries / 2) {
            val t1 = System.nanoTime()
            store.retractBatch(
              base.filter(col("doc_id") % 10 =!= 0 &&
                col("doc_id") % 2 === 0)
                .select(col("doc_id").as("id")), 20000L)
            bulkSec = (System.nanoTime() - t1) / 1e9
          }
        }
        blockReport("r15 takedown-fraction sent folds", foldSecs.toArray)
        blockReport("r15 takedown-fraction sent retracts", retrSecs.toArray)
        println(f"[stress] r15 takedown-fraction sent bulk 50%% retract " +
          f"$bulkSec%6.2f s (multiset shrink: one pruned docs read + " +
          "delete-sized −1 append)")
        val (_, _, df, ops, gen) = store.maintenanceStats
        println(f"[stress] r15 takedown-fraction sent state $df%4d delta " +
          f"files, $ops%3d ops since compact, gen $gen%2d, surviving " +
          f"hashes ${store.presentHashes.count()}%d")
      }
    }

    // Round-15: PARTIAL vs FULL refresh — the crossover the §9 design
    // note argues: refreshCells re-derives edges only for provably
    // affected queries (probe-set or membership change), so its cost
    // should track the AFFECTED fraction, not the corpus, while the
    // full refresh() tracks the deploy. Two identically-prepared
    // stores, one op each.
    // Cell count matters: at the oracle queries' K=8, moving 2 centroids
    // perturbs nearly every query's top-nProbe ranking (measured: 2000
    // of 2000 affected — the uniform-drift regime where partial
    // HONESTLY degrades to full + bookkeeping, as §9 argues). The
    // locality the partial path exists for appears at production cell
    // counts — 64 cells here — where 2 drifted cells touch only the
    // queries probing them.
    if (only.forall(sel =>
        "r15 partial refresh: knn cells full".contains(sel))) {
      val embAll = spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet")
      // Multiples of 27 are ≡ 0 (mod 9) — all corpus-side of the split.
      val canonIds = (0 until 64).map(_ * 27L)
      def prepped(tag: String): graft.similarity.KnnStore = {
        var st: graft.similarity.KnnStore = null
        time(s"r15 partial-refresh deploy+fold [$tag]") {
          st = new graft.similarity.KnnStore(
            spark,
            java.nio.file.Files
              .createTempDirectory(s"graft_stress_pref_$tag").toString,
            nProbe = 2, k = 4)
            .deploy(embAll.filter(col("vec_id") % 9 =!= 8), canonIds)
          st.foldBatch(
            embAll.filter(col("vec_id") % 9 === 8)
              .select("vec_id", "embedding"), 0L)
        }
        st
      }
      val full = prepped("full")
      time("r15 partial-refresh FULL refresh (64/64 cells)") {
        full.refresh((0 until 64).map(_ * 27L + 9L))
      }
      val part = prepped("cells")
      var counts = (0L, 0L)
      time("r15 partial-refresh refreshCells (2/64 cells)") {
        counts = part.refreshCells(Map(5L -> 500L, 40L -> 700L))
      }
      val nQueries = part.directedEdges.select("q_vec_id").distinct().count()
      println(f"[stress] r15 partial-refresh affected ${counts._1}%d of " +
        f"$nQueries%d queries, ${counts._2}%d cells with membership " +
        "change — partial cost should track the affected fraction")
    }

    // Round-16: the partial-refresh WIN regime + the regime guard —
    // §6's r15 rows measured only the LOSING (uniform-drift) side:
    // replacements far from the old centroids perturb nearly every
    // query's top-nProbe ranking, so the carry path re-scored
    // everything plus bookkeeping. This stage measures the crossover
    // from BOTH sides:
    //   (a) CLUSTERED drift — each replacement is the surviving stored
    //       vector NEAREST to its old centroid (computed here, not
    //       assumed), so probe-set changes stay local to the drifted
    //       cells and the affected fraction is small by construction:
    //       partial should now beat the full rebuild;
    //   (b) UNIFORM drift under the DEFAULT guard — refreshCells
    //       computes the affected fraction first and falls back to the
    //       from-scratch edge build above 50%, so the r15 penalty
    //       (full cost + carry bookkeeping) should collapse to ≈ full.
    // Measurement note (first r16 attempt): on the SYNTHETIC UNIFORM
    // sf0.1 embeddings even the stored vector NEAREST to a drifted
    // centroid is no "small move" — high-dim uniform distances
    // concentrate, so 2 nearest-member replacements still flipped
    // 97.3% of probe sets (1946/2000 affected, 53/64 cells with
    // membership churn). The win regime REQUIRES genuinely clustered
    // geometry — which is the production case (real embedding spaces
    // are clustered; that is why IVF works at all) — so this stage
    // builds one: 64 well-separated synthetic clusters (center scale
    // 10, intra-cluster noise 0.01), drift = re-pointing 2 cells'
    // centroids to OTHER MEMBERS OF THE SAME CLUSTER.
    if (only.forall(sel =>
        "r16 partial refresh crossover: clustered guard".contains(sel))) {
      // Sized so the EDGE RE-SCORE dominates (the cost the carry path
      // exists to avoid): 60k vectors × 64 dims × 16 cells → ~3.7k
      // members/cell, so the full rebuild's score join is ~29G
      // multiply-adds while the corpus-wide probe/assignment recompute
      // BOTH paths share is ~500× smaller (60k × 16 centroids). An
      // earlier 64-cell attempt showed the tie regime honestly: there
      // the shared re-quantization dominates and partial ≈ full even
      // at 0 affected (13.05 vs 12.83 s) — the win requires the
      // re-score to be the big term, which is exactly the
      // many-members-per-cell shape a 100 TB IVF runs at. Noise 0.5
      // against center scale 10 keeps clusters unambiguous but lets
      // boundary queries genuinely flip.
      val nVec = 60000L
      val kCells = 16
      val clustered = spark.range(nVec).select(
        col("id").as("vec_id"),
        expr(s"transform(sequence(1, 64), j -> CAST(" +
          s"10.0 * sin((id % $kCells) * (j * 2.3 + 1.0) + j) + " +
          "0.5 * sin(id * 0.7 + j * 1.3) AS DOUBLE))").as("embedding"))
        .localCheckpoint(true)
      // One seed per cluster: vec_id 0..63 (id % 64 == id there).
      val seeds = (0L until kCells.toLong)
      def prepped(tag: String): graft.similarity.KnnStore = {
        var st: graft.similarity.KnnStore = null
        time(s"r16 crossover deploy [$tag]") {
          st = new graft.similarity.KnnStore(
            spark,
            java.nio.file.Files
              .createTempDirectory(s"graft_stress_xover_$tag").toString,
            nProbe = 2, k = 4)
            .deploy(clustered, seeds)
        }
        st
      }
      // Intra-cluster drift: cells 5 and 11 re-point to members 21 and
      // 27 (same clusters: 21 % 16 = 5, 27 % 16 = 11).
      val repl = Map(5L -> 21L, 11L -> 27L)
      val pc = prepped("part")
      var counts = (0L, 0L)
      time("r16 crossover CLUSTERED refreshCells (default guard)") {
        counts = pc.refreshCells(repl)
      }
      println(f"[stress] r16 crossover clustered affected ${counts._1}%d " +
        f"of $nVec%d queries (${100.0 * counts._1 / nVec}%.1f%%), " +
        f"${counts._2}%d cells moved members")
      val fc = prepped("full")
      val mixedIds = seeds.map(id => repl.getOrElse(id, id))
      time("r16 crossover CLUSTERED full refresh (same mixed set)") {
        fc.refresh(mixedIds)
      }
      // (b) uniform drift under the DEFAULT guard, on the real sf0.1
      // embeddings (the r15 losing fixture): the affected fraction
      // trips the 50% guard, so the cost should collapse to ≈ the full
      // rebuild instead of r15's full + carry bookkeeping.
      val embAll = spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet")
      val canonIds = (0 until 64).map(_ * 27L)
      var ug: graft.similarity.KnnStore = null
      time("r16 crossover uniform deploy+fold") {
        ug = new graft.similarity.KnnStore(
          spark,
          java.nio.file.Files
            .createTempDirectory("graft_stress_xover_unif").toString,
          nProbe = 2, k = 4)
          .deploy(embAll.filter(col("vec_id") % 9 =!= 8), canonIds)
        ug.foldBatch(
          embAll.filter(col("vec_id") % 9 === 8)
            .select("vec_id", "embedding"), 0L)
      }
      time("r16 crossover UNIFORM refreshCells (default guard=0.5)") {
        counts = ug.refreshCells(Map(5L -> 500L, 40L -> 700L))
      }
      println(f"[stress] r16 crossover uniform affected ${counts._1}%d " +
        "(guard should have taken the full-rebuild path)")
      graft.Ckpt.release(clustered)
    }

    // Round-14: the REFRESH axis — retrain-and-swap cost in context.
    // A refresh re-derives the full index over the survivors
    // (retraining IS a rebuild — that is why it is the deliberate,
    // monitor-triggered decision), so its wall time should track the
    // DEPLOY's, not the per-delivery fold's; the value of the face is
    // the one-marker atomic swap, not a cheaper rebuild. This stage
    // prints deploy / one-fold / refresh side by side for the two
    // stores with trained artifacts so the ratio is measured, not
    // assumed.
    if (only.forall(sel => "r14 refresh axis: knn pq".contains(sel))) {
      val embAll = spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet")
      val corpusE = embAll.filter(col("vec_id") % 9 =!= 8)
      val batchE = embAll.filter(col("vec_id") % 9 === 8)
        .select("vec_id", "embedding")
      val seeds = (0 until 20).map(_ * 37L).filter(_ % 9 != 8).take(16)
      val altSeeds = (0 until 30).map(_ * 19L).filter(_ % 9 != 8).take(16)
      var kst: graft.similarity.KnnStore = null
      time("r14 refresh knn deploy (alt quantizer)") {
        kst = new graft.similarity.KnnStore(
          spark,
          java.nio.file.Files
            .createTempDirectory("graft_stress_kref_").toString,
          nProbe = 2, k = 4)
          .deploy(corpusE, altSeeds)
      }
      time("r14 refresh knn one fold") { kst.foldBatch(batchE, 0L) }
      time("r14 refresh knn REFRESH to canonical") { kst.refresh(seeds) }
      var pst: graft.similarity.PqStore = null
      time("r14 refresh pq train+deploy") {
        val (cb, codes) = graft.similarity.Ivf.pqArtifacts(
          corpusE, seeds, dims = 64, m = 4, iters = 2)
        pst = new graft.similarity.PqStore(
          spark,
          java.nio.file.Files
            .createTempDirectory("graft_stress_pref_").toString,
          dims = 64, m = 4)
          .deploy(codes, cb)
      }
      time("r14 refresh pq one fold") { pst.foldBatch(batchE, 0L) }
      time("r14 refresh pq REFRESH (retrain on survivors)") {
        pst.refresh(embAll, seeds, 2)
      }
    }

    // Round-14: INCREMENTAL PAGERANK in context — the warm-start +
    // exact-frontier delta-push vs the cold rebuild on one synthetic
    // graph (ring + hash chords over the corpus row count; the old
    // graph is the 95% prefix, the delta adds the last 5%). At 100 TB
    // the warm base is the STORED rank table (already paid before the
    // delta arrives), so the number that matters is the incremental
    // phase's cost relative to the cold rebuild.
    if (only.forall(sel =>
        "r14 incremental pagerank axis".contains(sel))) {
      import graft.queries.PipelineQueries
      val n = corpus.count()
      val verts = spark.range(n).select(col("id").as("v"))
      val edgesAll = spark.range(n)
        .select(col("id").as("id_a"),
          pmod(col("id") * 7L + 3L, lit(n)).as("id_b"))
        .unionByName(spark.range(n)
          .select(col("id").as("id_a"), pmod(col("id") + 1L, lit(n)).as("id_b")))
        .filter(col("id_a") =!= col("id_b"))
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
        .distinct()
        .localCheckpoint(true)
      val cut = (n * 95L) / 100L
      val edgesOld = edgesAll
        .filter(col("id_a") < cut && col("id_b") < cut)
        .localCheckpoint(true)
      val vertsOld = verts.filter(col("v") < cut)
      println(s"[stress] r14 incremental pagerank graph |V|=$n |E|=" +
        s"${edgesAll.count()} (old cut at $cut)")
      time("r14 incremental pagerank COLD full rebuild (5 iters)")(
        noop(PipelineQueries.pagerankOverEdges(edgesAll, verts)))
      time("r14 incremental pagerank warm base (old graph, 5 iters)")(
        noop(PipelineQueries.pagerankOverEdges(edgesOld, vertsOld)))
      time("r14 incremental pagerank warm + 1 full + 2 frontier steps")(
        noop(PipelineQueries.pagerankIncrementalOverEdges(
          edgesOld, vertsOld, edgesAll, verts)))
      // FRONTIER CONTRACTION — the structural question: the frontier
      // prune skips only provably-unchanged vertices, so its win
      // depends on how far the delta's influence cone spreads per
      // step. Two graphs, same |V| and delta: the CHORDAL one above
      // (id → id·7+3 mod n — expander-like long-range edges, any
      // delta's cone covers the graph in ~2 hops, the frontier
      // honestly cannot contract) vs a LOCAL one (id → id+1, id+2 —
      // the mutual-kNN shape: neighbors are near, the cone crawls).
      // q_pagerank_residual is the per-graph monitor that tells an
      // operator which regime their graph is in. Measured, not
      // assumed.
      val eLocal1 = spark.range(n - 1)
        .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
      val eLocal2 = spark.range(n - 2)
        .select(col("id").as("id_a"), (col("id") + 2L).as("id_b"))
      val edgesLocal = eLocal1.unionByName(eLocal2).localCheckpoint(true)
      val edgesLocalOld = edgesLocal
        .filter(col("id_a") < cut && col("id_b") < cut)
        .localCheckpoint(true)
      for ((tag, eAll, eOld) <- Seq(
          ("chordal", edgesAll, edgesOld),
          ("local  ", edgesLocal, edgesLocalOld));
          warmDepth <- Seq(5, 25)) {
        val (dirF, degF) = PipelineQueries.pagerankDirDeg(
          eAll.select("id_a", "id_b"))
        val (dirO, degO) = PipelineQueries.pagerankDirDeg(
          eOld.select("id_a", "id_b"))
        var r = vertsOld.withColumn("r", lit(1000000L)).localCheckpoint(true)
        for (_ <- 1 to warmDepth)
          r = PipelineQueries.pagerankStep(r, dirO, degO, vertsOld)
            .localCheckpoint(true)
        var cur = verts
          .join(r.select(col("v"), col("r").as("wr")), Seq("v"), "left")
          .select(col("v"), coalesce(col("wr"), lit(1000000L)).as("r"))
          .localCheckpoint(true)
        val sizes = (1 to 3).map { _ =>
          val nxt = PipelineQueries.pagerankStep(cur, dirF, degF, verts)
            .localCheckpoint(true)
          val changed = cur.select(col("v"), col("r").as("rp"))
            .join(nxt, Seq("v"))
            .filter(col("r") =!= col("rp"))
            .count()
          cur = nxt
          changed
        }
        println(f"[stress] r14 incremental pagerank frontier " +
          f"[$tag, warm depth $warmDepth%2d]: ${sizes.mkString(" -> ")} " +
          f"changed of $n verts")
      }
    }

    // Offset-stage A/B at FIXED sizes (does not scale with replicas):
    // the lang-keyed window sorts each language's doc rows in ONE task;
    // the hierarchical prefix sum spreads the same work over
    // (lang, id-range) buckets. The distribution matters: with EQUAL
    // languages the window gets #langs-way parallelism and its smaller
    // constant factor wins locally — the realistic shape is one
    // dominant language (~95% here, like any web corpus), where the
    // window's single sorting task is the critical path and grows
    // super-linearly (sort spill) while the hierarchical path stays
    // linear. Two sizes record the curve, not one point.
    def syntheticNDoc(nRows: Long) = spark.range(nRows).select(
      col("id").as("doc_id"),
      when(col("id") % 20 === 0, concat(lit("l"), col("id") % 4))
        .otherwise(lit("en")).as("lang"),
      (col("id") % 997 + 1L).as("n"))
    for (nRows <- Seq(20000000L, 50000000L)) {
    time(f"doc offsets ${nRows / 1000000}%dM: lang window (anti-pattern)") {
      import org.apache.spark.sql.expressions.Window
      noop(syntheticNDoc(nRows).withColumn(
        "off",
        coalesce(
          sum(col("n") + 1L).over(
            Window.partitionBy("lang").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L))))
    }
    time(f"doc offsets ${nRows / 1000000}%dM: hierarchical prefix sum") {
      val nDoc = syntheticNDoc(nRows).withColumn("sz", col("n") + 1L)
      val cum = graft.operators.PrefixSum.globalCumsum(
        nDoc,
        bucket = format_string(
          "%s\u0001%020d", col("lang"), expr("doc_id div 65536")),
        order = Seq(col("lang"), col("doc_id")),
        value = col("sz"),
        out = "gcum")
      val totals = nDoc.groupBy("lang").agg(sum(col("sz")).as("t"))
        .orderBy("lang").collect()
      var acc = 0L
      val offs = totals.map { r =>
        val o = acc; acc += r.getLong(1); (r.getString(0), o)
      }.toSeq
      import spark.implicits._
      noop(cum
        .join(broadcast(offs.toDF("lang", "lang_off")), Seq("lang"))
        .withColumn("off", col("gcum") - col("sz") - col("lang_off")))
    }
    }
    // Round-7: windowFamily A/B at FIXED sizes, same shape as the offset
    // A/B above — lag/lead/ntile/cume over an event_type window sorts
    // each type's entire history in ONE task (with a ~95%-dominant type,
    // that single sort is the critical path and grows super-linearly),
    // vs PrefixSum.partitionedAnalytics' (type, id-range)-bucket window
    // + bounded stitch, which stays linear.
    def syntheticEvents(nRows: Long) = spark.range(nRows).select(
      col("id").as("event_id"),
      when(col("id") % 20 === 0, concat(lit("t"), col("id") % 4))
        .otherwise(lit("click")).as("event_type"),
      (col("id") % 997).as("value_cents"))
    for (nRows <- Seq(20000000L, 50000000L)) {
      time(f"window family ${nRows / 1000000}%dM: event_type window (anti-pattern)") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type").orderBy("event_id")
        noop(syntheticEvents(nRows).select(
          col("event_id"), col("event_type"), col("value_cents"),
          lag("value_cents", 1).over(w).as("prev_cents"),
          lead("value_cents", 1).over(w).as("next_cents"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(cume_dist().over(w), 6).as("cume")))
      }
      time(f"window family ${nRows / 1000000}%dM: prefix-sum analytics") {
        noop(graft.queries.EventQueries.windowFamilyFrom(
          syntheticEvents(nRows)))
      }
    }
    // Streaming OOO sessionizer throughput: replicas× the events table
    // with per-replica user AND time offsets (a longer, wider stream in
    // time order across files, disordered within), default 30-min
    // lateness horizon, noop sink. Cost must track event count; state
    // stays bounded by the horizon because the watermark advances with
    // the replicated timeline.
    // Round-9: the stateless semantic-decontamination ingest gate
    // through the real streaming runtime — per-arrival cost must be
    // flat (probe 8 literal centroids, score only same-cell holdout
    // docs); the literal artifacts do NOT grow with the corpus. This
    // curve exists because the first cut of the gate hid an 18× cost
    // in exactly this stage shape (the CollapseProject lambda-inlining
    // pitfall documented at the expression site).
    time("stream decontam gate (stream)") {
      val dir = java.nio.file.Files.createTempDirectory("stress_emb_drop")
      (0 until replicas).foreach { r =>
        embBase.select(
          (col("vec_id") + lit(r * 10000000L)).as("vec_id"),
          col("embedding"), col("label"))
          .coalesce(1).write.mode("append").parquet(dir.toString)
      }
      val cent = graft.similarity.Ivf.fixedCentroidsDouble(
        embBase.filter(col("vec_id") % 13 =!= 0), (1 to 8).map(_ * 37L))
        .localCheckpoint(true)
      val arrivals = spark.readStream
        .schema(spark.read.parquet(dir.toString).schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(dir.toString)
        .filter(col("vec_id") % 13 =!= 0)
      val q = graft.queries.StreamingQueries
        .decontamGateStream(
          arrivals, cent, embBase.filter(col("vec_id") % 13 === 0))
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("stress_gate_ckpt").toString)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    time("gap sessions buffered (stream)") {
      val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.1")
      val bounds = ev.agg(
        min(unix_millis(col("ts"))), max(unix_millis(col("ts")))).head()
      val spanMs = bounds.getLong(1) - bounds.getLong(0) + 3600000L
      val dir = java.nio.file.Files.createTempDirectory("stress_events")
      (0 until replicas).foreach { r =>
        // ts = raw NANOS-long (ms × 1e6): the repo-wide LongType unit
        // (see Tables.normalizeEventTs).
        ev.select(
          col("event_id"),
          ((unix_millis(col("ts")) + lit(r * spanMs)) * 1000000L).as("ts"),
          (col("user_id") + lit(r * 10000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
          .coalesce(1).write.mode("append").parquet(dir.toString)
      }
      val stream = Tables.normalizeEventTs(
        spark.readStream
          .schema(graft.streaming.StreamingOps.eventsRawSchema)
          .option("maxFilesPerTrigger", "2")
          .parquet(dir.toString))
      val q = graft.streaming.StreamingOps
        .gapSessionsBuffered(spark, stream).toDF()
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("stress_ckpt").toString)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    corpus.unpersist()
    spark.stop()
  }
}
