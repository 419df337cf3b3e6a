package graft.dedup

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Planted-duplicate sanity for the dedup operators. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    // near-dup of 0: one word changed
    (1L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    // unrelated
    (3L, "completely different content about databases and distributed query engines"),
    (4L, "spark catalyst optimizer rewrites logical plans into efficient physical plans")
  ).toDF("doc_id", "text")

  test("exactGroups collapses exact duplicates to the min id") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    val dupGroup = groups.find(_.getAs[Long]("n_dups") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 0L)
    assert(groups.length == 4)
  }

  test("connected components labels every node with its component min") {
    import spark.implicits._
    // Path 1-2-3-4 (diameter 3: needs >1 propagation round), pair 7-6,
    // and 9-8 + 8-5 sharing node 8.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 6L), (9L, 8L), (8L, 5L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      6L -> 6L, 7L -> 6L,
      5L -> 5L, 8L -> 5L, 9L -> 5L))
  }

  test("connected components converges on a 13-node chain (diameter 12)") {
    import spark.implicits._
    val pairs = (1L until 13L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // driverEdgeLimit = 0 forces the DISTRIBUTED label-prop loop — this
    // test exists to pin the loop's convergence, not the fast path.
    val got = Dedup.connectedComponents(pairs, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 13 && got.values.forall(_ == 1L))
  }

  test("driver union-find fast path equals the distributed loop") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 6L), (9L, 8L), (8L, 5L))
      .toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
  }

  test("null-id edges are dropped identically on both CC paths") {
    import spark.implicits._
    // A null id carries no connectivity; before the shared filter the
    // driver fast path NPE'd on getLong while the distributed loop's
    // joins dropped the edge silently — divergent paths, same input.
    val pairs = Seq(
      (Option(1L), Option(2L)), (Option(2L), Option(3L)),
      (None: Option[Long], Option(9L)), (Option(9L), None: Option[Long]),
      (Option(7L), Option(6L))
    ).toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 6L -> 6L, 7L -> 6L)
    val fast = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == expected)
    assert(dist == expected)
  }

  test("drop-list bloom is sized from the observed drop count") {
    import graft.functions.Bloom
    // Tiny lists keep the comfortable default …
    assert(Dedup.dropListBloomBits(0L).contains(Bloom.DefaultNumBits))
    assert(Dedup.dropListBloomBits(1000L).contains(Bloom.DefaultNumBits))
    // … a 1M-id list grows to the next power of two covering 10 bits/key …
    assert(Dedup.dropListBloomBits(1000000L).contains(1 << 24))
    // … and past maxBits/bitsPerKey the filter would saturate (FP → 1,
    // zero pruning for an extra corpus scan) so no filter is built.
    val cap = Dedup.DropListMaxBits.toLong / Dedup.DropListBitsPerKey
    assert(Dedup.dropListBloomBits(cap).nonEmpty)
    assert(Dedup.dropListBloomBits(cap + 1).isEmpty)
  }

  test("applyDropList picks bloom-gated vs plain anti-join by drop count") {
    import spark.implicits._
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // deterministic filter over a LocalTableScan away at optimization
    // time and the probe would never appear in the executed plan string.
    val corpus = spark.range(100).toDF("id")
    val drops = Seq(3L, 5L, 7L).toDF("id")
    val expected = (0L until 100L).filterNot(Set(3L, 5L, 7L))
    val gated = Dedup.applyDropList(corpus, drops, "id")
    assert(gated.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"),
      "small drop list must take the bloom-gated path")
    assert(gated.collect().map(_.getLong(0)).sorted.toSeq == expected)
    // maxBits=16 makes even 3 drop ids "too many" (16/10 = 1) — the
    // saturation branch must skip the bloom entirely and still be exact.
    val plain = Dedup.applyDropListSized(
      corpus, drops, "id", bitsPerKey = 10, maxBits = 16)
    assert(!plain.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"),
      "saturated regime must not build a useless filter")
    assert(plain.collect().map(_.getLong(0)).sorted.toSeq == expected)
  }

  test("applyDropList skips its checkpoint when the drop list already replays cheaply") {
    import spark.implicits._
    val corpus = spark.range(50).toDF("id")
    // A caller-materialized drop source with narrow ops on top — the
    // dedupKeeplist shape (dupComponents memo → filter → project).
    val ckpt = spark.range(10).toDF("id")
      .filter(col("id") % 3 === 0).localCheckpoint(true)
    val drops = ckpt.filter(col("id") > 0)
    val out = Dedup.applyDropList(corpus, drops, "id")
    // The anti-join side must reuse the caller's materialized RDD — a
    // second localCheckpoint would surface as a NEW LogicalRDD over a
    // different RDD id (the double materialization this guards against).
    val callerRdd = ckpt.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.head
    val outRdds = out.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(outRdds.contains(callerRdd),
      s"drop keys re-checkpointed: caller rdd $callerRdd not in $outRdds")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 50L).filterNot(Set(3L, 6L, 9L)))
  }

  test("incremental ngram Jaccard generates batch-vs-corpus pairs only") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      // Identical corpus pair — must never pair up.
      (2L, "alpha beta gamma delta epsilon zeta", "en"),
      (3L, "one two three four five six seven", "en")
    ).toDF("doc_id", "text", "lang")
    val batch = Seq(
      // Identical batch pair — must never pair up.
      (10L, "red green blue cyan magenta yellow", "en"),
      (11L, "red green blue cyan magenta yellow", "en"),
      // Identical to corpus doc 3 → the one expected pair, jaccard 1.
      (12L, "one two three four five six seven", "en")
    ).toDF("doc_id", "text", "lang")
    val out = Dedup
      .ngramJaccardIncremental(
        corpus, batch, "doc_id", "text", col("lang"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(out == Seq((12L, 3L, 1.0)))
  }

  test("star CC matches label propagation on a mixed component graph") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 6L), (9L, 8L), (8L, 5L))
      .toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("star CC converges in O(log n) rounds on a 1001-node chain") {
    import spark.implicits._
    // Diameter 1000: label propagation would need 1000 rounds; the
    // alternating large-star/small-star recipe contracts the chain
    // geometrically.
    val pairs = (1L until 1001L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.ccStarWithRounds(pairs, maxIter = 30)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 1001 && got.values.forall(_ == 1L))
    assert(rounds <= 15, s"took $rounds rounds — not O(log n)")
  }

  test("simhashNoShuffle equals the explode+agg simhash") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Dedup.simhash(docs, "doc_id", "text")
      .withColumnRenamed("simhash", "a")
    val b = Dedup.simhashNoShuffle(docs, "doc_id", "text")
      .withColumnRenamed("simhash", "b")
    val diff = a.join(b, Seq("id"), "full")
      .filter(col("a").isNull || col("b").isNull || col("a") =!= col("b"))
      .count()
    assert(diff == 0)
  }

  test("minhash LSH finds the planted near-dup pair and skips unrelated") {
    // bands == numHashes (1 row per band) maximizes candidate recall:
    // a Jaccard-0.6 pair collides in a band with p=0.6 per hash, so with
    // 8 single-row bands a miss needs all 8 to fail (p≈0.07%) — and the
    // fixed hash family makes the outcome deterministic either way. The
    // 2-rows-per-band layout the pipeline defaults to is precision-tuned
    // and may legitimately miss a 0.6 pair; candidate recall mechanics,
    // not band tuning, are what this test pins.
    val pairs = Dedup
      .minhashDuplicates(docs, "doc_id", "text", numHashes = 8, bands = 8,
        threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    // 0-1 near-dup, 0-2 exact, 1-2 near-dup must all surface.
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((1L, 2L)))
    // Unrelated docs never pair with the fox docs.
    assert(!pairs.exists { case (a, b) => b >= 3L || a >= 3L })
  }

  test("exact duplicates have jaccard 1.0") {
    val pairs = Dedup
      .minhashDuplicates(docs, "doc_id", "text", 8, 4, 0.5)
      .filter(col("id_a") === 0 && col("id_b") === 2)
      .collect()
    assert(pairs.length == 1 && pairs.head.getAs[Double]("jaccard") == 1.0)
  }

  test("simhash of identical texts is identical; near-dups are close") {
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(0L) == sh(2L))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(3L)))
  }

  test("simhashDuplicates surfaces the exact-dup pair at hamming 0") {
    val pairs = Dedup
      .simhashDuplicates(docs, "doc_id", "text", maxHamming = 3, blocks = 4)
      .collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Long]("hamming")))
      .toMap
    assert(pairs.get((0L, 2L)).contains(0L))
  }

  test("blocked ngram jaccard respects the block") {
    val blocked = Seq(
      (0L, "a", "one two three four five six"),
      (1L, "a", "one two three four five seven"),
      (2L, "b", "one two three four five six")
    ).toDF("doc_id", "blk", "text")
    val pairs = Dedup
      .ngramJaccardBlocked(blocked, "doc_id", "text", col("blk"), 0.1)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    // 0-1 share block "a"; 0-2 identical text but different block → excluded.
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("duplicate spans merge overlapping windows into interval unions") {
    // Docs 0 and 1 share a 10-token run -> three 8-token duplicate
    // windows each (pos p, p+1, p+2) that must merge to ONE island of
    // exactly 10 tokens, not 24. Doc 2 shares nothing.
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (0L, s"a1 a2 $shared b1 b2"),
      (1L, s"c1 $shared d1 d2 d3"),
      (2L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12 e13 e14")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", w = 8, minDocs = 2L)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_islands"),
          r.getAs[Long]("dup_tokens")))
      .toMap
    assert(got(0L) == ((3L, 1L, 10L)))
    assert(got(1L) == ((3L, 1L, 10L)))
    assert(got(2L) == ((0L, 0L, 0L)))
  }

  test("removeDuplicateSpans: keeper keeps, others are excised by interval union") {
    // w=4: docs 0 and 1 share the 6-token run "a b c d e f" -> three
    // duplicate 4-windows. Keeper (min doc id) = 0 keeps everything;
    // doc 1's windows at pos 2,3,4 union to [2, 8) -> "a b c d e f"
    // excised, leaving "z1 z2 q1". Doc 2 shares nothing.
    val docs = Seq(
      (0L, "a b c d e f k1 l1"),
      (1L, "z1 z2 a b c d e f q1"),
      (2L, "m1 n1 o1 p1")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "doc_id", "text", w = 4, minDocs = 2L)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))))
      .toMap
    assert(got(0L) == ((8L, 8L, 0L, "a b c d e f k1 l1")))
    assert(got(1L) == ((9L, 3L, 6L, "z1 z2 q1")))
    assert(got(2L) == ((4L, 4L, 0L, "m1 n1 o1 p1")))
  }

  test("removeDuplicateSpans: rewritten corpus has zero removable span mass") {
    // The rewrite's target invariant, holding whenever excision
    // junctions don't collide into new cross-doc windows (they don't on
    // this fixture; see the operator scaladoc's single-pass caveat):
    // each duplicate fingerprint survives only in its keeper doc, so a
    // re-scan by the DETECTOR finds nothing left to remove.
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (0L, s"a1 a2 $shared b1 b2"),
      (1L, s"c1 $shared d1 d2 d3"),
      (2L, s"$shared e1 e2 e3 e4"),
      (3L, "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12")
    ).toDF("doc_id", "text")
    val clean = Dedup.removeDuplicateSpans(docs, "doc_id", "text", w = 8, minDocs = 2L)
      .select(col("id").as("doc_id"), col("clean_text"))
    val rescan = Dedup.duplicateSpans(clean, "doc_id", "clean_text", w = 8, minDocs = 2L)
    val residual = rescan.agg(sum("dup_tokens")).collect().head.getLong(0)
    assert(residual == 0L,
      s"re-scan of the rewritten corpus must find zero duplicate-span mass, got $residual")
    // Keeper (doc 0) is untouched.
    val keeperText = clean.filter(col("doc_id") === 0L)
      .collect().head.getAs[String]("clean_text")
    assert(keeperText == s"a1 a2 $shared b1 b2")
  }

  test("removeDuplicateSpansIncremental: corpus-present windows excised, batch-only dups kept") {
    // w=4: batch doc 10 repeats corpus doc 0's 6-token run -> excised.
    // Batch docs 11 and 12 share a run found NOWHERE in the corpus: the
    // batch×corpus discipline must leave BOTH intact (no batch×batch).
    val corpus = Seq(
      (0L, "a b c d e f k1 l1"),
      (1L, "m1 n1 o1 p1 q1 r1")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "z1 z2 a b c d e f q1"),
      (11L, "u1 u2 u3 u4 u5 v1"),
      (12L, "w1 u1 u2 u3 u4 u5")
    ).toDF("doc_id", "text")
    val got = Dedup
      .removeDuplicateSpansIncremental(corpus, batch, "doc_id", "text", w = 4)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))))
      .toMap
    assert(got.keySet == Set(10L, 11L, 12L), "corpus rows must not appear")
    assert(got(10L) == ((6L, "z1 z2 q1")))
    assert(got(11L) == ((0L, "u1 u2 u3 u4 u5 v1")))
    assert(got(12L) == ((0L, "w1 u1 u2 u3 u4 u5")))
  }

  test("hammingPairsIncremental: cross-side pairs only, at any hash width") {
    // 56-bit hashes (the image-dHash width): batch id 100 is within
    // hamming 2 of corpus id 1; batch ids are also within hamming 0 of
    // EACH OTHER but must produce no pair (batch×corpus only); corpus
    // ids 1 and 2 are identical and must produce no pair either.
    val corpus = Seq(
      (1L, 0x00FFFFFFFFFFFFFL),
      (2L, 0x00FFFFFFFFFFFFFL),
      (3L, 0x0000000000000FFL)
    ).toDF("id", "simhash")
    val batch = Seq(
      (100L, 0x00FFFFFFFFFFFFCL),
      (101L, 0x00FFFFFFFFFFFFCL)
    ).toDF("id", "simhash")
    val got = Dedup
      .hammingPairsIncremental(corpus, batch, 56, maxHamming = 2, blocks = 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((100L, 1L, 2L), (100L, 2L, 2L),
      (101L, 1L, 2L), (101L, 2L, 2L)))
  }

  test("shingles guard: fewer words than n yields no shingles") {
    val tiny = Seq((0L, "only two")).toDF("doc_id", "text")
    val sh = Dedup.shingleRows(tiny, "doc_id", "text", 3)
    assert(sh.count() == 0)
  }

  test("contamination flags docs overlapping the benchmark set, with exact rates") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // shares shingles with bench doc 100
      (1L, "totally unrelated training material here indeed"),
      (2L, "alpha beta gamma nothing else shared")  // shares exactly 1 shingle
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hits")))).toMap
    // doc 0 is the bench text verbatim: all 4 3-gram shingles hit.
    assert(out(0L) == ((4L, 4L)))
    // doc 2 shares only "alpha_beta_gamma".
    assert(out(2L) == ((4L, 1L)))
    // doc 1 shares nothing → filtered out entirely.
    assert(!out.contains(1L))
  }

  test("intraDocSentenceDedup keeps first occurrences in order") {
    val d = Seq(
      (0L, "alpha one. beta two. alpha one. gamma three! beta two? delta four"),
      (1L, "no repeats here. all unique stuff")
    ).toDF("doc_id", "text")
    val out = Dedup.intraDocSentenceDedup(d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(0L).getAs[Long]("n_sentences") == 6)
    assert(out(0L).getAs[Long]("n_kept") == 4)
    // Deduped text = first occurrences joined in original order.
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha one. beta two. gamma three. delta four".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0L).getAs[String]("clean_md5") == expect)
    assert(out(1L).getAs[Long]("n_sentences") == 2)
    assert(out(1L).getAs[Long]("n_kept") == 2)
  }

  test("intraDocSentenceDedup is idempotent (deduped text has no repeats)") {
    val d = Seq(
      (0L, "alpha one. beta two. alpha one. beta two. gamma three"),
      (1L, "x marks the spot. x marks the spot! x marks the spot")
    ).toDF("doc_id", "text")
    val once = Dedup.intraDocSentenceDedup(d, "doc_id", "text").collect()
    // A second pass over already-deduped text must keep everything:
    // n_kept == n_sentences is exactly the no-repeats invariant, and the
    // reported counts imply the clean text's sentence multiset.
    once.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      assert(kept < r.getAs[Long]("n_sentences"), "fixture must have repeats")
    }
    // Explicitly re-dedup the reassembled text of doc 1.
    val clean = Seq((1L, "x marks the spot")).toDF("doc_id", "text")
    val again = Dedup.intraDocSentenceDedup(clean, "doc_id", "text").collect()(0)
    assert(again.getAs[Long]("n_sentences") == again.getAs[Long]("n_kept"))
  }

  test("boilerplate ratio is within [0,1] and n_boiler <= n_sentences") {
    val d = Seq(
      (0L, "same line. same line. same line"),
      (1L, "same line. other stuff here"),
      (2L, "same line. more things"),
      (3L, "all alone text")
    ).toDF("doc_id", "text")
    Dedup.boilerplate(d, "doc_id", "text", minDocs = 3L).collect().foreach { r =>
      val ratio = r.getAs[Double]("boiler_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_sentences"))
    }
  }

  test("boilerplate flags sentences shared by >= minDocs documents") {
    val d = Seq(
      (0L, "unique alpha text. all rights reserved. visit our site"),
      (1L, "different beta content. all rights reserved. visit our site"),
      (2L, "gamma body here. all rights reserved. visit our site"),
      (3L, "delta standalone document with nothing shared")
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplate(d, "doc_id", "text", minDocs = 3L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_sentences"), r.getAs[Long]("n_boiler")))).toMap
    // "all rights reserved" and "visit our site" appear in 3 docs → boiler.
    assert(out(0L) == ((3L, 2L)))
    assert(out(1L) == ((3L, 2L)))
    assert(out(2L) == ((3L, 2L)))
    assert(out(3L) == ((1L, 0L)))
  }

  test("minhashIncremental pairs batch docs with corpus near-dups only") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "completely different content about databases and distributed query engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // near-dup of corpus doc 0 (one word changed)
      (10L, "the quick brown fox jumps over the lazy cat near the river bank today"),
      // exact text of another BATCH doc — must NOT pair (batch×batch excluded)
      (11L, "some fresh arrival text that matches nothing in the corpus at all"),
      (12L, "some fresh arrival text that matches nothing in the corpus at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup
      .minhashIncremental(corpus, batch, "doc_id", "text", 8, 8, 0.3)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    // Only batch→corpus pairs: 10-0 found; 11-12 (intra-batch) absent.
    assert(pairs.contains((10L, 0L)))
    assert(pairs.forall { case (a, b) => a >= 10L && b < 10L })
  }

  test("minhashIncremental is correct when batch and corpus SHARE an id") {
    // Same id 0 on both sides, different documents: the two-sided verify
    // must resolve id_a against the batch text and id_b against the
    // corpus text — never a merged shingle set.
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (0L, "the quick brown fox jumps over the lazy cat near the river bank today")
    ).toDF("doc_id", "text")
    val out = Dedup
      .minhashIncremental(corpus, batch, "doc_id", "text", 8, 8, 0.3)
      .collect()
    assert(out.length == 1)
    val j = out(0).getAs[Double]("jaccard")
    // 12 shingles/side, 9 shared (one word changed in a 14-word text):
    // 9 / (12 + 12 - 9) = 0.6
    assert(j == 0.6, s"got $j")
  }

  test("simhashIncremental pairs batch docs with corpus near-dups only") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "completely different content about databases and distributed query engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (11L, "another new document"),
      (12L, "another new document")
    ).toDF("doc_id", "text")
    val pairs = Dedup
      .simhashIncremental(corpus, batch, "doc_id", "text", 0, 4)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    // Exact text → hamming 0 pair (10, 0); identical batch pair 11-12 absent.
    assert(pairs.contains((10L, 0L)))
    assert(pairs.forall { case (a, b) => a >= 10L && b < 10L })
  }

  test("incrementalExact classifies dup_corpus / dup_batch / new") {
    val corpus = Seq(
      (0L, "existing document one"),
      (1L, "existing document two")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Existing   document ONE"), // normalizes to corpus doc 0 → dup_corpus
      (11L, "brand new arrival"),       // first of a batch pair → new
      (12L, "brand NEW arrival"),       // same fingerprint, higher id → dup_batch
      (13L, "unique snowflake")         // → new
    ).toDF("doc_id", "text")
    val verdicts = Dedup.incrementalExact(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("verdict"))
      .toMap
    assert(verdicts == Map(
      10L -> "dup_corpus", 11L -> "new", 12L -> "dup_batch", 13L -> "new"))
  }

  test("corpusOverlap: identical corpora estimate 1.0, exact twin agrees") {
    val row = Dedup.corpusOverlap(docs, docs, "text", numHashes = 16,
        withExact = true).collect().head
    assert(row.getAs[Long]("n_agree") == 16L)
    assert(row.getAs[Long]("jaccard_est_micros") == 1000000L)
    assert(row.getAs[Long]("jaccard_exact_micros") == 1000000L)
    assert(row.getAs[Long]("n_common") == row.getAs[Long]("n_union"))
    assert(row.getAs[Long]("n_shingles_a") == row.getAs[Long]("n_shingles_b"))
  }

  test("corpusOverlap: disjoint corpora are exactly 0; invariants hold") {
    val a = docs.filter(col("doc_id") <= 2) // all share doc 0's shingles
    val b = docs.filter(col("doc_id") === 4L)
    val row = Dedup.corpusOverlap(a, b, "text", numHashes = 16,
      withExact = true).collect().head
    assert(row.getAs[Long]("n_common") == 0L)
    assert(row.getAs[Long]("jaccard_exact_micros") == 0L)
    // With no shared shingles the per-hash mins can only collide on a
    // ~2^-60 hash accident — the estimate must be 0 too.
    assert(row.getAs[Long]("n_agree") == 0L)
    assert(
      row.getAs[Long]("n_union") ==
        row.getAs[Long]("n_shingles_a") + row.getAs[Long]("n_shingles_b"))
  }

  test("corpusOverlap: exact Jaccard matches a hand-computed shingle count") {
    // a = docs 0+2 (identical → one shingle set), b = doc 1 (one word
    // changed at position 8 of 14 → trigrams 6,7,8 differ; 14 words →
    // 12 trigrams per doc, 9 shared).
    val a = docs.filter(col("doc_id") === 0L || col("doc_id") === 2L)
    val b = docs.filter(col("doc_id") === 1L)
    val row = Dedup.corpusOverlap(a, b, "text", numHashes = 16,
      withExact = true).collect().head
    assert(row.getAs[Long]("n_shingles_a") == 12L)
    assert(row.getAs[Long]("n_shingles_b") == 12L)
    assert(row.getAs[Long]("n_common") == 9L)
    assert(row.getAs[Long]("n_union") == 15L)
    assert(row.getAs[Long]("jaccard_exact_micros") == 600000L)
  }

  test("bandRowsLocal equals the batch band table row-for-row") {
    // The stream face's row-local shingles/signatures/band hashes must be
    // byte-identical to the batch arithmetic — compare the full (id,
    // band, bh) sets on the fixture docs.
    val local = Dedup.bandRowsLocal(docs, "doc_id", "text", 8, 4)
      .select("id", "band", "bh")
    val batch = Dedup.bandTable(docs, "doc_id", "text", 8, 4)
    assert(local.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(local).count() == 0)
  }

  test("bandRowsLocal: the shingle array is materialized once per row") {
    // The round-9 CollapseProject pitfall tripwire: if the optimizer ever
    // inlines the `shingles` alias into the 8 signature lambdas, the
    // array_distinct(transform(...)) subtree re-evaluates per signature —
    // the plan would carry it 8+ times instead of once. Probed over the
    // parquet fixture (a local relation constant-folds the whole subtree
    // away and proves nothing).
    val fdocs = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val p = Dedup.bandRowsLocal(fdocs, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    val n = "array_distinct".r.findAllIn(p).size
    assert(n == 1, s"shingle subtree appears $n times in plan:\n${p.take(3000)}")
  }

  test("crossDocSentenceDedup: keep-first leaves exactly one copy corpus-wide") {
    val sd = Seq(
      (1L, "alpha beta. gamma delta. alpha beta"),
      (2L, "alpha beta. unique two"),
      (3L, "gamma delta. epsilon zeta")
    ).toDF("doc_id", "text")
    val out = Dedup.crossDocSentenceDedup(sd, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_kept"))).toMap
    // doc 1 keeps "alpha beta"(pos 0) + "gamma delta"; its pos-2 repeat drops
    assert(out(1L) == (3L, 2L))
    // doc 2's "alpha beta" lost to doc 1; "unique two" is first
    assert(out(2L) == (2L, 1L))
    // doc 3's "gamma delta" lost to doc 1; "epsilon zeta" is first
    assert(out(3L) == (2L, 1L))
    // total kept == number of distinct sentences in the corpus
    assert(out.values.map(_._2).sum == 4L)
  }

  test("crossDocSentenceDedup: clean digest is the kept text in position order") {
    val sd = Seq(
      (1L, "alpha beta. gamma delta"),
      (2L, "alpha beta. omega psi")
    ).toDF("doc_id", "text")
    val got = Dedup.crossDocSentenceDedup(sd, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("clean_md5"))
      .toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == md5hex("alpha beta. gamma delta"))
    assert(got(2L) == md5hex("omega psi"))
  }

  test("crossDocSentenceDedup: a fully-duplicated later doc keeps nothing") {
    val sd = Seq(
      (1L, "alpha beta. gamma delta"),
      (2L, "alpha beta. gamma delta")
    ).toDF("doc_id", "text")
    val row = Dedup.crossDocSentenceDedup(sd, "doc_id", "text")
      .filter(col("id") === 2L).collect().head
    assert(row.getAs[Long]("n_kept") == 0L)
    // empty kept set digests as md5("") in both engines
    assert(row.getAs[String]("clean_md5") ==
      "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("sentenceDedupIncremental: gate semantics — corpus blocks, arrivals don't see each other") {
    val corpus = Seq((1L, "alpha beta. gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      // drops the corpus dup, keeps its own new sentence
      (10L, "alpha beta. fresh one"),
      // shares 'fresh one' with doc 10 — BOTH keep it (gate semantics)
      (11L, "fresh one. another new"),
      // intra-doc repeat: only the first position survives
      (12L, "twin twin sent. twin twin sent")
    ).toDF("doc_id", "text")
    val out = Dedup.sentenceDedupIncremental(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_kept"))).toMap
    assert(out(10L) == (2L, 1L))
    assert(out(11L) == (2L, 2L))
    assert(out(12L) == (2L, 1L))
  }

  test("committedSentenceHashes == rebuilt-from-scratch on corpus ∪ batch") {
    val corpus = Seq(
      (1L, "alpha beta. gamma delta"),
      (2L, "epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta. fresh one"),
      (11L, "fresh one. another new")).toDF("doc_id", "text")
    val corpusSet = Dedup.sentenceHashSet(corpus, "doc_id", "text")
    val committed = Dedup
      .committedSentenceHashes(corpusSet, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val rebuilt = Dedup
      .sentenceHashSet(corpus.unionByName(batch), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(committed == rebuilt)
    // readout arithmetic agrees with the set sizes
    val r = Dedup.commitSentenceReadout(
      corpusSet,
      Dedup.committedSentenceHashes(corpusSet, batch, "doc_id", "text"))
      .collect().head
    assert(r.getAs[Long]("n_committed") == rebuilt.size)
    assert(r.getAs[Long]("n_corpus") + r.getAs[Long]("n_new") ==
      r.getAs[Long]("n_committed"))
  }

  test("retractSentenceHashes == rebuilt-on-survivors; shared sentences retained") {
    val all = Seq(
      (1L, "alpha beta. shared line"),
      (2L, "shared line. gamma delta"), // deleted; 'shared line' survives via doc 1
      (3L, "unique gone")               // deleted; its hash must leave
    ).toDF("doc_id", "text")
    val committed = Dedup.sentenceHashSet(all, "doc_id", "text")
    val deleted = Seq(2L, 3L).toDF("doc_id")
    val retracted = Dedup
      .retractSentenceHashes(committed, all, deleted, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val rebuilt = Dedup
      .sentenceHashSet(all.filter(col("doc_id") === 1L), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(retracted == rebuilt)
    assert(rebuilt.size == 2) // 'alpha beta' + retained 'shared line'
  }

  test("ngramNovelty: exact copy scores 0, disjoint text scores 1e6") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (20L, "the quick brown fox jumps over the lazy dog today"),
      (21L, "completely unrelated database engine words appear here instead now"),
      (22L, "xx yy") // < 3 words: no shingles, no row
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("novelty_micros")).toMap
    assert(out(20L) == 0L)
    assert(out(21L) == 1000000L)
    assert(!out.contains(22L))
  }

  test("corpusOverlap: default is sketch-only and matches the exact-twin run") {
    val a = docs.filter(col("doc_id") <= 2)
    val b = docs.filter(col("doc_id") >= 1)
    val sk = Dedup.corpusOverlap(a, b, "text", 16)
    assert(sk.columns.toSeq ==
      Seq("n_hashes", "n_agree", "jaccard_est_micros"))
    val full = Dedup.corpusOverlap(a, b, "text", 16, withExact = true)
      .collect().head
    val skRow = sk.collect().head
    assert(skRow.getAs[Long]("n_agree") == full.getAs[Long]("n_agree"))
  }
}
