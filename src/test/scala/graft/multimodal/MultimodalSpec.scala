package graft.multimodal

import graft.SparkSuite

/** Multimodal plumbing: real schema/partition/batch shape, stubbed codec. */
class MultimodalSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("media corpus carries binary content with typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val first = media.head()
    assert(first.content.nonEmpty)
    assert(Set("image", "audio", "video").contains(first.meta.kind))
    assert(media.count() > 0)
  }

  test("feature extraction is deterministic and blob-free downstream") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.mediaId)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.mediaId)
    assert(f1.map(_.thumbnailHash).toSeq == f2.map(_.thumbnailHash).toSeq)
    // Histogram buckets sum to the byte count; entropy within [0, 4] bits
    // (16 buckets).
    f1.foreach { f =>
      assert(f.histogram.sum == f.nBytes)
      assert(f.byteEntropy >= 0 && f.byteEntropy <= 4.0 + 1e-9)
    }
  }

  test("frame sampling yields ~duration/interval frames with content") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val item = media.filter(_.meta.durationMs > 2000).head()
    val frames = Multimodal.StubCodec.sampleFrames(item, 1000)
    assert(frames.size == (item.meta.durationMs / 1000).toInt)
    assert(frames.forall(_.nonEmpty))
    // Frames tile the source bytes without loss.
    assert(frames.map(_.length).sum == item.content.length)
  }

  test("resize stub downsamples deterministically to the target size") {
    val bytes = Array.tabulate(1000)(_.toByte)
    val small = Multimodal.StubCodec.resize(bytes, 8, 8)
    assert(small.length == 64)
    assert(small.toSeq == Multimodal.StubCodec.resize(bytes, 8, 8).toSeq)
  }

  test("distributed frame explode keeps ids unique") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val frames = Multimodal.sampleFrames(media, 1000)
    val n = frames.count()
    val distinctIds = frames.toDF().select(countDistinct("mediaId")).head().getLong(0)
    assert(n == distinctIds)
  }

  test("real ImageIO decode recovers a generated PNG exactly") {
    import spark.implicits._
    // 4×2 fixture with known channel values: row 0 = (10,20,30) ×4,
    // row 1 = (50,60,70) ×4 → means (30, 40, 50) exactly.
    val w = 4; val h = 2
    val rgb = Array.tabulate(w * h * 3) { i =>
      val base = if (i / 3 < w) 10 else 50
      (base + (i % 3) * 10).toByte
    }
    val png = Multimodal.encodePng(w, h, rgb)
    // PNG magic header — this is a real container, not a stub blob.
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val items = Seq(
      Multimodal.MediaItem(1L, png, Multimodal.MediaMeta("image", w, h, 0L, "png"))).toDS()
    val f = Multimodal.imageFeatures(items).head()
    assert(f.ok && f.width == w && f.height == h)
    assert(f.meanR == 30.0 && f.meanG == 40.0 && f.meanB == 50.0)
    assert(f.thumbnailHash.length == 32)
  }

  test("undecodable blobs yield ok=false rows, not job failure") {
    import spark.implicits._
    val junk = Multimodal.MediaItem(
      7L, Array.tabulate(100)(_.toByte), Multimodal.MediaMeta("image", 0, 0, 0L, "?"))
    val f = Multimodal.imageFeatures(Seq(junk).toDS()).head()
    assert(!f.ok && f.width == -1)
  }

  test("synthetic PNG corpus round-trips the md5-derived pixels") {
    import spark.implicits._
    val src = Seq((3L, "hello world"), (4L, "quick brown fox")).toDF("doc_id", "text")
    val items = Multimodal.syntheticPngCorpus(src, "doc_id", "text")
    val feats = Multimodal.imageFeatures(items).collect().sortBy(_.mediaId)
    assert(feats.forall(_.ok))
    // Dimensions follow the documented id formulas.
    assert(feats.find(_.mediaId == 3L).get.width == (8 + 3 % 9))
    assert(feats.find(_.mediaId == 3L).get.height == (8 + 3 % 7))
    // Decoded means equal means computed directly from the md5 chain —
    // the PNG encode→decode round trip is byte-exact.
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = Seq((3L, "hello world"), (4L, "quick brown fox")).map { case (id, text) =>
      val w = (8 + id % 9).toInt; val hh = (8 + id % 7).toInt
      val n = w * hh * 3
      val px = new Array[Int](n)
      var c = 0; var o = 0
      while (o < n) {
        val dg = md.digest((text + ":" + c).getBytes("UTF-8"))
        var k = 0
        while (k < 16 && o < n) { px(o) = dg(k) & 0xff; k += 1; o += 1 }
        c += 1
      }
      val sums = Array(0L, 0L, 0L)
      px.indices.foreach(j => sums(j % 3) += px(j))
      (id, sums.map(s => math.floor(s.toDouble / (w * hh) * 1e6) / 1e6))
    }
    expected.foreach { case (id, Array(r, g, b)) =>
      val f = feats.find(_.mediaId == id).get
      assert(f.meanR == r && f.meanG == g && f.meanB == b,
        s"means mismatch for $id: (${f.meanR},${f.meanG},${f.meanB}) vs ($r,$g,$b)")
    }
  }

  test("resizeImages round-trips exact nearest-neighbor pixels") {
    import spark.implicits._
    val docs = Seq((3L, "hello world")).toDF("doc_id", "text")
    val items = Multimodal.syntheticPngCorpus(docs, "doc_id", "text")
    val resized = Multimodal.resizeImages(items, 4, 4).collect().head
    assert(resized.ok && resized.width == 4 && resized.height == 4)
    // Decode the resized PNG and compare every pixel against the same
    // nearest-neighbor sample computed from the source image directly.
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(items.collect().head.content))
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.content))
    for (ty <- 0 until 4; tx <- 0 until 4) {
      val expected = src.getRGB(
        tx * src.getWidth / 4, ty * src.getHeight / 4) & 0xffffff
      assert((out.getRGB(tx, ty) & 0xffffff) == expected, s"($tx,$ty)")
    }
    // Garbage blobs degrade to ok=false, never a job failure.
    val bad = Multimodal.resizeImages(
      Seq(Multimodal.MediaItem(9L, Array[Byte](9, 9),
        Multimodal.MediaMeta("image", 0, 0, 0L, "png"))).toDS(), 4, 4)
      .collect().head
    assert(!bad.ok && bad.content.isEmpty)
  }

  test("animated gif encode -> gifFrames recovers every frame exactly") {
    import spark.implicits._
    // Indexed-grayscale GIF is lossless, so the multi-frame decode must
    // return the exact per-frame integer stats of the encoded pixels.
    val w = 5; val h = 4
    val frames = Seq(
      Array.tabulate[Byte](w * h)(i => i.toByte),
      Array.tabulate[Byte](w * h)(i => (255 - i).toByte),
      Array.fill[Byte](w * h)(7.toByte))
    val gif = Multimodal.encodeAnimatedGif(w, h, frames)
    val items = Seq(Multimodal.MediaItem(1L, gif,
      Multimodal.MediaMeta("video", w, h, 300L, "gif"))).toDS()
    val got = Multimodal.gifFrames(items).collect().sortBy(_.frameIdx)
    assert(got.length == 3)
    got.zip(frames).zipWithIndex.foreach { case ((g, f), i) =>
      val vals = f.map(_ & 0xff)
      assert(g.frameIdx == i && g.width == w && g.height == h)
      assert(g.sumGray == vals.map(_.toLong).sum, s"frame $i sum")
      assert(g.sumSqGray == vals.map(v => v.toLong * v).sum, s"frame $i sumSq")
    }
    // stride=2 samples frames 0 and 2 only.
    val sampled = Multimodal.gifFrames(items, stride = 2).collect()
      .map(_.frameIdx).sorted
    assert(sampled.toSeq == Seq(0, 2))
    // Garbage blobs contribute zero rows, never a job failure.
    val bad = Seq(Multimodal.MediaItem(2L, Array[Byte](1, 2, 3),
      Multimodal.MediaMeta("video", 0, 0, 0L, "gif"))).toDS()
    assert(Multimodal.gifFrames(bad).collect().isEmpty)
    // A single-image container decodes as a 1-frame stream.
    val png = Seq(Multimodal.MediaItem(3L,
      Multimodal.encodePng(2, 2, Array[Byte](1,2,3, 4,5,6, 7,8,9, 10,11,12)),
      Multimodal.MediaMeta("image", 2, 2, 0L, "png"))).toDS()
    val one = Multimodal.gifFrames(png).collect()
    assert(one.length == 1 && one.head.frameIdx == 0)
    // For an RGB container the stats read the low byte of getRGB (blue);
    // grayscale GIFs have r=g=b so the distinction only shows here.
    assert(one.head.sumGray == (3L + 6 + 9 + 12))
  }

  test("synthetic gif corpus decodes to the documented md5-chain frames") {
    import spark.implicits._
    val docs = Seq((3L, "hello world")).toDF("doc_id", "text")
    val got = Multimodal
      .gifFrames(Multimodal.syntheticGifCorpus(docs, "doc_id", "text"))
      .collect().sortBy(_.frameIdx)
    val w = 6 + 3 % 5; val h = 6 + 3 % 3; val nf = 2 + 3 % 4
    assert(got.length == nf)
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nf).foreach { f =>
      val n = w * h
      val px = new Array[Int](n)
      var c = 0; var o = 0
      while (o < n) {
        val dg = md.digest(s"hello world:$f:$c".getBytes("UTF-8"))
        var k = 0
        while (k < 16 && o < n) { px(o) = dg(k) & 0xff; k += 1; o += 1 }
        c += 1
      }
      assert(got(f).width == w && got(f).height == h)
      assert(got(f).sumGray == px.map(_.toLong).sum, s"frame $f")
      assert(got(f).sumSqGray == px.map(v => v.toLong * v).sum, s"frame $f")
    }
  }

  test("wav encode -> audioFeatures recovers exact sample statistics") {
    import spark.implicits._
    // Known samples: max abs 300, sum of squares exact, 4 sign changes.
    val pcm = Array[Short](100, -200, 300, -1, 50)
    val items = Seq(
      Multimodal.MediaItem(1L, Multimodal.encodeWav(16000, pcm),
        Multimodal.MediaMeta("audio", 0, 0, 0L, "wav")),
      // Garbage bytes must yield ok=false, not a failure.
      Multimodal.MediaItem(2L, Array[Byte](1, 2, 3, 4),
        Multimodal.MediaMeta("audio", 0, 0, 0L, "wav"))
    ).toDS()
    val feats = Multimodal.audioFeatures(items).collect().sortBy(_.mediaId)
    val f = feats(0)
    assert(f.ok && f.sampleRate == 16000 && f.channels == 1)
    assert(f.nSamples == 5L)
    assert(f.maxAbs == 300L)
    assert(f.sumSq == pcm.map(v => v.toLong * v).sum)
    assert(f.zeroCrossings == 4L) // +,-,+,-,+ alternates at every step
    assert(!feats(1).ok)
  }

  test("stereo wav is refused (ok=false) instead of mixing channels") {
    import spark.implicits._
    // The flat-sample loop would count frames×channels and sign changes
    // across interleaved L/R — wrong-but-plausible stats — so non-mono
    // input must take the ok=false path, same as non-PCM16.
    val frames = 8
    val data = new Array[Byte](frames * 4) // 2 ch × 2 bytes, all zeros
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val items = Seq(Multimodal.MediaItem(1L, bos.toByteArray,
      Multimodal.MediaMeta("audio", 0, 0, 0L, "wav"))).toDS()
    assert(!Multimodal.audioFeatures(items).collect().head.ok)
    assert(Multimodal.segmentAudio(items, 2).collect().isEmpty)
  }

  test("synthetic wav corpus decodes to the documented md5-chain samples") {
    import spark.implicits._
    val docs = Seq((3L, "hello world")).toDF("doc_id", "text")
    val f = Multimodal
      .audioFeatures(Multimodal.syntheticWavCorpus(docs, "doc_id", "text"))
      .collect().head
    assert(f.ok)
    assert(f.sampleRate == (8000 + (3 % 4) * 4000))
    assert(f.nSamples == (64 + 3 % 65).toLong)
    // Recompute from the chain directly.
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = 64 + 3 % 65
    val pcm = (0 until n).map { j =>
      val dg = md.digest(("hello world:" + (j / 8)).getBytes("UTF-8"))
      val k = 2 * (j % 8)
      val raw = (dg(k) & 0xff) | ((dg(k + 1) & 0xff) << 8)
      if (raw >= 32768) raw - 65536 else raw
    }
    assert(f.sumSq == pcm.map(v => v.toLong * v).sum)
    assert(f.maxAbs == pcm.map(v => math.abs(v.toLong)).max)
  }

  /** Reference dHash straight from a raw RGB byte array — the naive twin
    * of the decode-based implementation. */
  private def refDHash(w: Int, h: Int, rgb: Array[Byte]): Long = {
    def gray(tx: Int, ty: Int): Long = {
      val o = ((ty * h / 8) * w + (tx * w / 8)) * 3
      299L * (rgb(o) & 0xff) + 587L * (rgb(o + 1) & 0xff) +
        114L * (rgb(o + 2) & 0xff)
    }
    var hash = 0L; var bit = 0
    for (ty <- 0 until 8; tx <- 0 until 7) {
      if (gray(tx, ty) > gray(tx + 1, ty)) hash |= 1L << bit
      bit += 1
    }
    hash
  }

  test("imageDHash matches the raw-pixel reference through a real decode") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val items = (0L until 6L).map { id =>
      val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
      val rgb = Array.fill((w * h * 3))(rnd.nextInt(256).toByte)
      (id, w, h, rgb)
    }
    val ds = spark.createDataset(items.map { case (id, w, h, rgb) =>
      Multimodal.MediaItem(id, Multimodal.encodePng(w, h, rgb),
        Multimodal.MediaMeta("image", w, h, 0L, "png"))
    })
    val got = Multimodal.imageDHash(ds).collect()
      .map(r => r.mediaId -> r.phash).toMap
    items.foreach { case (id, w, h, rgb) =>
      assert(got(id) == refDHash(w, h, rgb), s"dHash mismatch for image $id")
    }
    // 56-bit contract: always non-negative.
    assert(got.values.forall(_ >= 0L))
  }

  /** Grayscale frame reference dHash — the single-channel twin of
    * [[refDHash]] (palette GIF: R=G=B=v ⇒ gray weight 1000·v). */
  private def refFrameDHash(w: Int, h: Int, px: Array[Byte]): Long = {
    def gray(tx: Int, ty: Int): Long =
      1000L * (px((ty * h / 8) * w + (tx * w / 8)) & 0xff)
    var hash = 0L; var bit = 0
    for (ty <- 0 until 8; tx <- 0 until 7) {
      if (gray(tx, ty) > gray(tx + 1, ty)) hash |= 1L << bit
      bit += 1
    }
    hash
  }

  test("gifFrameHashes matches the raw-pixel reference on every frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val items = (0L until 5L).map { id =>
      val w = 6 + (id % 5).toInt; val h = 6 + (id % 3).toInt
      val frames = (0 until 2 + (id % 3).toInt)
        .map(_ => Array.fill(w * h)(rnd.nextInt(256).toByte))
      (id, w, h, frames)
    }
    val ds = spark.createDataset(items.map { case (id, w, h, frames) =>
      Multimodal.MediaItem(id, Multimodal.encodeAnimatedGif(w, h, frames),
        Multimodal.MediaMeta("video", w, h, frames.size * 100L, "gif"))
    })
    val got = Multimodal.gifFrameHashes(ds).collect()
      .map(r => (r.mediaId, r.frameIdx) -> r.phash).toMap
    items.foreach { case (id, w, h, frames) =>
      frames.zipWithIndex.foreach { case (px, fi) =>
        assert(got((id, fi)) == refFrameDHash(w, h, px),
          s"frame dHash mismatch for ($id, $fi)")
      }
    }
    assert(got.size == items.map(_._4.size).sum)
    assert(got.values.forall(_ >= 0L))
  }

  test("frame phash recovers nearly every planted brightness twin frame") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, d)
    val nFrames = docs
      .selectExpr("sum(2 + doc_id % 4)").collect().head.getLong(0)
    val pairs = graft.queries.PipelineQueries.framePhash(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // Planted recall: each frame's brightness twin should pair with it
    // at hamming ≈ 0 (the 255 clamp breaks a deterministic minority).
    val twinPairs = pairs.count { case (a, b) =>
      b == a + graft.queries.PipelineQueries.PhashTwinOffset * 10
    }.toDouble
    assert(twinPairs / nFrames > 0.8,
      s"planted-twin recall ${twinPairs / nFrames} below floor " +
        s"($twinPairs of $nFrames frames)")
    // Tiny upsampled frames share forced-zero grid bits, so SOME
    // cross-document coincidences at hamming <= 6 are genuine (the
    // oracle computes the identical set); the planted signal must still
    // dominate them.
    def doc(x: Long): Long =
      (x / 10) % graft.queries.PipelineQueries.PhashTwinOffset
    val crossDoc = pairs.count { case (a, b) => doc(a) != doc(b) }
    assert(twinPairs > crossDoc,
      s"twin pairs $twinPairs must dominate cross-doc coincidences $crossDoc")
  }

  test("dHash is invariant to a uniform non-clamping brightness shift") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // All channels < 200, so +40 never clamps: hashes must be identical.
    val w = 12; val h = 9
    val rgb = Array.fill(w * h * 3)((rnd.nextInt(200)).toByte)
    val shifted = rgb.map(b => ((b & 0xff) + 40).toByte)
    val ds = spark.createDataset(Seq(
      Multimodal.MediaItem(0L, Multimodal.encodePng(w, h, rgb),
        Multimodal.MediaMeta("image", w, h, 0L, "png")),
      Multimodal.MediaItem(1L, Multimodal.encodePng(w, h, shifted),
        Multimodal.MediaMeta("image", w, h, 0L, "png"))))
    val hs = Multimodal.imageDHash(ds).collect().map(r => r.mediaId -> r.phash).toMap
    assert(hs(0L) == hs(1L))
  }

  test("hammingPairs finds exactly the hamming-ball pairs (pigeonhole exactness)") {
    import spark.implicits._
    val base = 0x00ABCDEF12345678L & ((1L << 56) - 1)
    def flip(v: Long, bits: Seq[Int]): Long = bits.foldLeft(v)((a, b) => a ^ (1L << b))
    val rows = Seq(
      0L -> base,
      1L -> flip(base, Seq(3)), // hamming 1 from 0
      2L -> flip(base, Seq(10, 20, 30, 40, 50, 55)), // hamming 6 from 0
      3L -> flip(base, Seq(0, 8, 16, 24, 32, 40, 48)), // hamming 7: outside ball
      4L -> (~base & ((1L << 56) - 1)) // far away
    ).toDF("id", "simhash")
    val pairs = graft.dedup.Dedup.hammingPairs(rows, 56, 6, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 1L)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) == 6L)
    assert(!pairs.contains((0L, 3L)), "hamming 7 must be outside the ball")
    assert(!pairs.contains((1L, 2L)), "hamming(1,2) = 7: outside the ball")
    assert(!pairs.contains((0L, 4L)))
    // Every reported pair's hamming is genuinely <= 6 and correct.
    val byId = rows.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case ((a, b), d) =>
      assert(java.lang.Long.bitCount(byId(a) ^ byId(b)).toLong == d && d <= 6L)
    }
  }

  test("video near-dup rollup flags each planted twin exactly once, nothing else") {
    val d = "/root/testdata/sf0.001"
    val P = graft.queries.PipelineQueries
    val nDocs = graft.queries.Tables.documents(spark, d).count()
    val rows = P.videoNeardup(spark, d).collect()
    // The frame-level pair set carries hundreds of tiny-frame
    // coincidental pairs (see the frame phash test above) — the CLIP
    // rollup must collapse each brightness-twin video to ONE verdict and
    // let no coincidence survive the matched-fraction floor.
    assert(rows.length == nDocs,
      s"expected exactly one verdict per planted twin pair, got ${rows.length}")
    rows.foreach { r =>
      val va = r.getLong(0); val vb = r.getLong(1)
      assert(vb == va + P.PhashTwinOffset, s"non-twin verdict ($va, $vb)")
      val nfA = r.getLong(2); val nfB = r.getLong(3)
      val nPairs = r.getLong(4); val nAligned = r.getLong(5)
      val nMatched = r.getLong(6); val frac = r.getDouble(7)
      assert(nfA == nfB && nMatched == nfA, "twin must match every frame")
      assert(nAligned == nPairs, "a re-encode matches frame-for-frame")
      assert(frac == 1.0)
    }
  }

  test("audio clip rollup flags every planted amplitude twin at frac 1.0") {
    val d = "/root/testdata/sf0.001"
    val P = graft.queries.PipelineQueries
    val ids = graft.queries.Tables.documents(spark, d)
      .select("doc_id").collect().map(_.getLong(0))
    val rows = P.audioNeardup(spark, d).collect()
    val byPair = rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // Planted recall at the CLIP level: every doc's amplitude twin
    // rolls up to a verdict with every window matched, window-aligned.
    // (Unlike the video fixture, tiny same-length windows share
    // structural bits — see the window-level test below — so structural
    // coincidences CAN survive the floor here; the claim is recall and
    // alignment of the planted twins, not surgical exclusivity.)
    ids.foreach { id =>
      val r = byPair.getOrElse((id, id + P.PhashTwinOffset),
        fail(s"missing twin verdict for clip $id"))
      assert(r.getLong(2) == P.AudioFpWindows.toLong)
      assert(r.getLong(6) == r.getLong(2), "twin must match every window")
      assert(r.getLong(5) >= r.getLong(2), "aligned window matches missing")
      assert(r.getDouble(7) == 1.0)
    }
  }

  test("audio commit gates twins as dup_corpus and re-uploads as duplicates") {
    val d = "/root/testdata/sf0.001"
    val P = graft.queries.PipelineQueries
    val rows = P.audioCommit(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // Every amplitude-twin window matches its corpus source (the
    // window-recall test below pins hamming <= max for all of them).
    val twins = rows.filter { case (id, _) =>
      id >= P.PhashTwinOffset * 10 && id < P.MediaCommitFresh1 * 10
    }
    assert(twins.nonEmpty && twins.forall(_._2 == "dup_corpus"))
    // The second identical fresh batch can never gate as new — its
    // fresh1 twin (lower id) is in the same delivery.
    val fresh2 = rows.filter(_._1 >= P.MediaCommitFresh2 * 10)
    assert(fresh2.nonEmpty && fresh2.forall(_._2 != "new"))
  }

  test("frame commit gates twin frames as dup_corpus and re-uploads as duplicates") {
    val d = "/root/testdata/sf0.001"
    val P = graft.queries.PipelineQueries
    val rows = P.frameCommit(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val twins = rows.filter { case (id, _) =>
      id >= P.PhashTwinOffset * 10 && id < P.MediaCommitFresh1 * 10
    }
    assert(twins.nonEmpty && twins.forall(_._2 == "dup_corpus"))
    val fresh2 = rows.filter(_._1 >= P.MediaCommitFresh2 * 10)
    assert(fresh2.nonEmpty && fresh2.forall(_._2 != "new"))
  }

  test("audio fingerprint recovers every planted amplitude-twin window") {
    val d = "/root/testdata/sf0.001"
    val nDocs = graft.queries.Tables.documents(spark, d).count()
    val P = graft.queries.PipelineQueries
    val pairs = P.audioPhash(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Planted recall: EVERY window of every doc pairs with its
    // amplitude-shifted twin window within the hamming ball (energy
    // ordering shrugs off the uniform +3 shift)…
    val twinPairs = pairs.filter { case (a, b, _) =>
      b == a + P.PhashTwinOffset * 10
    }
    assert(twinPairs.length == P.AudioFpWindows * nDocs,
      s"twin recall ${twinPairs.length} of ${P.AudioFpWindows * nDocs} windows")
    // …and the overwhelming majority at hamming exactly 0 (the int16
    // clamp / an energy near-tie flips a deterministic minority).
    val h0 = twinPairs.count(_._3 == 0L).toDouble
    assert(h0 / twinPairs.length > 0.9,
      s"hamming-0 twin fraction ${h0 / twinPairs.length} below floor")
    // NOTE on cross pairs: the fixture's 32–64-sample windows leave most
    // of the 57 energy buckets empty, so many fingerprint bits are
    // structural (determined by window length, not content) and
    // same-length windows coincide within the ball — the audio analog of
    // the tiny-frame "forced-zero grid bits" caveat above. The oracle
    // computes the identical set; at real clip lengths every bucket is
    // populated (see the full-bucket test below).
  }

  test("audio fingerprint is gain-invariant; full buckets make all bits content-live") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 2000 samples, 2 windows: every one of the 57 buckets per window
    // holds >= 17 samples — no structural bits. |v| < 8000 so a 2x gain
    // never clamps: energies scale uniformly by 4, every comparison is
    // preserved, the fingerprint must be IDENTICAL.
    val pcm = Array.fill(2000)((rnd.nextInt(16000) - 8000).toShort)
    val doubled = pcm.map(v => (v * 2).toShort)
    def item(id: Long, p: Array[Short]) =
      Multimodal.MediaItem(id, Multimodal.encodeWav(16000, p),
        Multimodal.MediaMeta("audio", 0, 0, p.length * 1000L / 16000, "wav"))
    val fps = Multimodal
      .audioFingerprints(Seq(item(1L, pcm), item(2L, doubled)).toDS(), 2)
      .collect()
      .map(f => (f.mediaId, f.windowIdx) -> f.fp)
      .toMap
    assert(fps.size == 4)
    assert(fps((1L, 0)) == fps((2L, 0)), "gain doubling must not move window 0")
    assert(fps((1L, 1)) == fps((2L, 1)), "gain doubling must not move window 1")
    // Distinct random content => the two windows differ from each other.
    assert(fps((1L, 0)) != fps((1L, 1)))
  }

  test("frame-id encoding guard raises loudly on a >=10-frame container") {
    import spark.implicits._
    val w = 6; val h = 6
    def mkItems(nf: Int, id: Long) = {
      val frames = (0 until nf).map { f =>
        Array.tabulate(w * h)(i => ((i * 7 + f * 13) % 256).toByte)
      }
      Seq(Multimodal.MediaItem(id, Multimodal.encodeAnimatedGif(w, h, frames),
        Multimodal.MediaMeta("video", w, h, nf * 100L, "gif"))).toDS()
    }
    // 9 frames: the encoding's last legal width — passes, 9 guarded ids.
    val ok = graft.queries.PipelineQueries
      .guardedFrameIds(Multimodal.gifFrameHashes(mkItems(9, 5L)).toDF())
      .collect()
    assert(ok.length == 9)
    assert(ok.map(_.getLong(0)).sorted.toSeq == (50L to 58L))
    // 12 frames: the guard must fail the job with the loud message, not
    // silently collide frame ids across videos.
    val ex = intercept[Exception] {
      graft.queries.PipelineQueries
        .guardedFrameIds(Multimodal.gifFrameHashes(mkItems(12, 5L)).toDF())
        .collect()
    }
    val msgs = Iterator
      .iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("frame_idx overflows"),
      s"expected the frame-id guard message, got:\n$msgs")
  }
}
