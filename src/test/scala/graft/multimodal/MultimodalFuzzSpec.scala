package graft.multimodal

import graft.SparkSuite
import graft.multimodal.Multimodal._

/** Adversarial-input hardening for the multimodal codecs: every decoder
  * must turn ANY blob — truncated, bit-flipped, random noise, empty,
  * wrong container — into a clean row (`ok=false` / zero frames), never
  * a task failure. A single escaped exception here is a retry storm at
  * corpus scale: the task retries 4×, fails the stage, and one corrupt
  * blob in 100 TB kills the whole job. The corpus runs through several
  * partitions so an escape would surface as a collect() failure.
  *
  * Seeded deterministic fuzzing (fixed Random): the same ~160 mutants
  * every run — flake-free, reproducible, and the mutants cover the
  * interesting failure classes (mid-structure truncation, header
  * corruption, payload bit-flips, plugin-reader confusion). */
class MultimodalFuzzSpec extends SparkSuite {

  private def validBlobs: Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(0xF422EDL)
    val w = 11; val h = 7
    val rgb = Array.fill((w * h * 3))(rnd.nextInt(256).toByte)
    val png = encodePng(w, h, rgb)
    val frames = (0 until 3).map(_ => Array.fill(w * h)(rnd.nextInt(256).toByte))
    val gif = encodeAnimatedGif(w, h, frames)
    val pcm = Array.fill(400)((rnd.nextInt(65536) - 32768).toShort)
    val wav = encodeWav(16000, pcm)
    Seq(("png", png), ("gif", gif), ("wav", wav))
  }

  /** Truncations, bit-flips, noise, and degenerate blobs for one valid
    * source blob. */
  private def mutants(src: Array[Byte], rnd: scala.util.Random): Seq[Array[Byte]] = {
    val truncs = Seq(0.01, 0.1, 0.5, 0.9, 0.99).map { f =>
      src.take(math.max(1, (src.length * f).toInt))
    }
    val flips = (0 until 15).map { _ =>
      val b = src.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      b
    }
    val noise = Seq(0, 1, 7, 100, 4096).map(n =>
      Array.fill(n)(rnd.nextInt(256).toByte))
    truncs ++ flips ++ noise
  }

  private lazy val corpus: Seq[MediaItem] = {
    val rnd = new scala.util.Random(0xD15EA5EL)
    val all = validBlobs.flatMap { case (fmt, src) =>
      mutants(src, rnd).map(b => (fmt, b))
    }
    all.zipWithIndex.map { case ((fmt, bytes), i) =>
      MediaItem(i.toLong, bytes, MediaMeta("fuzz", 0, 0, 0L, fmt))
    }
  }

  test("imageFeatures survives every mutant: ok=false or a sane decode, one row per item") {
    import spark.implicits._
    val ds = corpus.toDS().repartition(8)
    val rows = imageFeatures(ds).collect()
    assert(rows.length == corpus.length, "every blob must produce exactly one row")
    rows.foreach { r =>
      if (!r.ok) assert(r.width == -1 && r.height == -1 && r.thumbnailHash.isEmpty)
      else {
        // A bit-flip in a non-critical chunk may still decode — fine, but
        // the decode must then be internally sane.
        assert(r.width > 0 && r.height > 0)
        assert(r.meanR >= 0 && r.meanR <= 255 &&
          r.meanG >= 0 && r.meanG <= 255 && r.meanB >= 0 && r.meanB <= 255)
        assert(r.thumbnailHash.length == 32)
      }
    }
    // The corpus must actually exercise the failure path.
    assert(rows.count(!_.ok) > corpus.length / 3, "fuzz corpus too tame")
  }

  test("audioFeatures survives every mutant: ok=false or exact-integer stats") {
    import spark.implicits._
    val ds = corpus.toDS().repartition(8)
    val rows = audioFeatures(ds).collect()
    assert(rows.length == corpus.length)
    rows.foreach { r =>
      if (r.ok) {
        // A truncated WAV may decode its surviving prefix — sane, exact,
        // and bounded is the contract; crashing is the bug.
        assert(r.sampleRate > 0 && r.channels == 1)
        assert(r.nSamples >= 0 && r.maxAbs <= 32768)
        assert(r.sumSq >= 0 && r.zeroCrossings >= 0 &&
          r.zeroCrossings <= math.max(0L, r.nSamples - 1))
      }
    }
    assert(rows.count(!_.ok) > corpus.length / 2, "fuzz corpus too tame")
  }

  test("gifFrames survives every mutant: decoded frames are sane, failures yield zero frames") {
    import spark.implicits._
    val ds = corpus.toDS().repartition(8)
    // collect() succeeding IS the core assertion: no mutant may escape a
    // task (the whole-item catch turns any decoder throw into Seq.empty).
    val rows = gifFrames(ds).collect()
    rows.foreach { f =>
      assert(f.frameIdx >= 0 && f.width > 0 && f.height > 0)
      assert(f.sumGray >= 0 &&
        f.sumGray <= 255L * f.width * f.height)
      assert(f.sumSqGray >= 0 &&
        f.sumSqGray <= 255L * 255L * f.width * f.height)
    }
    // Valid-prefix truncations and many flips must be rejected whole-item;
    // the corpus mixes wav/noise too, so most items yield no frames.
    val itemsWithFrames = rows.map(_.mediaId).distinct.length
    assert(itemsWithFrames < corpus.length / 2, "fuzz corpus too tame")
  }
}
