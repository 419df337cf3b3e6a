package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape — is
  * real and tested. The actual codec calls are STUBBED behind
  * [[MediaCodec]] with deterministic fakes (this container ships no
  * image/audio libraries): a production deployment swaps the codec, the
  * plan does not change.
  *
  * Scale notes: media blobs are large and incompressible, so the rules
  * are (1) NEVER shuffle the blob — derive features first, shuffle the
  * small feature rows; (2) process per-partition with a reused codec
  * instance (`mapPartitions`, the JVM analog of `mapInPandas` batches);
  * (3) size partitions by bytes not rows
  * (`spark.sql.files.maxPartitionBytes`), because row count is
  * meaningless when one row is 10 MB.
  */
object Multimodal {

  /** Typed metadata carried next to the blob. */
  case class MediaMeta(
      kind: String, // "image" | "audio" | "video"
      width: Int,
      height: Int,
      durationMs: Long,
      format: String
  )

  case class MediaItem(
      mediaId: Long,
      content: Array[Byte],
      meta: MediaMeta
  )

  /** Extracted per-item features: fixed-width, shuffle-friendly. */
  case class MediaFeatures(
      mediaId: Long,
      kind: String,
      nBytes: Long,
      byteEntropy: Double,
      histogram: Seq[Long], // 16-bucket byte histogram
      thumbnailHash: String
  )

  /** Codec boundary. The deterministic stub stands in for libjpeg/ffmpeg:
    * outputs are pure functions of the bytes, so tests and oracles hold. */
  trait MediaCodec extends Serializable {
    def decode(item: MediaItem): Array[Byte]
    def resize(pixels: Array[Byte], w: Int, h: Int): Array[Byte]
    def sampleFrames(item: MediaItem, everyMs: Long): Seq[Array[Byte]]
  }

  object StubCodec extends MediaCodec {
    /** "Decode" = identity on bytes (a real codec returns pixel/PCM data). */
    override def decode(item: MediaItem): Array[Byte] = item.content

    /** "Resize" = deterministic subsample to w*h bytes. */
    override def resize(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, w * h)
      if (pixels.length <= target) pixels
      else {
        val step = pixels.length.toDouble / target
        Array.tabulate(target)(i => pixels((i * step).toInt))
      }
    }

    /** "Frame sample" = deterministic byte-range slices per timestamp. */
    override def sampleFrames(item: MediaItem, everyMs: Long): Seq[Array[Byte]] = {
      val n = math.max(1, (item.meta.durationMs / math.max(1, everyMs)).toInt)
      val len = item.content.length
      (0 until n).map { i =>
        val from = (len.toLong * i / n).toInt
        val until = (len.toLong * (i + 1) / n).toInt
        item.content.slice(from, math.max(from + 1, until))
      }
    }
  }

  /** Feature extraction: one codec per partition, blob never leaves the
    * scan partition, output is small fixed-width rows. */
  def extractFeatures(
      items: Dataset[MediaItem],
      codec: MediaCodec = StubCodec
  ): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { item =>
        val decoded = codec.decode(item)
        val hist = new Array[Long](16)
        var i = 0
        while (i < decoded.length) {
          hist((decoded(i) & 0xff) >> 4) += 1
          i += 1
        }
        val n = math.max(1L, decoded.length.toLong)
        var entropy = 0.0
        hist.foreach { c =>
          if (c > 0) {
            val p = c.toDouble / n
            entropy -= p * math.log(p) / math.log(2)
          }
        }
        // floor-rounding (not rint): floor is exact on doubles, so an
        // oracle engine that reproduces the same IEEE term sequence gets
        // the identical 6-decimal value — rint (half-to-even) vs SQL
        // round (half-away) could disagree on exact .5 boundaries.
        val thumb = codec.resize(decoded, 8, 8)
        val thumbHash = java.security.MessageDigest
          .getInstance("MD5")
          .digest(thumb)
          .map("%02x".format(_))
          .mkString
        MediaFeatures(
          item.mediaId, item.meta.kind, decoded.length.toLong,
          math.floor(entropy * 1e6) / 1e6, hist.toSeq, thumbHash)
      }
    }
  }

  /** Frame sampling as a flatMap: one row per sampled frame, frame index
    * explicit. Downstream per-frame featurization reuses extractFeatures. */
  def sampleFrames(
      items: Dataset[MediaItem],
      everyMs: Long,
      codec: MediaCodec = StubCodec
  ): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    // Frame ids live in a 2^20 sub-space per media id — enforce the bound
    // instead of silently colliding with the next item's range.
    val frameBits = 20
    items.flatMap { item =>
      val frames = codec.sampleFrames(item, everyMs)
      require(frames.size < (1 << frameBits),
        s"media ${item.mediaId}: ${frames.size} frames exceeds the " +
          s"2^$frameBits id sub-space; raise everyMs")
      frames.zipWithIndex.map { case (frame, i) =>
        MediaItem(
          (item.mediaId << frameBits) + i,
          frame,
          item.meta.copy(kind = "frame", durationMs = 0))
      }
    }
  }

  // -------------------------------------------------------------------------
  // Real image decode (javax.imageio — JVM built-in, no external libs)
  // -------------------------------------------------------------------------

  /** Per-image features from a REAL decode: dimensions, exact per-channel
    * means, and an md5 over a deterministic 8×8 nearest-neighbor RGB
    * thumbnail. `ok = false` rows carry undecodable blobs (corrupt bytes,
    * unsupported container) — a curation pipeline filters or audits them
    * rather than crashing the job. */
  case class ImageFeatures(
      mediaId: Long,
      ok: Boolean,
      width: Int,
      height: Int,
      meanR: Double,
      meanG: Double,
      meanB: Double,
      thumbnailHash: String
  )

  /** `ImageIO` writes a disk-backed cache stream per encode/decode by
    * default — pure overhead for in-memory executor batches. Disabled once
    * per JVM. */
  private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode over `javax.imageio` (PNG/JPEG/BMP/GIF readers ship
    * with every JVM). Same scale discipline as [[extractFeatures]]: decode
    * per partition, blob never shuffled, output is small fixed-width rows.
    *
    * Determinism: channel sums are exact integer arithmetic and the
    * thumbnail is a manual nearest-neighbor sample (`sx = tx·w / 8`), not
    * an AWT scaler — the same blob yields the identical row on any JVM.
    * The 6-decimal mean uses floor (exact on doubles), matching the
    * engine-portability discipline of every other float column. */
  def imageFeatures(items: Dataset[MediaItem]): Dataset[ImageFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      imageIoInit
      it.map { item =>
        val img =
          // NonFatal, not just IOException: malformed-but-recognized
          // containers make ImageIO plugin readers throw CMMException /
          // IndexOutOfBounds / NegativeArraySize — a corrupt blob must
          // become an ok=false row, never a job failure.
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(item.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          ImageFeatures(item.mediaId, ok = false, -1, -1, 0.0, 0.0, 0.0, "")
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val p = row(x)
              sr += (p >> 16) & 0xff
              sg += (p >> 8) & 0xff
              sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val side = 8
          val thumb = new Array[Byte](side * side * 3)
          var ty = 0
          while (ty < side) {
            val sy = ty * h / side
            var tx = 0
            while (tx < side) {
              val p = img.getRGB(tx * w / side, sy)
              val o = (ty * side + tx) * 3
              thumb(o) = ((p >> 16) & 0xff).toByte
              thumb(o + 1) = ((p >> 8) & 0xff).toByte
              thumb(o + 2) = (p & 0xff).toByte
              tx += 1
            }
            ty += 1
          }
          val hash = java.security.MessageDigest
            .getInstance("MD5")
            .digest(thumb)
            .map("%02x".format(_))
            .mkString
          ImageFeatures(
            item.mediaId, ok = true, w, h,
            math.floor(sr.toDouble / n * 1e6) / 1e6,
            math.floor(sg.toDouble / n * 1e6) / 1e6,
            math.floor(sb.toDouble / n * 1e6) / 1e6,
            hash)
        }
      }
    }
  }

  case class AudioFeatures(
      mediaId: Long,
      ok: Boolean,
      sampleRate: Int,
      channels: Int,
      nSamples: Long,
      maxAbs: Long,
      sumSq: Long,
      zeroCrossings: Long
  )

  /** REAL audio decode over `javax.sound.sampled` (the WAV reader ships
    * with every JVM — no external codec). Same scale discipline as
    * [[imageFeatures]]: decode per partition, blob never shuffled, output
    * is small fixed-width rows; a non-audio or non-PCM16 blob yields an
    * ok=false row, never a job failure.
    *
    * Every feature is exact integer arithmetic over the int16 samples
    * (sum of squares, max amplitude, sign-change count), so the row is
    * bit-deterministic on any JVM and reproducible by any engine that
    * can see the same samples. */
  /** The JVM's WAV `AudioFileReader` resolved ONCE (the public SPI —
    * the same provider `AudioSystem.getAudioInputStream` would pick).
    * AudioSystem re-walks a SYNCHRONIZED provider registry on every
    * call, which serializes concurrent decode tasks: once the encode
    * spread landed (round 16), 32-way audio decode stages showed ~10×
    * executorRunTime inflation from exactly that lock. Caching the
    * provider removes the registry walk; the decode path itself — the
    * provider's reader — is unchanged, and [[openWav]] falls back to
    * AudioSystem if no SPI provider accepts a probe WAV. */
  private lazy val wavReader
      : Option[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val probe = encodeWav(8000, Array[Short](0, 1, 2, 3))
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala
      .find { r =>
        try {
          r.getAudioInputStream(
            new java.io.ByteArrayInputStream(probe)).close()
          true
        } catch { case scala.util.control.NonFatal(_) => false }
      }
  }

  /** Open WAV bytes through the cached provider (lock-free hot path);
    * behaves exactly like `AudioSystem.getAudioInputStream` on EVERY
    * input: when the cached provider rejects a particular stream (a WAV
    * variant only another registered provider decodes — IEEE-float,
    * WAVE_EXTENSIBLE), fall back to the full AudioSystem walk before
    * propagating, so the fast path never silently reclassifies a
    * decodable input as ok=false (round-16 ADVICE). The lock is paid
    * only on the rare fallback, never on the PCM16 hot path. */
  private def openWav(
      bytes: Array[Byte]): javax.sound.sampled.AudioInputStream =
    wavReader match {
      case Some(r) =>
        try r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch {
          case scala.util.control.NonFatal(_) =>
            javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
        }
      case None =>
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
    }

  def audioFeatures(items: Dataset[MediaItem]): Dataset[AudioFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { item =>
        try {
          val ais = openWav(item.content)
          val fmt = ais.getFormat
          val bytes = ais.readAllBytes()
          ais.close()
          // Mono-only, like the PCM16 gate: the loop below treats the byte
          // stream as one flat sample sequence, so on stereo input
          // nSamples would count frames×channels and zeroCrossings would
          // count sign changes across interleaved L/R — wrong-but-plausible
          // stats. Refuse (ok=false) rather than mislead.
          if (fmt.getSampleSizeInBits != 16 ||
            fmt.getChannels != 1 ||
            fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            AudioFeatures(item.mediaId, ok = false, 0, 0, 0L, 0L, 0L, 0L)
          else {
            val be = fmt.isBigEndian
            val n = bytes.length / 2
            var sumSq = 0L; var maxAbs = 0L; var zc = 0L
            var prevNonNeg = true; var first = true
            var j = 0
            while (j < n) {
              val b0 = bytes(2 * j) & 0xff
              val b1 = bytes(2 * j + 1) & 0xff
              val raw = if (be) (b0 << 8) | b1 else (b1 << 8) | b0
              val v = if (raw >= 32768) raw - 65536 else raw
              sumSq += v.toLong * v
              val a = math.abs(v.toLong); if (a > maxAbs) maxAbs = a
              val nonNeg = v >= 0
              if (!first && nonNeg != prevNonNeg) zc += 1
              prevNonNeg = nonNeg; first = false
              j += 1
            }
            AudioFeatures(item.mediaId, ok = true, fmt.getSampleRate.toInt,
              fmt.getChannels, n.toLong, maxAbs, sumSq, zc)
          }
        } catch {
          // NonFatal for the same reason as imageFeatures: a malformed
          // WAV header can throw beyond the two documented exceptions.
          case scala.util.control.NonFatal(_) =>
            AudioFeatures(item.mediaId, ok = false, 0, 0, 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  case class ResizedImage(
      mediaId: Long,
      ok: Boolean,
      width: Int,
      height: Int,
      content: Array[Byte]
  )

  /** REAL image resize: decode with ImageIO, nearest-neighbor sample to
    * (w, h) — the SAME deterministic sampler as [[imageFeatures]]'s
    * thumbnail (`sx = tx·srcW / w`), never an AWT scaler whose filtering
    * varies by JVM — and re-encode as lossless PNG. Per partition, blob
    * in / blob out, no shuffle; undecodable blobs yield ok=false with
    * empty content. The resize-then-decode round trip is bit-exact
    * (spec-pinned), which is what makes the op auditable at all. */
  def resizeImages(
      items: Dataset[MediaItem], w: Int, h: Int): Dataset[ResizedImage] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      imageIoInit
      it.map { item =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(item.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          ResizedImage(item.mediaId, ok = false, -1, -1, Array.emptyByteArray)
        else {
          val sw = img.getWidth; val sh = img.getHeight
          val rgb = new Array[Byte](w * h * 3)
          var ty = 0
          while (ty < h) {
            val sy = ty * sh / h
            var tx = 0
            while (tx < w) {
              val p = img.getRGB(tx * sw / w, sy)
              val o = (ty * w + tx) * 3
              rgb(o) = ((p >> 16) & 0xff).toByte
              rgb(o + 1) = ((p >> 8) & 0xff).toByte
              rgb(o + 2) = (p & 0xff).toByte
              tx += 1
            }
            ty += 1
          }
          ResizedImage(item.mediaId, ok = true, w, h, encodePng(w, h, rgb))
        }
      }
    }
  }

  case class AudioSegment(
      mediaId: Long,
      segmentIdx: Int,
      nSamples: Long,
      maxAbs: Long,
      sumSq: Long
  )

  /** Audio segmentation — the audio twin of video frame sampling: decode
    * a WAV blob once, split its sample sequence into `nSegments` equal
    * spans (boundary j·n/k, the same integer arithmetic as frame
    * sampling), and emit per-segment exact integer statistics. flatMap
    * shape: blob never shuffled, one small row per segment; undecodable
    * or non-PCM16 blobs contribute zero rows (they are surfaced by
    * [[audioFeatures]]' ok=false path, not silently here, so a pipeline
    * composes `audioFeatures` for auditing with `segmentAudio` for
    * features). */
  def segmentAudio(
      items: Dataset[MediaItem], nSegments: Int): Dataset[AudioSegment] = {
    import items.sparkSession.implicits._
    require(nSegments >= 1, s"need nSegments >= 1, got $nSegments")
    items.flatMap { item =>
      try {
        val ais = openWav(item.content)
        val fmt = ais.getFormat
        val bytes = ais.readAllBytes()
        ais.close()
        // Same mono gate as audioFeatures — interleaved stereo would make
        // the per-span stats mix channels silently.
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getChannels != 1 ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) Seq.empty
        else {
          val be = fmt.isBigEndian
          val n = bytes.length / 2
          def sample(j: Int): Int = {
            val b0 = bytes(2 * j) & 0xff; val b1 = bytes(2 * j + 1) & 0xff
            val raw = if (be) (b0 << 8) | b1 else (b1 << 8) | b0
            if (raw >= 32768) raw - 65536 else raw
          }
          (0 until nSegments).flatMap { k =>
            val lo = k.toLong * n / nSegments
            val hi = (k + 1).toLong * n / nSegments
            if (hi <= lo) Seq.empty
            else {
              var sumSq = 0L; var maxAbs = 0L
              var j = lo.toInt
              while (j < hi) {
                val v = sample(j)
                sumSq += v.toLong * v
                val a = math.abs(v.toLong); if (a > maxAbs) maxAbs = a
                j += 1
              }
              Seq(AudioSegment(item.mediaId, k, hi - lo, maxAbs, sumSq))
            }
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) => Seq.empty
      }
    }
  }

  case class AudioFingerprint(mediaId: Long, windowIdx: Int, fp: Long)

  /** Per-WINDOW perceptual fingerprint of audio clips — the audio face
    * of the hamming dedup engine, the exact analog of [[imageDHash]]'s
    * grid fold: decode a WAV blob once (same PCM16-mono gate as
    * [[segmentAudio]]), split the sample sequence into `nWindows` equal
    * windows (boundary k·n/W, the frame/segment integer rule), fold each
    * window into 57 equal sub-buckets of summed sample energy (Σ v²,
    * exact Long — ≤ 2³⁰ per sample, so even hour-long 48 kHz windows
    * stay far below overflow), and emit one bit per neighbor-bucket
    * energy comparison — 56 bits, the same non-negative-BIGINT width as
    * the image dHash, pairable by the SAME
    * [[graft.dedup.Dedup.hammingPairs]] /
    * [[graft.dedup.Dedup.hammingPairsIncremental]] engine.
    *
    * Why energy-ordering bits: a re-encoded / re-gained upload rescales
    * amplitudes roughly uniformly, and Σv² comparisons are invariant to
    * any uniform gain (both sides scale by gain²), so twins land within
    * a few bits — while unrelated clips agree per bit with probability
    * ~1/2. WINDOW-level (not clip-level) so a clip embedded in a longer
    * recording still matches on its aligned windows.
    *
    * `nWindows ≤ 9` is enforced because downstream queries encode the
    * window id as `media_id·10 + window_idx` (the frame-id encoding);
    * flatMap shape: the blob never shuffles, only (id, windowIdx,
    * 8-byte fp) rows; undecodable / non-PCM16-mono blobs contribute
    * zero rows (audited via [[audioFeatures]]' ok=false path, the
    * [[segmentAudio]] contract). */
  def audioFingerprints(
      items: Dataset[MediaItem], nWindows: Int): Dataset[AudioFingerprint] = {
    import items.sparkSession.implicits._
    require(nWindows >= 1 && nWindows <= 9,
      s"need 1 <= nWindows <= 9 (media_id*10 window-id encoding), got $nWindows")
    val buckets = 57
    items.flatMap { item =>
      try {
        val ais = openWav(item.content)
        val fmt = ais.getFormat
        val bytes = ais.readAllBytes()
        ais.close()
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getChannels != 1 ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) Seq.empty
        else {
          val be = fmt.isBigEndian
          val n = bytes.length / 2
          def sample(j: Int): Int = {
            val b0 = bytes(2 * j) & 0xff; val b1 = bytes(2 * j + 1) & 0xff
            val raw = if (be) (b0 << 8) | b1 else (b1 << 8) | b0
            if (raw >= 32768) raw - 65536 else raw
          }
          (0 until nWindows).flatMap { k =>
            val lo = k.toLong * n / nWindows
            val hi = (k + 1).toLong * n / nWindows
            val wn = hi - lo
            if (wn <= 0L) Seq.empty
            else {
              val e = new Array[Long](buckets)
              var t = 0
              while (t < buckets) {
                val blo = lo + t.toLong * wn / buckets
                val bhi = lo + (t + 1).toLong * wn / buckets
                var sum = 0L
                var j = blo.toInt
                while (j < bhi) {
                  val v = sample(j)
                  sum += v.toLong * v
                  j += 1
                }
                e(t) = sum
                t += 1
              }
              var fp = 0L
              var b = 0
              while (b < buckets - 1) {
                if (e(b) > e(b + 1)) fp |= 1L << b
                b += 1
              }
              Seq(AudioFingerprint(item.mediaId, k, fp))
            }
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) => Seq.empty
      }
    }
  }

  /** int16 mono samples → real WAV bytes (PCM16 little-endian), via the
    * JVM's own writer. WAV PCM is lossless, so `audioFeatures ∘ encodeWav`
    * recovers the input samples exactly — the property the synthetic
    * corpus oracle relies on. */
  /** The JVM's WAVE `AudioFileWriter` resolved ONCE — the writer-side
    * twin of [[wavReader]]: `AudioSystem.write` re-walks the same
    * synchronized provider registry per call, serializing 32 concurrent
    * encode tasks. The bytes written are the provider's own, identical
    * to what AudioSystem.write produces. */
  private lazy val wavWriter
      : Option[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    // Select against a PCM16 PROBE STREAM, not just the WAVE file type:
    // more than one JDK writer claims Type.WAVE (WaveFileWriter and
    // WaveFloatFileWriter), and type-only selection depends on
    // ServiceLoader enumeration order — on a classpath where a non-PCM
    // WAVE writer enumerates first, every PCM encode would throw
    // (round-16 ADVICE). The stream-aware overload picks exactly the
    // writer AudioSystem.write would use for these streams.
    val probeFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val probe = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](8)), probeFmt, 4L)
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(w =>
        try w.isFileTypeSupported(
          javax.sound.sampled.AudioFileFormat.Type.WAVE, probe)
        catch { case scala.util.control.NonFatal(_) => false })
  }

  def encodeWav(sampleRate: Int, pcm: Array[Short]): Array[Byte] = {
    val data = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) {
      data(2 * i) = (pcm(i) & 0xff).toByte
      data(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    def ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, pcm.length.toLong)
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    val bos = new java.io.ByteArrayOutputStream()
    wavWriter match {
      case Some(w) =>
        // Belt over the probe-selection braces: if the cached writer
        // rejects THIS stream, redo through AudioSystem (fresh streams —
        // the failed attempt may have consumed/partially written).
        try w.write(ais, wave, bos)
        catch {
          case scala.util.control.NonFatal(_) =>
            bos.reset()
            javax.sound.sampled.AudioSystem.write(ais, wave, bos)
        }
      case None => javax.sound.sampled.AudioSystem.write(ais, wave, bos)
    }
    bos.toByteArray
  }

  /** Synthetic REAL-WAV corpus: per source row, `n = 64 + id % 65` mono
    * samples at `8000 + (id % 4) * 4000` Hz; sample j is the
    * little-endian int16 at bytes 2·(j mod 8) of md5(text ++ ":" ++
    * (j div 8)) — 8 samples per digest block, never straddling blocks, so
    * any engine can recompute the exact sample sequence. WAV PCM being
    * lossless makes the REAL decode path oracle-checkable end-to-end
    * (`q_audio_decode`). */
  /** (id, text) source rows spread to the session's core count before a
    * synthetic ENCODE pass (round-16, guide §2.5 "input skew: fix at the
    * source or repartition immediately after the read"): the codec work
    * per row dwarfs the shuffle of a (long, string) pair by orders of
    * magnitude, and the documents scan these corpora derive from is a
    * single small parquet file — one partition — so without the spread
    * the whole corpus encodes ON ONE CORE (measured at sf0.1: a 12 s
    * single-task encode stage inside the video stream gate). Keyed by
    * id (deterministic under retries — guide §2.5 warns off rand-keyed
    * repartitions); skipped when the incoming plan is already at least
    * that parallel (a production many-file scan must not be coalesced
    * DOWN by a fixture-shaped helper). Streaming frames can't probe
    * their partition count, but a micro-batch is file-grained — the
    * skew this exists to fix — so they always spread. */
  private def spreadForEncode(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sel = df.select(col(idCol).cast("long").as("__sid"), col(textCol))
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (sel.isStreaming) sel.repartition(p, col("__sid"))
    else if (graft.dedup.Dedup.inputWidth(sel).exists(_ < p))
      sel.repartition(p, col("__sid"))
    else sel
  }

  def syntheticWavCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      amplitudeDelta: Int = 0,
      extraSamples: Int = 0
  ): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    require(extraSamples >= 0, s"need extraSamples >= 0, got $extraSamples")
    spreadForEncode(df, idCol, textCol)
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          // extraSamples lengthens every clip uniformly (the md5 chain
          // just continues) — the stress harness uses it to test at
          // realistic clip lengths, where every fingerprint bucket is
          // populated; the oracle-checked queries keep the documented
          // default n = 64 + id % 65.
          val n = (64 + id % 65).toInt + extraSamples
          val rate = (8000 + (id % 4) * 4000).toInt
          val pcm = new Array[Short](n)
          var j = 0
          var dg: Array[Byte] = null
          while (j < n) {
            if (j % 8 == 0) dg = md.digest((text + ":" + (j / 8)).getBytes("UTF-8"))
            val k = 2 * (j % 8)
            val raw = (dg(k) & 0xff) | ((dg(k + 1) & 0xff) << 8)
            val v = if (raw >= 32768) raw - 65536 else raw
            // amplitudeDelta: a uniform clamped shift of every sample —
            // the audio near-dup perturbation knob, the WAV twin of
            // syntheticPngCorpus's brightnessDelta. Clamped at BOTH
            // int16 ends so the shift never wraps. Delta 0 reproduces
            // the original samples.
            pcm(j) = math.max(-32768,
              math.min(v + amplitudeDelta, 32767)).toShort
            j += 1
          }
          MediaItem(id, encodeWav(rate, pcm),
            MediaMeta("audio", 0, 0, n * 1000L / rate, "wav"))
        }
      }
  }

  /** Row-major interleaved RGB bytes → real PNG bytes. PNG is lossless on
    * 8-bit RGB, so `imageFeatures ∘ encodePng` recovers the input pixels
    * exactly — the property the synthetic-corpus oracle relies on. */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    imageIoInit
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        i += 3; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthetic REAL-PNG corpus: per source row, dimensions
    * `w = 8 + id % 9`, `h = 8 + id % 7` and pixel byte j =
    * byte (j mod 16) of md5(text ++ ":" ++ (j div 16)) — an md5 chain any
    * engine can recompute. Because PNG is lossless, decoding these blobs
    * recovers exactly those bytes, which is what makes the REAL
    * ImageIO decode path oracle-checkable end-to-end (`q_image_decode`):
    * DuckDB re-derives the channel means straight from the md5 chain and
    * must match the decoder's output bit-for-bit. */
  def syntheticPngCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      brightnessDelta: Int = 0
  ): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    spreadForEncode(df, idCol, textCol)
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val w = (8 + id % 9).toInt
          val h = (8 + id % 7).toInt
          val n = w * h * 3
          val px = new Array[Byte](n)
          var c = 0; var o = 0
          while (o < n) {
            val dg = md.digest((text + ":" + c).getBytes("UTF-8"))
            var k = 0
            while (k < 16 && o < n) {
              // brightnessDelta: a uniform clamped shift of every channel
              // — the near-dup perturbation for the perceptual-hash tests
              // (dHash is invariant to it except where a clamp breaks
              // uniformity). Delta 0 reproduces the original bytes.
              // Clamped at BOTH ends: a negative delta must floor at 0,
              // not wrap through toByte (2 + (-4) is 0, never 254).
              val v = math.max(0, math.min((dg(k) & 0xff) + brightnessDelta, 255))
              px(o) = v.toByte
              k += 1; o += 1
            }
            c += 1
          }
          MediaItem(id, encodePng(w, h, px), MediaMeta("image", w, h, 0L, "png"))
        }
      }
  }

  /** Perceptual difference-hash (dHash) from a REAL decode: sample an
    * `8×8` grid of integer-weighted grayscale values (nearest-neighbor,
    * `sx = tx·w / 8` — the same integer resample rule as [[resizeImages]])
    * and emit one bit per horizontal neighbor comparison — 7 bits × 8
    * rows = a 56-bit hash (56, not 64, so the pack always fits a
    * non-negative BIGINT in every engine). Gray = 299·R + 587·G + 114·B
    * (integer ITU-R 601 weights, undivided — comparisons are
    * scale-invariant, so the division would only lose information).
    *
    * dHash is the standard cheap image near-dup signature: invariant to
    * uniform brightness shift and to any resample that preserves the
    * neighbor ordering; two visually-identical images land within a few
    * bits, so the text-side hamming machinery ([[graft.dedup.Dedup]])
    * clusters images exactly like simhashes. Per-partition codec; the
    * blob never shuffles. */
  case class ImageHash(mediaId: Long, ok: Boolean, phash: Long)

  def imageDHash(items: Dataset[MediaItem]): Dataset[ImageHash] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      imageIoInit
      it.map { item =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(item.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ImageHash(item.mediaId, ok = false, 0L)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val side = 8
          val g = new Array[Long](side * side)
          var ty = 0
          while (ty < side) {
            val sy = ty * h / side
            var tx = 0
            while (tx < side) {
              val p = img.getRGB(tx * w / side, sy)
              g(ty * side + tx) =
                299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
                  114L * (p & 0xff)
              tx += 1
            }
            ty += 1
          }
          var hash = 0L
          var bit = 0
          ty = 0
          while (ty < side) {
            var tx = 0
            while (tx < side - 1) {
              if (g(ty * side + tx) > g(ty * side + tx + 1))
                hash |= 1L << bit
              bit += 1
              tx += 1
            }
            ty += 1
          }
          ImageHash(item.mediaId, ok = true, hash)
        }
      }
    }
  }

  // -------------------------------------------------------------------------
  // Real multi-frame decode (animated GIF via javax.imageio — the one
  // multi-frame container the JVM can decode offline)
  // -------------------------------------------------------------------------

  /** Per-frame features from a REAL multi-frame decode. Integer-only
    * statistics (pixel sum / sum of squares over the 8-bit gray values),
    * so the row is bit-deterministic on any JVM — no float-parity caveats
    * at all. */
  case class FrameFeatures(
      mediaId: Long,
      frameIdx: Int,
      width: Int,
      height: Int,
      sumGray: Long,
      sumSqGray: Long
  )

  /** Identity 256-entry grayscale palette (index v → RGB (v,v,v)). GIF is
    * palette-indexed, so writing TYPE_BYTE_INDEXED pixels against this
    * palette is LOSSLESS — the property that makes the multi-frame decode
    * oracle-checkable, exactly like PNG for [[imageFeatures]] (an RGB
    * source would be color-quantized by the writer and nothing would be
    * bit-exact). */
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** `nFrames` full-size grayscale frames (each `w*h` bytes, row-major) →
    * real animated-GIF bytes via the JVM's own ImageIO sequence writer.
    * Each frame is written as a complete image block (no inter-frame
    * delta/disposal tricks), so `read(i)` on the decode side returns
    * exactly frame i as encoded. */
  def encodeAnimatedGif(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    imageIoInit
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { px =>
      require(px.length == w * h, s"need ${w * h} bytes, got ${px.length}")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      val raster = img.getRaster
      var y = 0; var i = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, px(i) & 0xff); i += 1; x += 1 }
        y += 1
      }
      // Interlacing OFF: the JDK writer defaults to interlaced frames and
      // its interlace round trip is broken on small heights (rows come
      // back permuted and the final pass is dropped — observed on
      // JDK 17: a 5×4 frame loses its last row entirely). Non-progressive
      // frames round-trip bit-exactly.
      val p = writer.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), p)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** REAL multi-frame decode + frame sampling: every `stride`-th frame of
    * each animated GIF (`ImageReader.getNumImages(true)` / `read(i)` —
    * the JDK GIF plugin decodes every frame offline). Decode-once flatMap,
    * the video twin of [[segmentAudio]]: the blob is read in its scan
    * partition, never shuffled, and each sampled frame emits one small
    * integer-stats row. Undecodable blobs yield zero rows here and are
    * audited via [[imageFeatures]]' ok=false path; a single-image
    * container (PNG/JPEG) decodes as a 1-frame stream and emits its one
    * frame — consistent with a 1-frame GIF.
    *
    * This retires the stub-codec byte-slice sampling from the declared
    * surface: frames here are real decoded rasters, bit-exact against the
    * synthetic corpus oracle ([[syntheticGifCorpus]]). */
  def gifFrames(
      items: Dataset[MediaItem], stride: Int = 1): Dataset[FrameFeatures] = {
    import items.sparkSession.implicits._
    require(stride >= 1, s"need stride >= 1, got $stride")
    items.flatMap { item =>
      imageIoInit
      try {
        // iis/reader lifecycle: setInput lives INSIDE the try whose
        // finally disposes — if it throws, the outer NonFatal catch
        // would otherwise swallow the error with both handles leaked.
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(item.content))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Seq.empty
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              (0 until n by stride).map { i =>
                val img = reader.read(i)
                val w = img.getWidth; val h = img.getHeight
                var sum = 0L; var sumSq = 0L
                val row = new Array[Int](w)
                var y = 0
                while (y < h) {
                  img.getRGB(0, y, w, 1, row, 0, w)
                  var x = 0
                  while (x < w) {
                    val v = row(x) & 0xff
                    sum += v; sumSq += v.toLong * v
                    x += 1
                  }
                  y += 1
                }
                FrameFeatures(item.mediaId, i, w, h, sum, sumSq)
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch {
        case scala.util.control.NonFatal(_) => Seq.empty
      }
    }
  }

  /** Synthetic REAL animated-GIF corpus: per source row, dimensions
    * `w = 6 + id % 5`, `h = 6 + id % 3`, frame count `2 + id % 4`; frame
    * f's pixel byte j is byte (j mod 16) of
    * md5(text ++ ":" ++ f ++ ":" ++ (j div 16)) — an md5 chain any engine
    * can recompute. Indexed-grayscale GIF is lossless, so decoding these
    * blobs recovers exactly those bytes (`q_frame_decode`). */
  def syntheticGifCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      brightnessDelta: Int = 0
  ): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    spreadForEncode(df, idCol, textCol)
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val w = (6 + id % 5).toInt
          val h = (6 + id % 3).toInt
          val nf = (2 + id % 4).toInt
          val frames = (0 until nf).map { f =>
            val n = w * h
            val px = new Array[Byte](n)
            var c = 0; var o = 0
            while (o < n) {
              val dg = md.digest((s"$text:$f:$c").getBytes("UTF-8"))
              var k = 0
              while (k < 16 && o < n) {
                // brightnessDelta: uniform clamped shift — the same
                // near-dup perturbation knob as syntheticPngCorpus's.
                val v = math.max(
                  0, math.min((dg(k) & 0xff) + brightnessDelta, 255))
                px(o) = v.toByte
                k += 1; o += 1
              }
              c += 1
            }
            px
          }
          MediaItem(id, encodeAnimatedGif(w, h, frames),
            MediaMeta("video", w, h, nf * 100L, "gif"))
        }
      }
  }

  /** Per-FRAME perceptual hash of multi-frame containers: the frame
    * twin of [[imageDHash]], sharing its exact 8×8 nearest-neighbor
    * grid, ITU-R 601 integer gray weights and 56-bit row-comparison
    * fold, over [[gifFrames]]' real multi-frame decode. One row per
    * sampled frame; undecodable blobs yield zero rows (audited via
    * [[imageFeatures]]' ok=false path, same contract as gifFrames).
    * Decode + hash are per-blob map work — the blob never shuffles,
    * only (mediaId, frameIdx, 8-byte hash) rows do. */
  case class FrameHash(mediaId: Long, frameIdx: Int, phash: Long)

  def gifFrameHashes(
      items: Dataset[MediaItem], stride: Int = 1): Dataset[FrameHash] = {
    import items.sparkSession.implicits._
    require(stride >= 1, s"need stride >= 1, got $stride")
    items.flatMap { item =>
      imageIoInit
      try {
        // Same iis/reader lifecycle discipline as [[gifFrames]]:
        // setInput inside the dispose-guarded try, iis closed by its
        // own finally, so a throwing setInput can't leak either handle.
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(item.content))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Seq.empty
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              (0 until n by stride).map { i =>
                val img = reader.read(i)
                val w = img.getWidth; val h = img.getHeight
                val side = 8
                val g = new Array[Long](side * side)
                var ty = 0
                while (ty < side) {
                  val sy = ty * h / side
                  var tx = 0
                  while (tx < side) {
                    val p = img.getRGB(tx * w / side, sy)
                    g(ty * side + tx) =
                      299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
                        114L * (p & 0xff)
                    tx += 1
                  }
                  ty += 1
                }
                var hash = 0L
                var bit = 0
                ty = 0
                while (ty < side) {
                  var tx = 0
                  while (tx < side - 1) {
                    if (g(ty * side + tx) > g(ty * side + tx + 1))
                      hash |= 1L << bit
                    bit += 1
                    tx += 1
                  }
                  ty += 1
                }
                FrameHash(item.mediaId, i, hash)
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch {
        case scala.util.control.NonFatal(_) => Seq.empty
      }
    }
  }

  /** Demo/test source: fabricate a binary corpus from the documents table
    * (UTF-8 bytes as the "blob"), with plausible metadata. Real
    * deployments read `binaryFile` sources or parquet with a binary
    * column — the schema is identical. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaItem] =
    mediaFromDocs(spark.read.parquet(s"$dir/documents.parquet"))

  /** [[mediaFromDocuments]] over an arbitrary (doc_id, text, n_chars)
    * frame — batch OR streaming (the mapping is a stateless per-row
    * projection, so the ingest gates can fabricate arriving media items
    * with identical metadata). */
  def mediaFromDocs(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id").as("mediaId"),
        encode(col("text"), "UTF-8").as("content"),
        struct(
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          lit(64).as("width"),
          lit(64).as("height"),
          (col("n_chars") * 10).cast("long").as("durationMs"),
          lit("stub").as("format")
        ).as("meta")
      )
      .as[MediaItem]
  }
}
