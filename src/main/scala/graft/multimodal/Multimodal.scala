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

  /** Demo/test source: fabricate a binary corpus from the documents table
    * (UTF-8 bytes as the "blob"), with plausible metadata. Real
    * deployments read `binaryFile` sources or parquet with a binary
    * column — the schema is identical. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    spark.read
      .parquet(s"$dir/documents.parquet")
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
