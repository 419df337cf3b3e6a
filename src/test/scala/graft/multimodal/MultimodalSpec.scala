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
}
