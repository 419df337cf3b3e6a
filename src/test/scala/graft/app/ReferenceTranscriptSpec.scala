package graft.app

import graft.SparkSuite
import graft.chunk.Chunker
import graft.prep.{PerTranscript, Preprocess}

/** Full pipeline over the reference's own 4,778-segment fixture
  * (/root/reference/transcript-example.json, read-only) — the real
  * workload shape: 7.4 h single-speaker audio transcript. */
class ReferenceTranscriptSpec extends SparkSuite {

  private val path = "/root/reference/transcript-example.json"

  test("reference transcript summarizes end-to-end on the mock client") {
    assume(new java.io.File(path).exists())
    val out = Summarizer.summarizePath(spark, path, Summarizer.Config())
    assert(out.result.segments == 4778)
    // 4000-token chunks over ~7.4h of speech → tens of chunks.
    assert(out.result.chunks > 5 && out.result.chunks < 500)
    assert(out.result.summary.contains("MOCK SUMMARY"))
    assert(out.result.tokensUsed == out.result.chunks * 100 + 100)
    val chunks = out.processedChunks.collect()
    // Chunk invariants at reference scale: ordered, budget-respecting,
    // time-monotone.
    assert(chunks.map(_.chunkIndex).toSeq == chunks.indices)
    assert(chunks.forall(_.tokenCount <= 3850))
    val starts = chunks.map(_.startTime).toSeq
    assert(starts == starts.sorted)
    assert(chunks.last.endTime <= 26562.0)
  }

  test("per-transcript corpus path matches the single-transcript path") {
    assume(new java.io.File(path).exists())
    import spark.implicits._
    val raw = Preprocess.loadTranscript(spark, path)
    val prepped = Preprocess.run(spark, raw)
    val single = Chunker.run(spark, prepped).collect().sortBy(_.chunkIndex)

    // Same transcript replicated under 3 keys through the corpus path.
    val enriched = Preprocess.enrich(spark, raw, Preprocess.PrepConfig())
    val keyed = enriched.flatMap(s =>
      Seq(1L, 2L, 3L).map(PerTranscript.KeyedSegment(_, s)))
    val corpus = PerTranscript
      .preprocessAndChunk(spark, keyed)
      .collect()
      .groupBy(_.transcriptId)
    assert(corpus.keySet == Set(1L, 2L, 3L))
    corpus.values.foreach { chunks =>
      val sorted = chunks.map(_.chunk).sortBy(_.chunkIndex)
      assert(sorted.map(_.text).toSeq == single.map(_.text).toSeq)
      assert(sorted.map(_.tokenCount).toSeq == single.map(_.tokenCount).toSeq)
    }
  }
}
