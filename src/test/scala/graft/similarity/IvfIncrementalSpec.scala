package graft.similarity

import graft.SparkSuite

/** Pins [[Ivf.semanticDedupIncremental]]'s batch×corpus-only pair
  * discipline behaviorally: identical vectors WITHIN the batch and
  * WITHIN the corpus must produce nothing; only batch-vs-corpus matches
  * appear, and only batch ids are ever returned. */
class IvfIncrementalSpec extends SparkSuite {

  test("only batch-vs-corpus pairs are generated") {
    import spark.implicits._
    // Centroids: id 0 → (1,0,0,0) cell 0, id 1 → (0,1,0,0) cell 1.
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      // Identical corpus pair (cosine 1.0) — must NEVER pair up.
      (2L, Seq(0.9, 0.1, 0.0, 0.0)),
      (3L, Seq(0.9, 0.1, 0.0, 0.0)),
      (4L, Seq(0.1, 0.9, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      // Identical batch pair (cosine 1.0), orthogonal to every corpus
      // vector — must produce NO rows (batch×batch is never compared).
      (100L, Seq(0.0, 0.0, 1.0, 0.0)),
      (101L, Seq(0.0, 0.0, 1.0, 0.0)),
      // Matches corpus ids 1 and 4 in cell 1.
      (102L, Seq(0.1, 0.9, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val out = Ivf
      .semanticDedupIncremental(corpus, batch, Seq(0L, 1L), 0.9)
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(out == Seq((102L, 1L, 2L, 1.0)))
  }

  test("empty batch yields an empty drop list, corpus dups notwithstanding") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.0)),
      (3L, Seq(1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val batch = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(
      Ivf.semanticDedupIncremental(corpus, batch, Seq(0L, 1L), 0.5)
        .count() == 0L)
  }
}
