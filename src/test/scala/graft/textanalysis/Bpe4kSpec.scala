package graft.textanalysis

import org.scalatest.funsuite.AnyFunSuite

/** The 4096-merge realistic-vocabulary table: determinism, training
  * consistency, and encoder equality (priority-merge vs the sequential
  * per-merge fold the expression path / oracle use). Pure driver-side —
  * no Spark session needed. */
class Bpe4kSpec extends AnyFunSuite {

  /** Reference encoder: apply merges IN TABLE ORDER, one full pass per
    * merge — the semantics of [[Bpe.encodeExpr]] and the DuckDB fold. */
  private def sequentialEncode(
      tok: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms: Vector[String] = tok.map(_.toString).toVector
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
          out += a + b; j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("the synthetic stream sustains exactly 4096 merges") {
    assert(Bpe.Merges4kHex.size == Bpe.Merges4kCount)
  }

  test("the table is training-consistent and duplicate-free") {
    assert(Bpe.isTrainingConsistent(Bpe.Merges4kHex))
    assert(Bpe.Merges4kHex.distinct.size == Bpe.Merges4kHex.size)
  }

  test("training is deterministic (a fresh second run yields the identical table)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = (0 until 500).map { i =>
      val h = md.digest(s"bpe4k:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (h, 1L)
    }
    assert(Bpe.trainMerges(counts, Bpe.Merges4kCount) == Bpe.Merges4kHex)
  }

  test("priority-merge encoding equals the sequential fold on held-out hex tokens") {
    // Tokens the trainer never saw (different salt) — the equality must
    // hold for any input under training consistency, not just the
    // training set.
    val md = java.security.MessageDigest.getInstance("MD5")
    val idx = Bpe.Merges4kHex.toIndexedSeq
    val ranks = idx.zipWithIndex.toMap
    (0 until 50).foreach { i =>
      val tok = md.digest(s"heldout:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val fast = Bpe.encodeLocal(tok, idx, ranks)
      val slow = sequentialEncode(tok, Bpe.Merges4kHex)
      assert(fast == slow, s"token $tok: $fast != $slow")
    }
  }

  test("4k encoding is strictly coarser than 512 (same stream, fewer subwords)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val idx4k = Bpe.Merges4kHex.toIndexedSeq
    val r4k = idx4k.zipWithIndex.toMap
    val idx512 = Bpe.Merges512Hex.toIndexedSeq
    val r512 = idx512.zipWithIndex.toMap
    val toks = (0 until 50).map(i =>
      md.digest(s"coarse:$i".getBytes("UTF-8")).map(b => f"$b%02x").mkString)
    val n4k = toks.map(t => Bpe.encodeLocal(t, idx4k, r4k).length).sum
    val n512 = toks.map(t => Bpe.encodeLocal(t, idx512, r512).length).sum
    assert(n4k < n512, s"4k table not coarser: $n4k vs $n512 subwords")
  }
}
