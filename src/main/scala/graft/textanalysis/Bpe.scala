package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real byte-pair-encoding with a learned merges table (SURVEY §7.5's
  * tokenizer-parity item; reference analog: the chars/4 estimator at
  * llm_executor.py:389-397 — this goes beyond it as far as offline
  * allows: no tiktoken twin exists on the JVM, so the merges are trained
  * from the corpus itself, the standard subword-nmt recipe).
  *
  * Training (Sennrich et al. 2016, arXiv:1508.07909) runs on the WORD
  * FREQUENCY table, not the raw corpus — that is how production BPE
  * trainers work too, and it is what makes corpus-scale training cheap:
  * the distributed part is one `groupBy(token).count()` (map-side
  * combinable); the driver part iterates over the distinct-type table
  * only (Zipf-bounded, capped at `maxTypes`).
  *
  * Encoding applies merges IN LEARNED ORDER, each as a left-to-right
  * non-overlapping pair substitution — subword-nmt's reference `apply`
  * semantics. The trick that keeps the hot path expression-only (no UDF,
  * no mapPartitions): a token is rendered as its characters each wrapped
  * in a reserved separator (`⟂a⟂⟂b⟂`, ⟂ = U+001F), and one
  * merge (a,b)→ab is then EXACTLY a literal `replace` of
  * `⟂a⟂⟂b⟂` with `⟂ab⟂` — `replace` is left-to-right non-overlapping and
  * never rescans its own output, which is precisely BPE's per-merge pass.
  * Wrapping each symbol in its OWN separator pair (not a shared
  * delimiter) is load-bearing: adjacent matches must not share
  * characters, or `replace` would skip every other occurrence
  * ("a b a b" must become "ab ab", not "ab a b"). The same chain is
  * emitted as DuckDB SQL by [[oracleEncodeSql]], so both engines run the
  * IDENTICAL merge fold — full hash-checkability with zero shared code.
  *
  * Scale shape: encoding cost is per DISTINCT token (types ≪
  * occurrences), joined back to the corpus on the token string. Small
  * tables (≤ [[ExprMergeLimit]]) compile the merges into the expression;
  * larger tables switch the distinct-type encode to [[encodeLocal]] — a
  * priority-merge encoder over a broadcast ranks map, `mapPartitions`,
  * same join-back shape — because a production-sized chained-replace
  * fold would blow past codegen's method-size limits. BpeSpec pins the
  * two paths equal on every frozen table and on random trained ones.
  */
object Bpe {

  /** Reserved symbol separator. Tokens are stripped of it pre-encode
    * (both engines), so symbol boundaries can never be forged. U+001F is
    * not matched by `\s`, so the pre-tokenizer could in principle pass it
    * through — the strip closes that hole. */
  val Sep = "\u001f"

  /** Frozen merges, trained from `/root/testdata/sf0.001/documents.parquet`
    * with `trainMergesFromCorpus(docs, 24)` — BpeSpec re-trains and pins
    * this list, so the constant can never drift from the trainer. A
    * fixed (rather than per-run-trained) table is what makes the declared
    * query oracle-checkable at ANY scale factor: both engines must fold
    * the same merges. */
  val MergesV1: Seq[(String, String)] = Seq(
    (" ", "s"),
    ("e", "r"),
    ("o", "r"),
    ("i", "n"),
    ("o", "w"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    (" ", "a"),
    (" ", "v"),
    ("a", "s"),
    (" ", "c"),
    ("m", "er"),
    ("a", "t"),
    (" ", "f"),
    (" ", "t"),
    (" ", "b"),
    ("a", "n"),
    ("c", "an"),
    ("lu", "m"),
    ("lum", "n"),
    ("o", "lumn"),
    ("d", "ow"),
    ("in", "dow")
  )


  /** Frozen full-saturation word-token table: `trainMergesFromCorpus(docs,
    * 512)` on `/root/testdata/sf0.001` stops at 127 merges — the fixture
    * corpus has 61 distinct word types, and at merge 127 every type is a
    * single symbol. 127 > [[ExprMergeLimit]], so the declared query
    * (`q_token_bpe_merges`) runs the scalable [[encodeLocal]] path.
    * BpeSpec re-trains and pins this list. */
  val MergesWordFull: Seq[(String, String)] = Seq(
    (" ", "s"),
    ("e", "r"),
    ("o", "r"),
    ("i", "n"),
    ("o", "w"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    (" ", "a"),
    (" ", "v"),
    ("a", "s"),
    (" ", "c"),
    ("m", "er"),
    ("a", "t"),
    (" ", "f"),
    (" ", "t"),
    (" ", "b"),
    ("a", "n"),
    ("c", "an"),
    ("lu", "m"),
    ("lum", "n"),
    ("o", "lumn"),
    ("d", "ow"),
    ("in", "dow"),
    ("w", "indow"),
    ("d", "er"),
    ("or", "der"),
    ("or", "t"),
    ("par", "t"),
    ("u", "p"),
    (" s", "ort"),
    (" ", "window"),
    (" ", "order"),
    (" c", "olumn"),
    (" s", "can"),
    ("g", "g"),
    (" ", "part"),
    ("a", "lu"),
    ("alu", "e"),
    ("in", "e"),
    ("l", "ine"),
    ("e", "y"),
    ("k", "ey"),
    (" a", "gg"),
    ("j", "o"),
    ("jo", "in"),
    ("g", "e"),
    ("mer", "ge"),
    ("er", "y"),
    ("g", "r"),
    ("gr", "o"),
    ("gro", "up"),
    ("q", "u"),
    ("qu", "ery"),
    (" v", "alue"),
    (" ", "line"),
    ("c", "t"),
    ("ct", "or"),
    ("e", "ctor"),
    (" ", "key"),
    ("as", "h"),
    ("h", "ash"),
    (" ", "join"),
    ("l", "ow"),
    (" ", "query"),
    (" ", "group"),
    ("a", "m"),
    ("e", "am"),
    ("r", "eam"),
    ("t", "ream"),
    ("i", "l"),
    ("il", "t"),
    ("ilt", "er"),
    ("as", "t"),
    (" s", "low"),
    ("at", "c"),
    ("atc", "h"),
    ("h", "e"),
    ("par", "k"),
    (" v", "ector"),
    (" ", "merge"),
    (" s", "tream"),
    (" ", "d"),
    (" f", "ilter"),
    ("a", "b"),
    ("ab", "l"),
    ("abl", "e"),
    (" ", "hash"),
    (" b", "atch"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    (" t", "he"),
    (" f", "ast"),
    ("at", "a"),
    (" s", "park"),
    ("i", "g"),
    ("o", "mer"),
    ("s", "t"),
    ("st", "omer"),
    ("u", "stomer"),
    (" t", "able"),
    (" s", "mall"),
    (" b", "ig"),
    (" d", "ata"),
    (" c", "ustomer"),
    ("r", "ow"),
    (" ", "row"),
    ("s", "can"),
    (" d", "up"),
    ("v", "ector"),
    ("c", "olumn"),
    ("c", "ustomer"),
    ("d", "ata"),
    ("s", "park"),
    ("t", "able"),
    ("f", "ast"),
    ("v", "alue"),
    ("a", "gg"),
    ("s", "mall"),
    ("b", "ig"),
    ("f", "ilter"),
    ("s", "ort"),
    ("t", "he"),
    ("s", "tream"),
    ("b", "atch"),
    ("s", "low")
  )

  /** Frozen 512-merge table trained on the md5-hex chunk stream
    * ([[hexTokenStream]], `trainMergesFromTokens(hexTokenStream(docs),
    * 512)` on `/root/testdata/sf0.001`) — the production-scale table the
    * word corpus cannot sustain. Drives `q_token_bpe_512` through the
    * [[encodeLocal]] path; BpeSpec re-trains and pins this list. */
  val Merges512Hex: Seq[(String, String)] = Seq(
    ("5", "e"),
    ("1", "d"),
    ("2", "e"),
    ("6", "0"),
    ("5", "d"),
    ("5", "8"),
    ("7", "b"),
    ("7", "4"),
    ("f", "c"),
    ("1", "4"),
    ("9", "0"),
    ("f", "d"),
    ("2", "3"),
    ("6", "b"),
    ("a", "0"),
    ("f", "e"),
    ("1", "b"),
    ("f", "b"),
    ("7", "3"),
    ("6", "8"),
    ("5", "3"),
    ("9", "c"),
    ("7", "0"),
    ("2", "d"),
    ("7", "8"),
    ("9", "e"),
    ("9", "8"),
    ("6", "e"),
    ("9", "4"),
    ("9", "b"),
    ("6", "d"),
    ("7", "d"),
    ("6", "4"),
    ("2", "c"),
    ("2", "a"),
    ("1", "3"),
    ("1", "8"),
    ("1", "c"),
    ("2", "0"),
    ("5", "4"),
    ("f", "8"),
    ("1", "e"),
    ("7", "e"),
    ("2", "4"),
    ("2", "b"),
    ("6", "c"),
    ("7", "c"),
    ("9", "3"),
    ("f", "4"),
    ("1", "0"),
    ("5", "0"),
    ("5", "b"),
    ("f", "3"),
    ("7", "a"),
    ("9", "a"),
    ("f", "0"),
    ("1", "a"),
    ("5", "c"),
    ("2", "8"),
    ("5", "a"),
    ("6", "a"),
    ("6", "3"),
    ("9", "d"),
    ("f", "a"),
    ("e", "d"),
    ("8", "c"),
    ("8", "d"),
    ("4", "c"),
    ("0", "0"),
    ("3", "b"),
    ("3", "c"),
    ("4", "b"),
    ("a", "b"),
    ("d", "c"),
    ("e", "b"),
    ("e", "c"),
    ("3", "0"),
    ("8", "0"),
    ("4", "0"),
    ("7", "7"),
    ("8", "b"),
    ("2", "5"),
    ("1", "6"),
    ("2", "9"),
    ("e", "0"),
    ("a", "d"),
    ("a", "c"),
    ("1", "5"),
    ("3", "d"),
    ("a", "4"),
    ("f", "6"),
    ("7", "6"),
    ("3", "4"),
    ("f", "9"),
    ("8", "e"),
    ("1", "9"),
    ("5", "5"),
    ("8", "a"),
    ("d", "d"),
    ("1", "7"),
    ("3", "e"),
    ("f", "f"),
    ("4", "4"),
    ("d", "b"),
    ("e", "e"),
    ("8", "3"),
    ("1", "f"),
    ("8", "4"),
    ("9", "6"),
    ("2", "2"),
    ("5", "6"),
    ("0", "c"),
    ("5", "9"),
    ("a", "a"),
    ("7", "9"),
    ("8", "8"),
    ("b", "c"),
    ("3", "3"),
    ("1", "2"),
    ("5", "f"),
    ("6", "6"),
    ("a", "3"),
    ("0", "b"),
    ("5", "2"),
    ("5", "7"),
    ("a", "e"),
    ("c", "c"),
    ("7", "f"),
    ("4", "e"),
    ("d", "0"),
    ("4", "a"),
    ("2", "6"),
    ("9", "9"),
    ("b", "b"),
    ("1", "1"),
    ("4", "3"),
    ("c", "d"),
    ("d", "a"),
    ("4", "8"),
    ("c", "0"),
    ("d", "e"),
    ("3", "8"),
    ("7", "1"),
    ("a", "6"),
    ("a", "8"),
    ("c", "b"),
    ("f", "2"),
    ("3", "9"),
    ("a", "2"),
    ("f", "5"),
    ("6", "7"),
    ("c", "e"),
    ("d", "4"),
    ("7", "2"),
    ("d", "6"),
    ("d", "8"),
    ("f", "1"),
    ("6", "2"),
    ("b", "0"),
    ("5", "1"),
    ("f", "7"),
    ("2", "1"),
    ("c", "3"),
    ("8", "6"),
    ("e", "3"),
    ("a", "9"),
    ("c", "4"),
    ("d", "3"),
    ("0", "e"),
    ("8", "2"),
    ("a", "5"),
    ("b", "4"),
    ("b", "e"),
    ("2", "7"),
    ("6", "9"),
    ("6", "f"),
    ("6", "1"),
    ("b", "a"),
    ("b", "d"),
    ("9", "7"),
    ("4", "f"),
    ("6", "5"),
    ("8", "7"),
    ("9", "5"),
    ("0", "3"),
    ("4", "d"),
    ("b", "3"),
    ("b", "8"),
    ("e", "8"),
    ("2", "f"),
    ("c", "a"),
    ("9", "f"),
    ("c", "8"),
    ("e", "a"),
    ("0", "a"),
    ("e", "5"),
    ("4", "6"),
    ("3", "a"),
    ("7", "5"),
    ("b", "9"),
    ("e", "2"),
    ("9", "2"),
    ("e", "4"),
    ("0", "4"),
    ("9", "1"),
    ("b", "f"),
    ("e", "6"),
    ("0", "8"),
    ("3", "5"),
    ("a", "1"),
    ("a", "7"),
    ("e", "1"),
    ("0", "d"),
    ("b", "6"),
    ("3", "f"),
    ("3", "2"),
    ("3", "6"),
    ("3", "7"),
    ("c", "1"),
    ("c", "f"),
    ("0", "7"),
    ("8", "5"),
    ("a", "f"),
    ("c", "7"),
    ("0", "1"),
    ("0", "6"),
    ("8", "1"),
    ("d", "5"),
    ("e", "7"),
    ("4", "2"),
    ("b", "2"),
    ("0", "2"),
    ("8", "9"),
    ("d", "1"),
    ("d", "f"),
    ("e", "f"),
    ("0", "9"),
    ("4", "5"),
    ("8", "f"),
    ("b", "7"),
    ("d", "2"),
    ("c", "2"),
    ("c", "9"),
    ("e", "9"),
    ("3", "1"),
    ("4", "7"),
    ("fb", "b"),
    ("4", "9"),
    ("5d", "d"),
    ("7b", "e"),
    ("d", "7"),
    ("fb", "8"),
    ("c", "6"),
    ("f", "14"),
    ("0", "5"),
    ("1d", "8"),
    ("4", "1"),
    ("b", "1"),
    ("8", "13"),
    ("b", "5"),
    ("b", "8c"),
    ("d", "9"),
    ("0", "1d"),
    ("0", "f"),
    ("1", "1c"),
    ("14", "b"),
    ("20", "d"),
    ("3", "68"),
    ("5", "58"),
    ("5", "5d"),
    ("5", "60"),
    ("7", "9a"),
    ("7", "fc"),
    ("7b", "d"),
    ("7d", "0"),
    ("9b", "4"),
    ("fd", "f"),
    ("fe", "1"),
    ("1", "23"),
    ("1", "2a"),
    ("1", "5d"),
    ("18", "0"),
    ("24", "0"),
    ("2b", "c"),
    ("2e", "b"),
    ("50", "a"),
    ("5c", "3"),
    ("5e", "d"),
    ("6e", "0"),
    ("7", "53"),
    ("7", "54"),
    ("7", "f4"),
    ("70", "3"),
    ("7b", "a"),
    ("7d", "c"),
    ("9", "6e"),
    ("9", "7e"),
    ("94", "a"),
    ("9b", "3"),
    ("eb", "2"),
    ("f", "78"),
    ("fc", "d"),
    ("1", "2c"),
    ("1", "90"),
    ("1", "94"),
    ("14", "0"),
    ("1a", "b"),
    ("1b", "b"),
    ("1d", "b"),
    ("1d", "c"),
    ("2", "2e"),
    ("2", "68"),
    ("2", "7b"),
    ("2", "fa"),
    ("20", "c"),
    ("23", "4"),
    ("23", "8"),
    ("24", "a"),
    ("2d", "d"),
    ("2e", "d"),
    ("4", "00"),
    ("5", "13"),
    ("5a", "c"),
    ("6b", "c"),
    ("6c", "4"),
    ("6d", "d"),
    ("7", "58"),
    ("7", "a0"),
    ("70", "d"),
    ("73", "e"),
    ("7a", "c"),
    ("8", "2e"),
    ("8", "3c"),
    ("9", "1e"),
    ("9", "7c"),
    ("90", "e"),
    ("93", "8"),
    ("94", "4"),
    ("9c", "0"),
    ("9e", "b"),
    ("a", "28"),
    ("a0", "3"),
    ("e", "4b"),
    ("f", "fe"),
    ("f3", "0"),
    ("f4", "c"),
    ("f8", "0"),
    ("fd", "0"),
    ("fd", "c"),
    ("1", "20"),
    ("1", "73"),
    ("1", "f3"),
    ("1", "fa"),
    ("13", "0"),
    ("1a", "e"),
    ("1b", "3"),
    ("1b", "c"),
    ("1c", "c"),
    ("1d", "0"),
    ("2", "50"),
    ("2", "53"),
    ("2", "5c"),
    ("2", "5d"),
    ("2", "70"),
    ("2", "74"),
    ("2", "9a"),
    ("2d", "0"),
    ("3", "73"),
    ("3", "fc"),
    ("4", "3e"),
    ("5", "14"),
    ("5", "1e"),
    ("5", "2a"),
    ("5", "2e"),
    ("5", "5c"),
    ("5", "5e"),
    ("5", "63"),
    ("5", "6b"),
    ("5", "70"),
    ("5", "78"),
    ("5", "7b"),
    ("5", "fa"),
    ("5b", "b"),
    ("5d", "e"),
    ("6", "2a"),
    ("6b", "b"),
    ("7", "7d"),
    ("78", "3"),
    ("7a", "b"),
    ("8", "98"),
    ("9", "10"),
    ("9", "6a"),
    ("9", "7b"),
    ("9", "a0"),
    ("93", "e"),
    ("9e", "c"),
    ("a", "6c"),
    ("ab", "e"),
    ("e", "8d"),
    ("f", "1a"),
    ("f", "28"),
    ("f0", "1"),
    ("f4", "0"),
    ("fc", "4"),
    ("fd", "b"),
    ("fe", "0"),
    ("fe", "4"),
    ("1", "2e"),
    ("1", "58"),
    ("1", "5e"),
    ("1", "68"),
    ("1", "93"),
    ("1", "a0"),
    ("18", "4"),
    ("18", "f"),
    ("1c", "b"),
    ("1c", "e"),
    ("1d", "1"),
    ("1d", "d"),
    ("2", "7c"),
    ("23", "e"),
    ("24", "b"),
    ("28", "0"),
    ("2c", "8"),
    ("2c", "c"),
    ("4", "60"),
    ("4", "fb"),
    ("4b", "0"),
    ("4c", "8"),
    ("5", "1b"),
    ("5", "1c"),
    ("5", "20"),
    ("5", "2c"),
    ("5", "f8"),
    ("53", "3"),
    ("54", "b"),
    ("58", "0"),
    ("58", "c"),
    ("5e", "e"),
    ("6", "10"),
    ("6", "20"),
    ("6", "6e"),
    ("6", "fd"),
    ("6", "fe"),
    ("63", "c"),
    ("6a", "c"),
    ("6c", "d"),
    ("6d", "8"),
    ("6d", "c"),
    ("7", "1b"),
    ("7", "5d"),
    ("7", "5e"),
    ("7", "78"),
    ("70", "c"),
    ("74", "8"),
    ("78", "0"),
    ("7d", "3"),
    ("7e", "b"),
    ("8", "30"),
    ("8", "6a"),
    ("8", "ec"),
    ("8c", "b"),
    ("9", "2a"),
    ("9", "5a"),
    ("9", "64"),
    ("9", "90"),
    ("9", "93"),
    ("9", "f8"),
    ("9", "fe"),
    ("90", "0"),
    ("90", "3"),
    ("98", "0"),
    ("98", "d"),
    ("98", "e"),
    ("9b", "d"),
    ("9c", "e"),
    ("a", "ec"),
    ("a0", "c"),
    ("a0", "e"),
    ("c", "93"),
    ("ee", "3"),
    ("f", "10"),
    ("f", "1b"),
    ("f", "23"),
    ("f", "64"),
    ("f3", "4"),
    ("fb", "e"),
    ("fc", "3"),
    ("fe", "d"),
    ("0", "fd"),
    ("1", "1b"),
    ("1", "60"),
    ("1", "6b"),
    ("13", "b"),
    ("13", "d"),
    ("15", "1"),
    ("1e", "3"),
    ("1e", "4"),
    ("1e", "a"),
    ("2", "6b"),
    ("2", "6e"),
    ("2", "9c"),
    ("2", "a0"),
    ("20", "0"),
    ("24", "c"),
    ("28", "8"),
    ("2b", "b"),
    ("2d", "b"),
    ("2d", "e"),
    ("2e", "0"),
    ("3", "78"),
    ("3b", "4")
  )

  /** Classic BPE training over a (token, frequency) table: start from
    * characters, repeatedly merge the globally most frequent adjacent
    * symbol pair. Deterministic tie-break: highest count, then
    * lexicographically smallest (a, b).
    *
    * INCREMENTAL implementation (round 8): pair counts live in an
    * ordered set keyed (count DESC, a ASC, b ASC) and each merge only
    * re-tallies the words that actually contain the chosen pair (a
    * pair→word-ids index, verified lazily against staleness), so cost is
    * Σ(touched words × word length) + O(log P) ordered-set updates —
    * where the previous full-rescan form paid corpus × vocabulary per
    * merge (4096 merges over the synthetic hex stream: ~4.3 s → ~0.2 s).
    * Selection is EXACTLY the old `minBy (-count, a, b)`: counts are
    * maintained exactly (per-word before/after re-tally, the overlap
    * conventions of the original scan preserved), so every frozen table
    * (127/512/4096, all spec-pinned by retraining) is bit-identical. */
  def trainMerges(
      tokenCounts: Seq[(String, Long)],
      nMerges: Int
  ): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = tokenCounts.iterator
      .map { case (t, _) => t.replace(Sep, "").map(_.toString).toArray }
      .toArray
    val wcount: Array[Long] = tokenCounts.iterator.map(_._2).toArray
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // (count DESC, a ASC, b ASC): head == the old minBy((-c, a, b)).
    val byBest = mutable.TreeSet.empty[(Long, String, String)](
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(y._1, x._1)
          if (c != 0) c
          else {
            val a = x._2.compareTo(y._2)
            if (a != 0) a else x._3.compareTo(y._3)
          }
        }
      })
    def adjust(p: (String, String), delta: Long, wi: Int, index: Boolean): Unit = {
      val c0 = pairCounts.getOrElse(p, 0L)
      if (c0 != 0L) byBest.remove((c0, p._1, p._2))
      val c1 = c0 + delta
      if (c1 != 0L) {
        pairCounts(p) = c1
        byBest.add((c1, p._1, p._2))
      } else pairCounts.remove(p)
      if (index) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
    }
    def tally(wi: Int, sign: Long, index: Boolean): Unit = {
      val syms = words(wi)
      var j = 0
      while (j < syms.length - 1) {
        adjust((syms(j), syms(j + 1)), sign * wcount(wi), wi, index)
        j += 1
      }
    }
    words.indices.foreach(tally(_, 1L, index = true))
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    while (i < nMerges && byBest.nonEmpty) {
      val (_, a, b) = byBest.head
      merges += ((a, b))
      // Stale-tolerant index: a word listed under (a, b) may have lost
      // the adjacency to an earlier merge — verify before rewriting.
      val touched = pairWords.remove((a, b)).getOrElse(mutable.Set.empty)
      touched.foreach { wi =>
        val syms = words(wi)
        var has = false
        var j = 0
        while (!has && j < syms.length - 1) {
          if (syms(j) == a && syms(j + 1) == b) has = true
          j += 1
        }
        if (has) {
          // Exact per-word re-tally: remove the word's old pair counts,
          // apply the same left-to-right non-overlapping rewrite as the
          // original implementation, add the new ones back.
          tally(wi, -1L, index = false)
          val out = Array.newBuilder[String]
          var k = 0
          while (k < syms.length) {
            if (k + 1 < syms.length && syms(k) == a && syms(k + 1) == b) {
              out += a + b; k += 2
            } else { out += syms(k); k += 1 }
          }
          words(wi) = out.result()
          tally(wi, 1L, index = true)
        }
      }
      // All adjacencies of (a, b) were consumed by the rewrite; any
      // residual count would mean the delta bookkeeping drifted.
      require(!pairCounts.contains((a, b)),
        s"BPE trainer drift: ($a, $b) kept count ${pairCounts.get((a, b))}")
      i += 1
    }
    merges.result()
  }

  /** Distributed token-frequency count (one map-side-combinable groupBy,
    * top `maxTypes` by count then token — a bounded TakeOrdered, no
    * global sort) feeding the driver-side trainer, over an arbitrary
    * single-column token frame. */
  def trainMergesFromTokens(
      tokens: DataFrame,
      nMerges: Int,
      maxTypes: Int = 10000
  ): Seq[(String, String)] = {
    val tokCol = tokens.columns.head
    val counts = tokens
      .groupBy(col(tokCol).as("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(maxTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainMerges(counts, nMerges)
  }

  /** [[trainMergesFromTokens]] over the corpus word tokens
    * ([[graft.queries.TextQueries.BpePattern]]). */
  def trainMergesFromCorpus(
      docs: DataFrame,
      nMerges: Int,
      maxTypes: Int = 10000
  ): Seq[(String, String)] =
    trainMergesFromTokens(
      docs.select(explode(
        regexp_extract_all(
          col("text"),
          lit(graft.queries.TextQueries.BpePattern), lit(0))).as("tok")),
      nMerges, maxTypes)

  /** High-entropy derived token stream: `HexChunksPerDoc` md5-hex strings
    * per document (`md5(text ++ ":" ++ i)`). The fixture corpus has only
    * 61 distinct word types — word-level BPE training saturates at 128
    * merges — so demonstrating a production-sized merge table needs a
    * stream with enough pair diversity to sustain it. Both engines can
    * recompute the stream exactly (md5 over text), which keeps the
    * large-table query oracle-checkable. */
  val HexChunksPerDoc = 4

  def hexTokenStream(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      explode(array((0 until HexChunksPerDoc).map(i =>
        md5(concat(col("text"), lit(s":$i")))): _*)).as("tok"))

  /** Size of the realistic-vocabulary merge table: 4096 merges, the
    * smallest power of two in the range of real sub-word vocabularies
    * (production tokenizers run 32k–100k; the encoder's claimed
    * O(token) scaling is already fully exercised at 4k — cost per
    * distinct type depends on token length, not table size). */
  val Merges4kCount = 4096

  /** ≥4k-merge table trained at first use on a SYNTHETIC high-entropy
    * stream: 500 md5-hex strings of `"bpe4k:i"` — a pure function of
    * constants, so every JVM (and every engine recomputing the oracle
    * SQL generated from it) sees the identical table. The fixture word
    * corpus saturates at 128 merges and its md5-chunk stream was frozen
    * at 512 ([[Merges512Hex]]); sustaining 4096 data-driven merges needs
    * this wider stream (500 × 32 hex chars ≈ 16k initial symbol
    * occurrences — merge capacity ~15.5k). Training is the same exact
    * [[trainMerges]] the 127/512 tables came from (incremental form:
    * ~0.7 s of driver time paid once per JVM); a 4096-tuple source
    * literal would
    * flirt with the JVM method-size limit, which is why this one is
    * computed, not frozen. Bpe4kSpec pins size, training-consistency and
    * encoder equality. */
  lazy val Merges4kHex: Seq[(String, String)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = (0 until 500).map { i =>
      val h = md.digest(s"bpe4k:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (h, 1L)
    }
    val m = trainMerges(counts, Merges4kCount)
    require(m.size == Merges4kCount,
      s"synthetic stream exhausted at ${m.size} merges")
    m
  }

  /** Encode `tok`: strip the reserved separator, wrap every character in
    * its own separator pair, fold the merges in learned order. The result
    * is the wrapped form: each subword sits between its own `⟂…⟂`. */
  def encodeExpr(tok: Column, merges: Seq[(String, String)]): Column = {
    val wrapped = regexp_replace(
      replace(tok, lit(Sep), lit("")), "(.)", Sep + "$1" + Sep)
    merges.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))
    }
  }

  /** Subword count of an encoded (wrapped) token: every symbol carries
    * exactly two separators. */
  def subwordCount(enc: Column): Column =
    ((length(enc) - length(replace(enc, lit(Sep), lit("")))) / 2)
      .cast("long")

  /** Above this merge count [[encodeExpr]]'s chained-replace fold stops
    * being codegen-friendly (hundreds of nested string ops blow past the
    * JVM method-size limit and fall back to interpreted evaluation) and
    * [[subwordCountsForTypes]] switches to the per-partition
    * [[encodeLocal]] encoder. 64 keeps the expression path comfortably
    * inside whole-stage codegen. */
  val ExprMergeLimit = 64

  /** A merge table is training-consistent when every merge's input
    * symbols are single characters or outputs of EARLIER merges — true of
    * any table [[trainMerges]] produces. Under this invariant the
    * min-rank iteration of [[encodeLocal]] is provably equal to the
    * sequential per-merge passes of [[encodeExpr]]: applying merge r can
    * only create adjacencies involving its output symbol, and every merge
    * consuming that symbol has rank > r, so no lower-rank opportunity
    * ever appears after rank r fires. */
  def isTrainingConsistent(merges: Seq[(String, String)]): Boolean = {
    val known = scala.collection.mutable.Set.empty[String]
    merges.forall { case (a, b) =>
      val ok = (a.length == 1 || known(a)) && (b.length == 1 || known(b))
      known += a + b
      ok
    }
  }

  /** Priority-merge (lowest-rank-first) encoder — the scalable twin of
    * [[encodeExpr]] for production-sized merge tables: O(len) rank scans
    * per applied merge instead of one full string pass per TABLE ENTRY,
    * so a 50k-merge vocabulary costs what the token needs, not what the
    * table holds. Requires a training-consistent table (see
    * [[isTrainingConsistent]]); equality with the sequential semantics is
    * property-pinned in BpeSpec. Returns the symbol sequence. */
  def encodeLocal(
      tok: String,
      merges: IndexedSeq[(String, String)],
      ranks: Map[(String, String), Int]
  ): Vector[String] = {
    var syms: Array[String] = tok.replace(Sep, "").map(_.toString).toArray
    var done = syms.length <= 1
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = Array.newBuilder[String]
        var k = 0
        while (k < syms.length) {
          if (k + 1 < syms.length && syms(k) == a && syms(k + 1) == b) {
            out += a + b; k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out.result()
        done = syms.length <= 1
      }
    }
    syms.toVector
  }

  /** Per-distinct-type subword counts, choosing the path by table size:
    * the codegen'd expression fold below [[ExprMergeLimit]], the
    * broadcast-ranks [[encodeLocal]] `mapPartitions` above it. Both
    * produce identical counts (BpeSpec pins the equality); the output
    * frame is `(tokCol, n_sub)` either way, so callers' join-back shape
    * never changes. */
  def subwordCountsForTypes(
      types: DataFrame,
      tokCol: String,
      merges: Seq[(String, String)]
  ): DataFrame = {
    if (merges.size <= ExprMergeLimit)
      types.select(
        col(tokCol),
        subwordCount(encodeExpr(col(tokCol), merges)).as("n_sub"))
    else {
      require(isTrainingConsistent(merges),
        "encodeLocal requires a training-consistent merge table " +
          "(every merge input must be a char or an earlier merge's output)")
      val spark = types.sparkSession
      import spark.implicits._
      val idx = merges.toIndexedSeq
      val ranks = idx.zipWithIndex.toMap
      // A duplicate pair would silently keep only its LAST rank here while
      // encodeExpr applies it at both positions — the equality claimed by
      // BpeSpec would break without a wrong-looking line of code. Refuse
      // loudly instead (trainMerges never re-emits a pair, but the table
      // is caller-supplied data).
      require(ranks.size == idx.size,
        s"merge table contains ${idx.size - ranks.size} duplicate pair(s); " +
          "encodeLocal's rank map would drop all but the last occurrence")
      val bc = spark.sparkContext.broadcast((idx, ranks))
      types.select(col(tokCol)).as[String]
        .mapPartitions { it =>
          val (m, r) = bc.value
          // Null tokens mirror the expression path exactly: null in,
          // null n_sub out (tok.replace would NPE here otherwise, so the
          // two paths would crash-or-not on merge-table SIZE).
          it.map { tok =>
            if (tok == null) (tok, null.asInstanceOf[java.lang.Long])
            else (tok, java.lang.Long.valueOf(encodeLocal(tok, m, r).length.toLong))
          }
        }
        .toDF(tokCol, "n_sub")
    }
  }

  /** Base id for MERGED symbols — one above the Unicode code-point space
    * (0x10FFFF), so a character's id (its code point) and a merge id can
    * never collide. Production subword vocabularies are exactly this
    * shape: a fixed base alphabet plus one id per learned merge. */
  val MergeIdBase: Long = 0x110000L

  /** (id, symbol) decode rows for the merged symbols of a table: merge i
    * emits `a+b` under id `MergeIdBase + i`. Two different merges can
    * emit the SAME string (("ab","c") and ("a","bc") both yield "abc");
    * the FIRST index is the canonical id, so symbol→id stays a function
    * and later duplicates never enter the decode table. */
  def mergeIdRows(merges: Seq[(String, String)]): Seq[(Long, String)] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    merges.zipWithIndex.flatMap { case ((a, b), i) =>
      if (seen.add(a + b)) Some((MergeIdBase + i, a + b)) else None
    }
  }

  /** Encode each distinct type to its BPE id SEQUENCE — the ids a packed
    * shard actually stores: [[encodeLocal]] produces the symbol sequence,
    * single-unit symbols carry their code point, merged symbols their
    * canonical merge id. Same distinct-type discipline as
    * [[subwordCountsForTypes]] (encode once per type, join back); the
    * merge tables ride as broadcasts. Returns (tokCol, ids). */
  def encodeIdsForTypes(
      types: DataFrame,
      tokCol: String,
      merges: Seq[(String, String)]
  ): DataFrame = {
    require(isTrainingConsistent(merges),
      "encodeIdsForTypes requires a training-consistent merge table")
    val idx = merges.toIndexedSeq
    val ranks = idx.zipWithIndex.toMap
    require(ranks.size == idx.size,
      "merge table contains duplicate pairs; see subwordCountsForTypes")
    val symToId: Map[String, Long] =
      mergeIdRows(merges).map { case (id, s) => (s, id) }.toMap
    val spark = types.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((idx, ranks, symToId))
    types.select(col(tokCol)).as[String]
      .mapPartitions { it =>
        val (m, r, sid) = bc.value
        it.map { tok =>
          val ids = encodeLocal(tok, m, r).map { s =>
            if (s.length == 1) s.charAt(0).toLong
            else sid.getOrElse(s, throw new IllegalStateException(
              s"encoded symbol '$s' is neither a single unit nor a merge output"))
          }
          (tok, ids)
        }
      }
      .toDF(tokCol, "ids")
  }

  /** Decode id sequences back to text using ONLY the ≤|merges|-row id
    * table — the inverse of [[encodeIdsForTypes]], and the first thing a
    * user does when inspecting a packed shard. Map-side per row, decode
    * table broadcast; appends `dec` to the input frame. */
  def decodeIdsForTypes(
      encoded: DataFrame,
      tokCol: String,
      merges: Seq[(String, String)]
  ): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(mergeIdRows(merges).toMap)
    encoded.select(col(tokCol), col("ids")).as[(String, Seq[Long])]
      .mapPartitions { it =>
        val tab = bc.value
        it.map { case (tok, ids) => (tok, ids, decodeIds(ids, tab)) }
      }
      .toDF(tokCol, "ids", "dec")
  }

  /** One id sequence → its string: merged ids look up the decode table,
    * everything else appends as a code point. The fallback range is
    * validated explicitly: an id outside [0, MergeIdBase) that the table
    * doesn't know is corrupt input, and without the check it would
    * either throw an unexplained IllegalArgumentException (id in
    * [MergeIdBase, Int.MaxValue]) or — worse — be TRUNCATED by toInt
    * and silently decode to a wrong character (0x100000041 → 'A'). */
  def decodeIds(ids: Seq[Long], idToStr: Map[Long, String]): String = {
    val sb = new java.lang.StringBuilder
    ids.foreach { id =>
      idToStr.get(id) match {
        case Some(s) => sb.append(s)
        case None =>
          if (id < 0L || id >= MergeIdBase)
            throw new IllegalStateException(
              s"decodeIds: id $id is neither a known merge id nor a " +
                s"code point in [0, $MergeIdBase) — corrupt sequence or " +
                "wrong merge table")
          sb.appendCodePoint(id.toInt)
      }
    }
    sb.toString
  }

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
  private def sepWrap(sym: String): String =
    s"chr(31)||${sqlLit(sym)}||chr(31)"

  /** The DuckDB twin of [[encodeExpr]] over SQL expression `tokExpr` —
    * same strip, same wrap, same merge fold, generated from the same
    * merges table. */
  def oracleEncodeSql(
      tokExpr: String, merges: Seq[(String, String)]): String = {
    val wrapped =
      s"regexp_replace(replace($tokExpr, chr(31), ''), '(.)', chr(31)||'\\1'||chr(31), 'g')"
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"replace($acc, ${sepWrap(a)}||${sepWrap(b)}, ${sepWrap(a + b)})"
    }
  }

  /** DuckDB subword count over encoded expression `encExpr`. */
  def oracleSubwordCountSql(encExpr: String): String =
    s"(length($encExpr) - length(replace($encExpr, chr(31), ''))) // 2"

  /** The DuckDB twin of the LARGE-table fold, chunked into a CTE chain so
    * expression nesting stays bounded (a single 512-deep replace() nest
    * risks the parser/planner recursion limit; `chunk` merges per CTE
    * keeps each level shallow while the chain carries the fold). Returns
    * (cteDefinitions, finalCteName); the final CTE has columns
    * (tok, enc). `fromCte` must expose a `tok` column. */
  def oracleEncodeCtesSql(
      fromCte: String,
      merges: Seq[(String, String)],
      chunk: Int = 16
  ): (String, String) = {
    val wrapped =
      "regexp_replace(replace(tok, chr(31), ''), '(.)', chr(31)||'\\1'||chr(31), 'g')"
    val groups = merges.grouped(chunk).toSeq
    val sb = new StringBuilder
    var prev = fromCte
    groups.zipWithIndex.foreach { case (g, i) =>
      val base = if (i == 0) wrapped else "enc"
      val folded = g.foldLeft(base) { case (acc, (a, b)) =>
        s"replace($acc, ${sepWrap(a)}||${sepWrap(b)}, ${sepWrap(a + b)})"
      }
      sb ++= s"e$i AS (SELECT tok, $folded AS enc FROM $prev),\n"
      prev = s"e$i"
    }
    (sb.toString, prev)
  }
}
