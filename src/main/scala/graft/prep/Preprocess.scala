package graft.prep

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{ProcessedSegment, RawSegment, SegmentTimestamp}
import graft.text.TextFunctions

/** Preprocessing stage (SURVEY.md §2.2 F1/F2/F4, §2.3 A1/A2/A3/A4/A5 —
  * /root/reference/preprocessor.py).
  *
  * Two layers:
  *   - pure Scala folds (`combineLocal`, `intervalLocal`) that reproduce the
  *     reference's order-dependent semantics exactly and are unit-testable
  *     without a SparkSession;
  *   - Spark surfaces that run the declarative parts (filter/clean/enrich)
  *     as codegen'd Column expressions and the stateful folds via
  *     sort + mapPartitions.
  *
  * Scale design: a transcript is small (thousands of rows) even when a
  * corpus is 100 TB — the unit of parallelism is the TRANSCRIPT, not the
  * segment. The single-transcript path here sorts into one partition
  * (exact parity with the reference's sequential fold); the corpus-scale
  * path keys by transcript and applies the same local folds per key via
  * repartition + sortWithinPartitions (secondary-sort pattern, no global
  * shuffle beyond the per-key hash) — see [[PerTranscript]].
  */
object Preprocess {

  case class PrepConfig(
      mergeSameSpeaker: Boolean = true,
      maxSegmentDuration: Option[Double] = Some(120.0),
      preserveTimestamps: Boolean = true,
      timeIntervalSeconds: Option[Double] = None,
      limitSegments: Option[Int] = None
  )

  /** S1: load the `{"segments":[...]}` transcript contract
    * (/root/reference/README.md:162-175). posexplode preserves the JSON
    * array position as the explicit ordering key the reference gets for
    * free from Python list order. */
  def loadTranscript(spark: SparkSession, path: String): Dataset[RawIndexed] = {
    import spark.implicits._
    spark.read
      .option("multiLine", true)
      .json(path)
      .select(posexplode(col("segments")).as(Seq("rowIdx", "seg")))
      .select(
        col("rowIdx").cast("long"),
        col("seg.start").cast("double").as("start"),
        col("seg.end").cast("double").as("end"),
        coalesce(col("seg.text"), lit("")).as("text"),
        coalesce(col("seg.speaker"), lit("")).as("speaker")
      )
      .as[RawIndexed]
  }

  /** F1+F2+F4 as one codegen'd projection: drop empty texts, clean, format
    * timestamps (/root/reference/preprocessor.py:36-54). S2 limit is pushed
    * before everything, as the reference does with `--limit-segments`. */
  def enrich(
      spark: SparkSession,
      raw: Dataset[RawIndexed],
      cfg: PrepConfig
  ): Dataset[ProcessedSegment] = {
    import spark.implicits._
    val limited = cfg.limitSegments match {
      case Some(n) => raw.orderBy("rowIdx").limit(n)
      case None    => raw
    }
    limited
      .filter(trim(col("text")) =!= "")
      .select(
        col("start"),
        col("end"),
        TextFunctions.cleanTextCol(col("text")).as("text"),
        col("speaker"),
        TextFunctions.formatHmsCol(col("start")).as("startFormatted"),
        TextFunctions.formatHmsCol(col("end")).as("endFormatted"),
        col("rowIdx"),
        lit(false).as("isCombined"),
        lit(1).as("originalSegments"),
        lit(false).as("isAggregated"),
        lit(null).cast("int").as("intervalIndex"),
        typedLit(Seq.empty[SegmentTimestamp]).as("segmentTimestamps")
      )
      .as[ProcessedSegment]
  }

  // -------------------------------------------------------------------------
  // A1 + A2: consecutive same-speaker merge with duration cap — pure fold,
  // exact parity with /root/reference/preprocessor.py:109-215.
  // -------------------------------------------------------------------------

  def combineLocal(
      segments: Seq[ProcessedSegment],
      maxDuration: Option[Double],
      preserveTimestamps: Boolean
  ): Seq[ProcessedSegment] = {
    if (segments.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[ProcessedSegment]
    var group = scala.collection.mutable.ArrayBuffer(segments.head)
    var dur = segments.head.end - segments.head.start
    var speaker = segments.head.speaker
    for (seg <- segments.tail) {
      val segDur = seg.end - seg.start
      val break = seg.speaker != speaker ||
        maxDuration.exists(m => dur + segDur > m)
      if (break) {
        out += combineGroup(group.toSeq, preserveTimestamps)
        group = scala.collection.mutable.ArrayBuffer(seg)
        dur = segDur
        speaker = seg.speaker
      } else {
        group += seg
        dur += segDur
      }
    }
    out += combineGroup(group.toSeq, preserveTimestamps)
    out.toSeq
  }

  /** /root/reference/preprocessor.py:167-215 — groups of size 1 pass
    * through unchanged; combined text is "[MM:SS] text" parts joined by a
    * single space (or plain join without timestamps). */
  private def combineGroup(
      group: Seq[ProcessedSegment],
      preserveTimestamps: Boolean
  ): ProcessedSegment = {
    if (group.size == 1) return group.head
    val start = group.head.start
    val end = group.last.end
    val text =
      if (preserveTimestamps)
        group
          .map(s => s"[${TextFunctions.formatHms(s.start)}] ${s.text}")
          .mkString(" ")
      else group.map(_.text).mkString(" ")
    ProcessedSegment(
      start = start,
      end = end,
      text = text,
      speaker = group.head.speaker,
      startFormatted = TextFunctions.formatHms(start),
      endFormatted = TextFunctions.formatHms(end),
      rowIdx = group.head.rowIdx,
      isCombined = true,
      originalSegments = group.size,
      segmentTimestamps =
        group.map(s => SegmentTimestamp(s.start, s.end, s.text, None))
    )
  }

  // -------------------------------------------------------------------------
  // A3: fixed time-interval aggregation — pure fold, exact parity with
  // /root/reference/preprocessor.py:217-324. Spanning segments are
  // intentionally duplicated across every interval they overlap.
  // -------------------------------------------------------------------------

  def intervalLocal(
      segments: Seq[ProcessedSegment],
      intervalSeconds: Double
  ): Seq[ProcessedSegment] = {
    if (segments.isEmpty) return Seq.empty
    val t0 = segments.head.start
    val tEnd = segments.last.end
    val nIntervals = math.ceil((tEnd - t0) / intervalSeconds).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[ProcessedSegment]
    var i = 0
    while (i < nIntervals) {
      val iStart = t0 + i * intervalSeconds
      val iEnd = math.min(iStart + intervalSeconds, tEnd)
      def overlaps(s: Double, e: Double): Boolean =
        (iStart <= s && s < iEnd) || (s <= iStart && e > iStart)
      val inInterval = segments.flatMap { seg =>
        if (!overlaps(seg.start, seg.end)) None
        else if (seg.segmentTimestamps.nonEmpty) {
          // Combined segment: keep only component parts in this interval and
          // re-render its text from them.
          val parts = seg.segmentTimestamps.filter(ts => overlaps(ts.start, ts.end))
          if (parts.isEmpty) None
          else {
            val text = parts
              .sortBy(_.start)
              .map(ts => s"[${TextFunctions.formatHms(ts.start)}] ${ts.text}")
              .mkString(" ")
            Some(seg.copy(text = text, segmentTimestamps = parts))
          }
        } else Some(seg)
      }
      if (inInterval.nonEmpty) {
        // Reference joins a python set in iteration order — nondeterministic;
        // the engine sorts (documented deviation, SURVEY §7.5.5).
        val speakers = inInterval.map(_.speaker).distinct.sorted
        val sorted = inInterval.sortBy(_.start)
        val text = sorted
          .map(s =>
            s"[${TextFunctions.formatHms(s.start)} ${s.speaker}] ${s.text}")
          .mkString("\n\n")
        out += ProcessedSegment(
          start = iStart,
          end = iEnd,
          text = text,
          speaker = speakers.mkString(", "),
          startFormatted = TextFunctions.formatHms(iStart),
          endFormatted = TextFunctions.formatHms(iEnd),
          rowIdx = i.toLong,
          isAggregated = true,
          intervalIndex = Some(i),
          originalSegments = inInterval.size,
          segmentTimestamps = sorted.map(s =>
            SegmentTimestamp(s.start, s.end, s.text, Some(s.speaker)))
        )
      }
      i += 1
    }
    out.toSeq
  }

  /** Full preprocessing over a single transcript: declarative stages stay
    * distributed; the order-dependent folds run in one sorted partition
    * (parity mode — a transcript always fits). */
  def run(
      spark: SparkSession,
      raw: Dataset[RawIndexed],
      cfg: PrepConfig = PrepConfig()
  ): Dataset[ProcessedSegment] = {
    import spark.implicits._
    val enriched = enrich(spark, raw, cfg)
    if (!cfg.mergeSameSpeaker && cfg.timeIntervalSeconds.isEmpty) enriched
    else {
      val maxDur = cfg.maxSegmentDuration
      val preserve = cfg.preserveTimestamps
      val interval = cfg.timeIntervalSeconds
      val merge = cfg.mergeSameSpeaker
      enriched
        .repartition(1)
        .sortWithinPartitions("rowIdx")
        .mapPartitions { it =>
          var segs = it.toSeq
          if (merge && segs.nonEmpty)
            segs = combineLocal(segs, maxDur, preserve)
          interval.foreach { s =>
            if (segs.nonEmpty) segs = intervalLocal(segs, s)
          }
          segs.iterator
        }
    }
  }

  /** Cap on [[extractSpeakers]]' driver-side collect. Transcripts have a
    * handful of speakers by nature; a corpus-scale misuse (millions of
    * distinct "speakers") must fail loudly here, not OOM the driver. */
  val MaxSpeakers = 100000

  /** A4: unique sorted speakers (/root/reference/preprocessor.py:326-342).
    * The collect is transcript-scale BY INTENT — guarded by
    * [[MaxSpeakers]] (checked with a `limit(cap+1)` pre-pass, so the
    * failing path never materializes more than cap+1 rows on the
    * driver). For corpus-scale distinct-speaker analytics keep the result
    * distributed: `ds.select("speaker").distinct()`. */
  def extractSpeakers(
      ds: Dataset[ProcessedSegment],
      cap: Int = MaxSpeakers): Seq[String] = {
    import ds.sparkSession.implicits._
    val distinct = ds.select("speaker").distinct()
    val probe = distinct.limit(cap + 1).count()
    require(probe <= cap,
      s"extractSpeakers found > $cap distinct speakers — this is " +
        "a transcript-scale operator; use the distributed " +
        "select(\"speaker\").distinct() frame for corpus-scale analytics")
    distinct.as[String].collect().sorted.toSeq
  }

  /** A5: transcript duration (/root/reference/preprocessor.py:344-361). */
  def transcriptDuration(ds: Dataset[ProcessedSegment]): (Double, String) = {
    val row = ds.agg(min(col("start")), max(col("end"))).head()
    val d =
      if (row.isNullAt(0) || row.isNullAt(1)) 0.0
      else row.getDouble(1) - row.getDouble(0)
    (d, TextFunctions.formatHms(d))
  }
}

/** RawSegment plus the explicit input-order key. */
case class RawIndexed(
    rowIdx: Long,
    start: Double,
    end: Double,
    text: String,
    speaker: String
)
