package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Adversarial property coverage for
  * [[StreamingOps.gapSessionsBuffered]]: random per-user event sets,
  * random cross-file shuffles (the arrival shape [[StreamingOps
  * .gapSessions]] refuses), random file splits, and random watermark
  * delays — including delays SHORT enough that the engine's late-row
  * filter genuinely drops events. The oracle is exact: the watermark
  * sequence is simulated batch by batch (Spark computes batch k's
  * watermark from batches < k), engine-dropped events are removed, and
  * the survivors fold through the batch gap sessionizer; the stream
  * must emit exactly the certified sessions of that fold, every time.
  *
  * Tie-freedom by construction: event times are whole minutes while the
  * watermark delay carries a 30-second offset, so no event ever sits
  * exactly ON a watermark and the `<` vs `<=` boundary of the late
  * filter can never flake the oracle. A far-future sentinel row in the
  * last file pushes the final watermark past every real session's
  * certainty point, so the expected emission set is closed-form. */
class GapSessionsPropertySpec extends SparkSuite {

  private val trial = new java.util.concurrent.atomic.AtomicInteger(0)

  private case class Scenario(
      timesPerUser: Seq[Seq[Long]], // minutes in [0, 300], user = idx+1
      shuffleSeed: Long,
      delayMin: Long)

  private val genScenario: Gen[Scenario] = for {
    nUsers <- Gen.choose(1, 3)
    timesPerUser <- Gen.listOfN(
      nUsers,
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 300L))))
    shuffleSeed <- Gen.long
    // 10 min: heavy late-dropping under shuffle; 45 min: some; 400 min
    // (> the whole time span): none — the pure buffering regime.
    delayMin <- Gen.oneOf(10L, 45L, 400L)
  } yield Scenario(timesPerUser, shuffleSeed, delayMin)

  private val mm = 60000L
  private val gapMs = 1800000L
  // Times sit a day up from epoch so the initial watermark clamp at 0
  // never interacts with real events (same trick as StreamingSpec).
  private val baseMin = 1440L
  private val SentinelUser = 999999L

  /** Batch gap fold over a user's kept event times; emits sessions
    * closed by a later event always, the tail session only when the
    * final watermark certifies it. */
  private def foldSessions(
      user: Long, times: Seq[Long], wmFinal: Long
  ): Seq[(Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    var idx = 1L; var start = -1L; var last = -1L; var n = 0L
    for (t <- times.sorted) {
      if (start < 0) { start = t; last = t; n = 1 }
      else if (t - last > gapMs) {
        out += ((user, idx, n, start, last))
        idx += 1; start = t; last = t; n = 1
      } else { last = t; n += 1 }
    }
    if (start >= 0 && last + gapMs < wmFinal) out += ((user, idx, n, start, last))
    out.toSeq
  }

  private def runScenario(sc: Scenario): Prop = {
    val events = sc.timesPerUser.zipWithIndex.flatMap { case (ts, u) =>
      ts.map(t => ((u + 1).toLong, t))
    }
    val rnd = new scala.util.Random(sc.shuffleSeed)
    val shuffled = rnd.shuffle(events)
    val files = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
    var rest = shuffled
    while (rest.nonEmpty) {
      val k = 1 + rnd.nextInt(4)
      files += rest.take(k); rest = rest.drop(k)
    }
    // Sentinel: beyond maxT + delay + gap, so the final (no-data-batch)
    // watermark certifies every real session regardless of delay.
    val maxT = events.map(_._2).max
    files += Seq((SentinelUser, maxT + sc.delayMin + 41L))
    val delayMs = sc.delayMin * 60000L + 30000L

    // --- Exact engine simulation: per-batch watermark + late-drop. ---
    // Spark's watermark lags one batch behind the data: the value used
    // to filter batch k was planned from event-time stats committed
    // through batch k−2 (batch k−1's max is only committed after k−1
    // finishes, and k's planning reads the previously-planned value).
    // Verified empirically by this very property — a through-(k−1)
    // model is falsified in the first dozen trials.
    var maxThruPrevPrev = Long.MinValue // max event time through batch k-2
    var maxThruPrev = Long.MinValue     // … through batch k-1
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (f <- files) {
      val wmUsed =
        if (maxThruPrevPrev == Long.MinValue) 0L
        else math.max(0L, maxThruPrevPrev - delayMs)
      var batchMax = Long.MinValue
      for ((u, t) <- f) {
        val ms = (baseMin + t) * mm
        if (ms > wmUsed) kept += ((u, ms))
        if (ms > batchMax) batchMax = ms
      }
      maxThruPrevPrev = maxThruPrev
      maxThruPrev = math.max(maxThruPrev, batchMax)
    }
    // After the last data batch, no-data batches keep running until the
    // watermark converges to maxAll − delay — the certification horizon.
    val wmFinal = maxThruPrev - delayMs
    val expected = kept.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      foldSessions(u, evs.map(_._2).toSeq, wmFinal)
    }.filter(_._1 != SentinelUser).toSet

    // --- Drive the real stream: one file per micro-batch, in order. ---
    val i = trial.incrementAndGet()
    val d = java.nio.file.Files.createTempDirectory(s"sess_prop_$i")
    import spark.implicits._
    files.zipWithIndex.foreach { case (rows, fi) =>
      val stage = java.nio.file.Files.createTempDirectory("sess_prop_stage")
      rows.zipWithIndex
        .map { case ((u, t), ei) => (fi * 1000L + ei, u, (baseMin + t) * mm) }
        .toDF("event_id", "user_id", "ms")
        // ts = raw NANOS-long (ms × 1e6): the repo-wide LongType unit
        // (see Tables.normalizeEventTs), so this directory would read
        // correctly through readEvents too.
        .select(col("event_id"), (col("ms") * 1000000L).as("ts"),
          col("user_id"), lit("view").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = d.resolve(f"events_$fi%03d.parquet")
      java.nio.file.Files.move(part.toPath, dest)
      // Batch order = file order: make mtimes strictly increasing so the
      // source's listing order can never tie.
      dest.toFile.setLastModified(1700000000000L + fi * 2000L)
    }
    val stream = graft.queries.Tables.normalizeEventTs(
      spark.readStream
        .schema(StreamingOps.eventsRawSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d.toString))
    val name = s"sess_prop_q_$i"
    val q = StreamingOps
      .gapSessionsBuffered(spark, stream,
        watermarkDelay = s"${sc.delayMin * 60 + 30} seconds")
      .toDF
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ckpt_$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .filter(_._1 != SentinelUser)
      .toSet
    if (got == expected) Prop.passed
    else Prop.falsified :| s"delay=${sc.delayMin}m files=${files.toSeq} " +
      s"only-stream=${got -- expected} only-oracle=${expected -- got}"
  }

  test("buffered gap sessions equal the simulated-watermark batch fold on random shuffled streams") {
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(12)
        .withInitialSeed(org.scalacheck.rng.Seed(20260813L)),
      Prop.forAll(genScenario)(runScenario))
    assert(res.passed, res.status.toString)
  }
}
