package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** The missing cross product of the round-6 suites: GapSessionsPropertySpec
  * fuzzes random out-of-order inputs on an uninterrupted query with the
  * default state store; the recovery and RocksDB tests each use fixed
  * inputs. Here every trial draws random per-user events, a random
  * cross-file shuffle, a random watermark delay, AND a random mid-stream
  * stop/restart point — and runs on the RocksDB state-store provider both
  * sides of the restart. The pending out-of-order buffer, open session,
  * next-index counter, and the checkpointed watermark sequence must all
  * round-trip RocksDB serialization AND the stop/restart, emitting
  * exactly the sessions of the simulated uninterrupted fold, exactly
  * once (file-sink commit log).
  *
  * The watermark oracle extends the one GapSessionsPropertySpec
  * verified empirically (batch k filters with the watermark planned
  * from batches ≤ k−2) with the RESTART BUMP this spec's first
  * falsifying run exposed: a restarted query seeds its watermark
  * tracker from the commit log's next-batch watermark — event-time
  * stats through the last COMMITTED batch c−1 — so batches c and c+1
  * (the first two of the new run, before the run's own stats flow into
  * the tracker with their usual two-batch lag) filter with
  * max-through-(c−1) instead of the uninterrupted k−2 value. From
  * batch c+2 on, the global k−2 model resumes. A restart can therefore
  * legitimately drop late rows an uninterrupted run would have kept —
  * the oracle models exactly that. Same tie-freedom construction as
  * the base spec: whole-minute events, a 30-second delay offset, and a
  * far-future sentinel that certifies every real session. */
class GapSessionsRestartPropertySpec extends SparkSuite {

  private val trial = new java.util.concurrent.atomic.AtomicInteger(0)

  private case class Scenario(
      timesPerUser: Seq[Seq[Long]],
      shuffleSeed: Long,
      delayMin: Long,
      cutFrac: Double) // restart point as a fraction of the data files

  private val genScenario: Gen[Scenario] = for {
    nUsers <- Gen.choose(1, 3)
    timesPerUser <- Gen.listOfN(
      nUsers,
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 300L))))
    shuffleSeed <- Gen.long
    delayMin <- Gen.oneOf(10L, 45L, 400L)
    cutFrac <- Gen.choose(0.1, 0.9)
  } yield Scenario(timesPerUser, shuffleSeed, delayMin, cutFrac)

  private val mm = 60000L
  private val gapMs = 1800000L
  private val baseMin = 1440L
  private val SentinelUser = 999999L

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
    val maxT = events.map(_._2).max
    files += Seq((SentinelUser, maxT + sc.delayMin + 41L))
    val delayMs = sc.delayMin * 60000L + 30000L
    val cut = math.max(1, math.min(files.size - 1,
      math.round(sc.cutFrac * files.size).toInt))

    // Per-batch simulation with the restart bump: batch k normally
    // filters with stats through k−2; the restarted run's batches c and
    // c+1 filter with the commit-log seed = stats through c−1.
    val batchMaxes = files.map { f =>
      f.map { case (_, t) => (baseMin + t) * mm }.max
    }
    def maxThru(k: Int): Long =
      if (k < 0) Long.MinValue else batchMaxes.take(k + 1).max
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for ((f, k) <- files.zipWithIndex) {
      val statsThru =
        if (k == cut || k == cut + 1) math.max(maxThru(cut - 1), maxThru(k - 2))
        else maxThru(k - 2)
      val wmUsed =
        if (statsThru == Long.MinValue) 0L
        else math.max(0L, statsThru - delayMs)
      for ((u, t) <- f) {
        val ms = (baseMin + t) * mm
        if (ms > wmUsed) kept += ((u, ms))
      }
    }
    val wmFinal = maxThru(files.size - 1) - delayMs
    val expected = kept.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      foldSessions(u, evs.map(_._2).toSeq, wmFinal)
    }.filter(_._1 != SentinelUser).toSet

    // Stage every file once; the src dir receives phase-1 files, then
    // the rest before the restarted run. Restart cut ∈ [1, nFiles−1]:
    // phase 1 is never empty, the sentinel always arrives in phase 2.
    val i = trial.incrementAndGet()
    import spark.implicits._
    val staged = files.zipWithIndex.map { case (rows, fi) =>
      val stage = java.nio.file.Files.createTempDirectory("sessr_stage")
      rows.zipWithIndex
        .map { case ((u, t), ei) => (fi * 1000L + ei, u, (baseMin + t) * mm) }
        .toDF("event_id", "user_id", "ms")
        // ts = raw NANOS-long (ms × 1e6): the repo-wide LongType unit
        // (see Tables.normalizeEventTs).
        .select(col("event_id"), (col("ms") * 1000000L).as("ts"),
          col("user_id"), lit("view").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      new java.io.File(stage.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
    }
    val src = java.nio.file.Files.createTempDirectory(s"sessr_src_$i")
    val out = java.nio.file.Files.createTempDirectory(s"sessr_out_$i").toString
    val ckpt = java.nio.file.Files.createTempDirectory(s"sessr_ckpt_$i").toString
    def copyIn(range: Range): Unit = range.foreach { fi =>
      val dest = src.resolve(f"events_$fi%03d.parquet")
      java.nio.file.Files.copy(staged(fi), dest)
      dest.toFile.setLastModified(1700000000000L + fi * 2000L)
    }
    def runOnce(): Unit = {
      val stream = graft.queries.Tables.normalizeEventTs(
        spark.readStream
          .schema(StreamingOps.eventsRawSchema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src.toString))
      val q = StreamingOps
        .gapSessionsBuffered(spark, stream,
          watermarkDelay = s"${sc.delayMin * 60 + 30} seconds")
        .toDF
        .writeStream.outputMode("append").format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      copyIn(0 until cut)
      runOnce()
      copyIn(cut until files.size)
      runOnce()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .filter(_._1 != SentinelUser)
    val gotMultiset = got.groupBy(identity).view.mapValues(_.length).toMap
    if (got.toSet == expected && gotMultiset.values.forall(_ == 1)) Prop.passed
    else Prop.falsified :| s"delay=${sc.delayMin}m cut=$cut/${files.size} " +
      s"files=${files.toSeq} only-stream=${got.toSet -- expected} " +
      s"only-oracle=${expected -- got.toSet} " +
      s"dups=${gotMultiset.filter(_._2 > 1)}"
  }

  test("RocksDB-backed buffered sessions survive a random mid-stream restart exactly once") {
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(8)
        .withInitialSeed(org.scalacheck.rng.Seed(20260814L)),
      Prop.forAll(genScenario)(runScenario))
    assert(res.passed, res.status.toString)
  }
}
