package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query cost-shape profiler (dev tool; not part of the driver
  * contract). Runs each named declared query exactly the way Bench does
  * (noop sink, same session shape) with a listener that aggregates
  * scheduler-side counters, so a slow query can be attributed to its
  * actual cost axis before touching it:
  *
  *   - njobs / nstages / ntasks — scheduling fan-out (fixed overhead at
  *     small SF, stage-boundary count at scale);
  *   - task_s — summed executor task time (the "real work");
  *   - shuf_mb — shuffle read+write bytes (the scale-killer axis);
  *   - wall_s — what Bench would record.
  *
  * Usage: ProfileQueries q_a[,q_b,...] [sfDir]   (env SPARK_GRAFT_CPUS
  * honored so low-core scaling can be profiled the driver's way too).
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQueries q_name[,q_name...] [sfDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    // SPARK_GRAFT_PROFILE_STAGES=1 additionally prints a per-stage table
    // (name, tasks, task seconds, shuffle read/write MB) for each query —
    // the attribution view that names the offending exchange.
    val perStage = sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    val shufBytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (perStage) {
          val si = s.stageInfo
          val m = si.taskMetrics
          val rd = if (m == null) 0L else m.shuffleReadMetrics.totalBytesRead
          val wr = if (m == null) 0L else m.shuffleWriteMetrics.bytesWritten
          val rt = if (m == null) 0L else m.executorRunTime
          if (rd + wr > 4L * 1024 * 1024 || rt > 2000L)
            println(f"    stage ${si.stageId}%5d ${si.numTasks}%4dt ${rt / 1e3}%7.1fs rd=${rd / 1048576.0}%8.2fMB wr=${wr / 1048576.0}%8.2fMB  ${si.name.takeWhile(_ != '\n').take(90)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskNanos.addAndGet(m.executorRunTime * 1000000L)
          shufBytes.addAndGet(
            m.shuffleReadMetrics.totalBytesRead +
              m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    println(f"${"query"}%-32s ${"wall_s"}%8s ${"task_s"}%8s ${"njobs"}%6s ${"nstg"}%5s ${"ntask"}%6s ${"shuf_mb"}%8s")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query $name"))
      jobs.set(0); stages.set(0); tasks.set(0)
      taskNanos.set(0L); shufBytes.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // Listener bus is async; give it a beat to drain before reading.
      Thread.sleep(400L)
      println(f"$name%-32s $wall%8.2f ${taskNanos.get / 1e9}%8.2f ${jobs.get}%6d ${stages.get}%5d ${tasks.get}%6d ${shufBytes.get / 1048576.0}%8.2f")
      spark.catalog.clearCache()
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case scala.util.control.NonFatal(_) => () }
      System.gc()
    }
    spark.stop()
  }
}
