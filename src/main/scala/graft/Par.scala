package graft

/** Concurrent INDEPENDENT Spark actions — the stores' write fan-out.
  *
  * A fold/deploy/compaction writes up to ten per-table parquet outputs
  * that share no dependency: run sequentially, each is one small job
  * that leaves most of the cluster idle and pays a full scheduler
  * round-trip (driver-side planning, task launch, commit protocol) in
  * series. Submitting them from separate threads lets Spark schedule
  * the jobs concurrently — the standard multi-job pattern
  * (SparkSession and SparkContext are thread-safe for job submission).
  *
  * Semantics preserved for the journal discipline: [[all]] AWAITS
  * every task before returning, so the caller's atomic marker rename
  * still happens strictly after all delta/baseline writes; a failed
  * task's siblings are awaited too (their output is unmarked garbage,
  * invisible to reads and vacuumable), then the first failure is
  * rethrown. The pool is cached + daemon — nested use cannot deadlock
  * on pool starvation and idle threads die with the process. */
private[graft] object Par {

  private lazy val ec: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
            t.setDaemon(true)
            t
          }
        }))

  /** Run the tasks concurrently; await ALL (success or failure); throw
    * the first failure after the barrier. One task runs inline. */
  def all(tasks: (() => Unit)*): Unit = {
    if (tasks.lengthCompare(2) < 0) { tasks.foreach(_()); return }
    val fs = tasks.map { t =>
      scala.concurrent.Future(scala.util.Try(t()))(ec)
    }
    val results = fs.map(f =>
      scala.concurrent.Await.result(
        f, scala.concurrent.duration.Duration.Inf))
    results.collectFirst { case scala.util.Failure(e) => throw e }
  }
}
