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
  * Semantics preserved for the journal discipline: [[all]] is an
  * UNINTERRUPTIBLE BARRIER — it returns only after every task has
  * finished (success or failure), catching ALL task throwables and
  * re-asserting the caller's interrupt flag afterwards. That matters
  * for the deterministic-path writers (deploy/compact target
  * `corpus-g<N>` dirs): if the barrier could be broken by an interrupt
  * while siblings were still writing, a retried compaction would race
  * its own stale tasks on the same destination dirs. A failed task's
  * siblings complete too; their output is unmarked garbage, invisible
  * to reads and vacuumable. The pool is cached + daemon — nested use
  * cannot deadlock on pool starvation and idle threads die with the
  * process. */
private[graft] object Par {

  private lazy val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newCachedThreadPool(
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })

  /** Run the tasks concurrently; await ALL (uninterruptibly, success
    * or failure); rethrow the first failure after the barrier. One
    * task runs inline. */
  def all(tasks: (() => Unit)*): Unit = {
    if (tasks.lengthCompare(2) < 0) { tasks.foreach(_()); return }
    val futs = tasks.map { t =>
      pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
        def call(): Option[Throwable] =
          try { t(); None } catch { case e: Throwable => Some(e) }
      })
    }
    var interrupted = false
    val errs = futs.map { f =>
      var r: Option[Throwable] = None
      var done = false
      while (!done)
        try { r = f.get(); done = true }
        catch { case _: InterruptedException => interrupted = true }
      r
    }
    if (interrupted) Thread.currentThread().interrupt()
    errs.flatten.headOption.foreach(e => throw e)
  }
}
