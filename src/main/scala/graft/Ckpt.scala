package graft

import org.apache.spark.sql.DataFrame

/** Explicit, immediate release of eagerly-localCheckpointed frames.
  *
  * `df.localCheckpoint(true)` persists the materialized blocks under an
  * internal RDD that the returned Dataset's `LogicalRDD` plan node
  * references. When the Dataset becomes unreachable those blocks are
  * reclaimed only by GC + the async ContextCleaner — in a long-lived
  * session (the 264-query bench JVM, a multi-delivery streaming fold, a
  * power-iteration loop) that lag accumulates into real executor-memory
  * pressure (round-14 VERDICT: untouched-plan queries regressed 3–5× in
  * the driver bench record, coherent with shared-JVM block pressure).
  * [[release]] unpersists the blocks NOW.
  *
  * SAFETY: a localCheckpoint TRUNCATES lineage — once released, the frame
  * (and anything lazily derived from it) can never be recomputed. Release
  * a frame only after its LAST materialization: after the marker commit
  * that consumed it, after the next loop iteration's checkpoint
  * materialized, after the memo's last declared consumer ran. */
object Ckpt {

  /** Unpersist the checkpoint blocks behind each frame (non-blocking).
    * No-op for frames that are not checkpoint/RDD-backed — safe to call
    * on anything, so callers never need to track which branch
    * checkpointed. Spark logs one WARN per release ("was locally
    * checkpointed, its lineage has been truncated…") from
    * `RDD.unpersist` itself — expected; it is the unrecoverability
    * heads-up for exactly the discipline this object documents. */
  def release(dfs: DataFrame*): Unit = dfs.foreach { df =>
    if (df != null) df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
