package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Cache-lifecycle helpers for pipelines that persist intermediates.
  *
  * Two disciplines, chosen by whether the backing blocks are
  * recomputable:
  *
  *  - `releaseAfterAction`: for plain `persist()`ed intermediates whose
  *    lineage stays intact. The blocks free themselves when the FIRST
  *    action touching the result completes; a later action on the same
  *    frame silently recomputes (slower, never wrong). Used by
  *    `Matching.matchTables` for its perfect-pair table.
  *  - `releaseCheckpoints`: for `localCheckpoint`ed state whose lineage
  *    is TRUNCATED (recompute after free would fail, so it must never
  *    be freed behind the caller's back). Explicit, MLlib-model-style:
  *    call it once the result has been consumed (collected/written).
  *    `WebDedup` calls it internally right after committing the
  *    connected-components stage to the warehouse — the 100 TB staged
  *    path is fully self-cleaning; in-session callers of
  *    `Dedup.nearDupClusters` et al. call `Dedup.release(result)`.
  */
object CacheHygiene {

  private val counter = new AtomicLong()

  /** Wrap `df` so that `release` runs exactly once, when the first
    * action whose plan contains `df` completes (success OR failure).
    * `release` must only free RECOMPUTABLE state (plain persists).
    */
  def releaseAfterAction(df: DataFrame, release: () => Unit): DataFrame = {
    val tag = s"graft_release_${counter.incrementAndGet()}"
    val spark = df.sparkSession
    val marked = df.as(tag)
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private def hasTag(plan: LogicalPlan): Boolean =
        plan.collectFirst { case s: SubqueryAlias if s.alias == tag => s }.isDefined
      private def fire(qe: QueryExecution): Unit =
        if (hasTag(qe.analyzed) && done.compareAndSet(false, true)) {
          release()
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        fire(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        fire(qe)
    }
    spark.listenerManager.register(listener)
    marked
  }

  /** Run `f` with a Spark job description, so every job it submits
    * (including AQE stage-materialization jobs, which inherit the
    * submitting thread's properties) is attributed to a named engine
    * stage in the UI / listeners instead of an anonymous call site.
    * Restores the previous description on exit.
    */
  def described[A](spark: org.apache.spark.sql.SparkSession, desc: String)(f: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try f finally sc.setJobDescription(prev)
  }

  /** Stop a session with the cache drained: blocking-unpersist every
    * still-registered RDD first (quietly — some are truncated-lineage
    * localCheckpoints), so the stop never overlaps an async block
    * removal. A non-blocking removal still in flight when the
    * BlockManager shuts down stack-traces harmlessly but loudly
    * (`BlockManager.removeRdd` [error] frames in an otherwise clean
    * run — r4's bench tail). Benchmark/CLI mains call this instead of
    * a bare `spark.stop()`.
    */
  def stopDrained(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(rdd =>
      org.apache.spark.graftshim.QuietUnpersist(spark.sparkContext, rdd, blocking = true))
    spark.stop()
  }

  /** Unpersist every checkpointed/persisted RDD backing `df`'s plan
    * (the LogicalRDD leaves a localCheckpoint leaves behind). After
    * this the frame must not be acted on again — its lineage was
    * truncated at the checkpoint.
    *
    * Freed through [[org.apache.spark.graftshim.QuietUnpersist]]
    * (`RDD.unpersist` minus its unconditional truncated-lineage WARN —
    * this lifecycle frees checkpoints only after their last consumer,
    * which is exactly the case the warning exists to flag).
    *
    * @param blocking wait for the block removals to complete. Pass
    *                 true when the session is about to stop: a
    *                 non-blocking removal still in flight races the
    *                 BlockManager's shutdown and stack-traces
    *                 harmlessly but loudly (`removeRdd` [error] frames
    *                 in an otherwise clean run).
    */
  def releaseCheckpoints(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        org.apache.spark.graftshim.QuietUnpersist(lr.rdd.sparkContext, lr.rdd, blocking)
      case _ => ()
    }
}
