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

  /** Unpersist every checkpointed/persisted RDD backing `df`'s plan
    * (the LogicalRDD leaves a localCheckpoint leaves behind). After
    * this the frame must not be acted on again — its lineage was
    * truncated at the checkpoint.
    */
  def releaseCheckpoints(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
