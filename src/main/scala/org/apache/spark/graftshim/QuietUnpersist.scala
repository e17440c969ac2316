package org.apache.spark.graftshim

import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD

/** The one deliberate reach into Spark's `private[spark]` surface.
  *
  * `RDD.unpersist` logs an unconditional WARN for every locally-
  * checkpointed RDD ("lineage has been truncated and cannot be
  * recomputed after unpersisting", RDD.scala) — Spark telling the
  * caller "hope you know what you're doing". graft's checkpoint
  * lifecycle DOES know: localCheckpoints are freed only after their
  * last consumer's action (the MLlib-model-style contract documented
  * on [[graft.CacheHygiene.releaseCheckpoints]]), so on the hot path
  * (one WARN per CC label round per job) the message is pure log
  * noise that buries real warnings.
  *
  * `SparkContext.unpersistRDD` is the SAME operation one layer down —
  * it is exactly what `RDD.unpersist` delegates to (remove from
  * `persistentRdds`, `blockManagerMaster.removeRdd`, post the
  * `SparkListenerUnpersistRDD` event) minus the log line and the
  * storage-level field reset on the RDD object, which is irrelevant
  * here because a truncated-lineage RDD must never be recomputed
  * anyway. It is `private[spark]`, hence this shim package.
  */
object QuietUnpersist {
  def apply(sc: SparkContext, rdd: RDD[_], blocking: Boolean): Unit =
    sc.unpersistRDD(rdd.id, blocking)
}
