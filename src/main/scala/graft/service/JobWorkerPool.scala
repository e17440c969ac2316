package graft.service

import java.nio.file.Files
import java.util.concurrent.CountDownLatch
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Worker pool draining the [[JobQueue]] — the engine-side equivalent
  * of the reference's `job_worker_pool.py:14-203`, re-expressed on
  * Spark's own multi-job scheduler:
  *
  *   - `maxWorkers` (default 2, env MAX_CONCURRENT_JOBS — the
  *     reference's knob, `job_worker_pool.py:188-202`) bounds how many
  *     jobs run CONCURRENTLY. On Spark that is just driver threads:
  *     actions submitted from different threads of one session run as
  *     concurrent scheduler jobs sharing the executors.
  *   - PRIORITY is two-level. Admission order is the queue's
  *     (high before medium before low). While running, each job's
  *     thread pins `spark.scheduler.pool` to its priority name, so
  *     under FAIR scheduling (see [[JobService.fairSession]]) a high
  *     job admitted next to a low one is WEIGHTED onto more cores —
  *     strictly stronger than the reference, whose running low job
  *     holds its process-pool slots until done.
  *   - CANCELLATION is `SparkContext.cancelJobGroupAndFutureJobs`:
  *     every run's work is tagged with a fresh job group
  *     (`interruptOnCancel = true`), and the queue's registered
  *     canceller kills all the group's stages cluster-wide — including
  *     actions the job submits AFTER the cancel (a cancel landing
  *     between two actions would otherwise be lost). The reference
  *     instead hands workers a `threading.Event` the job body must
  *     poll between chunks (`job_queue.py:346-372`) — a running chunk
  *     cannot be stopped.
  *
  * `execute` is injectable for tests; the default materializes the
  * job's embedded config to a temp file and runs it through
  * `graft.Main.runConfig` (the same path `--config` takes).
  */
final class JobWorkerPool(spark: SparkSession, queue: JobQueue,
    maxWorkers: Int = JobWorkerPool.defaultMaxWorkers,
    execute: (SparkSession, JobQueue.QueuedJob) => Unit = JobWorkerPool.runConfigJob) {

  @volatile private var running = false
  private var workers = Vector.empty[Thread]
  // lets tests await quiescence without polling the queue file
  private val idle = new Object

  def start(): Unit = synchronized {
    if (running) return
    running = true
    workers = (0 until maxWorkers).toVector.map { i =>
      val t = new Thread(() => workerLoop(), s"graft-job-worker-$i")
      t.setDaemon(true)
      t.start()
      t
    }
  }

  /** Drain-free stop: workers finish their current job, queued jobs
    * stay queued (they persist and resume on the next start).
    */
  def stop(timeoutMs: Long = 30000L): Unit = synchronized {
    running = false
    queue.close()
    workers.foreach(_.join(timeoutMs))
    workers = Vector.empty
  }

  /** Block until no job is running and the queue is empty (tests). */
  def awaitQuiet(timeoutMs: Long): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    idle.synchronized {
      while ((queue.listActive().nonEmpty || queue.listQueue().nonEmpty) &&
          System.currentTimeMillis() < deadline)
        idle.wait(50L)
      queue.listActive().isEmpty && queue.listQueue().isEmpty
    }
  }

  private def workerLoop(): Unit = {
    while (running) {
      // the outer guard keeps a transient persistence failure (e.g.
      // dequeue's or markDone's saveState hitting a full disk) from
      // killing the worker thread silently — the pool would otherwise
      // keep accepting enqueues that no thread ever drains
      try {
        queue.dequeue(timeoutMs = 250L).foreach(runOne)
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[graft.service] worker error: ${e.getMessage}")
          Thread.sleep(1000L)
      }
    }
  }

  private def runOne(job: JobQueue.QueuedJob): Unit = {
    // group id unique PER RUN (seq), not per name:
    // cancelJobGroupAndFutureJobs permanently poisons a group id, so
    // re-running a previously cancelled job name must use a fresh one
    val group = s"graft-job-${job.name}-${job.seq}"
    val sc = spark.sparkContext
    // thread-local: this worker's actions only
    sc.setLocalProperty("spark.scheduler.pool", job.priority)
    sc.setJobGroup(group, s"graft job '${job.name}' (${job.priority})",
      interruptOnCancel = true)
    // AndFutureJobs: a cancel landing BETWEEN two of the job's actions
    // (planning, file listing) kills the next action too — plain
    // cancelJobGroup only kills currently-active jobs, which would let
    // a multi-action job marked "cancelling" run to completion
    val canceller = () => sc.cancelJobGroupAndFutureJobs(group)
    // true = a cancel already arrived between dequeue and registration
    if (queue.registerCanceller(job.name, canceller)) canceller()
    try {
      execute(spark, job)
      queue.markDone(job.name, success = true)
    } catch {
      case NonFatal(e) =>
        // a cancelled group's action surfaces as SparkException in
        // this thread; the cancelling flag says which it was
        queue.markDone(job.name, success = false,
          output = if (queue.isCancelling(job.name)) "cancelled"
            else String.valueOf(e.getMessage))
    } finally {
      queue.dropCanceller(job.name)
      sc.clearJobGroup()
      sc.setLocalProperty("spark.scheduler.pool", null)
      idle.synchronized { idle.notifyAll() }
    }
  }
}

object JobWorkerPool {

  /** MAX_CONCURRENT_JOBS env, default 2 (job_worker_pool.py:199-200). */
  def defaultMaxWorkers: Int =
    sys.env.get("MAX_CONCURRENT_JOBS").map(_.toInt).getOrElse(2)

  /** Default job body: run the embedded config through the same
    * dispatcher `graft.Main --config` uses (Cli.JobStore.run parity).
    */
  def runConfigJob(spark: SparkSession, job: JobQueue.QueuedJob): Unit = {
    val cfgFile = Files.createTempFile("graft_job", ".json")
    try {
      Files.writeString(cfgFile, job.config.toString)
      graft.Main.runConfig(spark, cfgFile.toString)
    } finally Files.deleteIfExists(cfgFile)
  }
}
