package graft.service

import java.nio.file.{Files, Path}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Thread-safe priority job queue with JSON file persistence — the
  * engine-side equivalent of the reference's `job_queue.py:9-503`.
  *
  * Semantics mirrored from the reference:
  *   - priorities high(0) / medium(1) / low(2), default medium,
  *     FIFO within a priority level (`job_queue.py:9-13,54-61,114-118`);
  *   - states queued -> running -> completed | failed; cancel moves a
  *     queued job straight to cancelled and a running job through
  *     cancelling (`job_queue.py:158-213`);
  *   - a name that is already queued or active cannot be enqueued
  *     again (`job_queue.py:86-99`);
  *   - persistence: queue + history serialize to one JSON file; on
  *     load, queued jobs are restored and jobs that were RUNNING when
  *     the process died come back as failed/interrupted
  *     (`job_queue.py:374-471`).
  *
  * What is deliberately NOT mirrored: the reference pairs each running
  * job with a `threading.Event` that worker code must poll between
  * chunks (`job_queue.py:346-372`). On Spark, cancellation is a
  * first-class scheduler operation — `JobWorkerPool` tags every run's
  * work with a fresh job group and `cancel` here invokes the
  * registered canceller (`SparkContext.cancelJobGroupAndFutureJobs`),
  * which kills all of the group's stages cluster-wide without any
  * cooperation from the job body. The queue itself is Spark-free and
  * unit-testable.
  */
final class JobQueue(val queueFile: Path) {

  import JobQueue._

  private val mapper = new ObjectMapper()
  private val lock = new Object
  // queued, ordered on (priorityValue, seq) at dequeue time
  private val queue = mutable.ArrayBuffer.empty[QueuedJob]
  // name -> running/cancelling entry
  private val active = mutable.LinkedHashMap.empty[String, QueuedJob]
  // name -> terminal entry (completed/failed/cancelled), latest wins
  private val history = mutable.LinkedHashMap.empty[String, QueuedJob]
  // registered by the worker pool when a job starts; invoked by cancel
  private val cancellers = mutable.HashMap.empty[String, () => Unit]
  private var seq = 0L
  private var open = true

  Option(queueFile.getParent).foreach(Files.createDirectories(_))
  loadState()

  /** Enqueue a saved job's config under `name`. Returns the 0-based
    * queue position, or None if the name is already queued or active.
    */
  def enqueue(name: String, config: ObjectNode,
      priority: String = "medium"): Option[Int] = lock.synchronized {
    if (queue.exists(_.name == name) || active.contains(name)) None
    else {
      seq += 1
      queue += QueuedJob(name, normPriority(priority), priorityOf(priority),
        seq, System.currentTimeMillis(), "queued",
        config.deepCopy[ObjectNode](), output = "")
      saveState()
      lock.notifyAll()
      queuePosition(name)
    }
  }

  /** Highest-priority queued job (FIFO within a level), marked running.
    * Blocks up to `timeoutMs`; None on timeout or after close().
    */
  def dequeue(timeoutMs: Long = 0L): Option[QueuedJob] = lock.synchronized {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (open && queue.isEmpty && System.currentTimeMillis() < deadline)
      lock.wait(math.max(1L, deadline - System.currentTimeMillis()))
    if (!open || queue.isEmpty) None
    else {
      val job = queue.minBy(j => (j.priorityValue, j.seq))
      queue -= job
      val running = job.copy(status = "running")
      active(job.name) = running
      saveState()
      Some(running)
    }
  }

  /** Wake blocked dequeues and refuse further ones (pool shutdown). */
  def close(): Unit = lock.synchronized { open = false; lock.notifyAll() }

  /** The worker pool registers how to kill `name`'s in-flight Spark
    * work (cancelJobGroupAndFutureJobs) for the duration of its run.
    * Returns true if a cancel already arrived in the window between
    * dequeue (which makes the job visible as active) and this call —
    * the caller must then invoke its own canceller, or that cancel
    * would be lost to the not-yet-registered map.
    */
  private[graft] def registerCanceller(name: String, f: () => Unit): Boolean =
    lock.synchronized {
      cancellers(name) = f
      active.get(name).exists(_.status == "cancelling")
    }

  private[graft] def dropCanceller(name: String): Unit =
    lock.synchronized { cancellers -= name; () }

  /** Cancel a queued (immediate) or running (via the registered
    * canceller) job. False if the name is neither.
    */
  def cancel(name: String): Boolean = {
    val canceller: Option[() => Unit] = lock.synchronized {
      queue.find(_.name == name) match {
        case Some(job) =>
          queue -= job
          history(name) = job.copy(status = "cancelled")
          saveState()
          return true
        case None =>
          active.get(name) match {
            case Some(job) =>
              active(name) = job.copy(status = "cancelling")
              saveState()
              Some(cancellers.getOrElse(name, () => ()))
            case None => return false
          }
      }
    }
    // invoke OUTSIDE the lock: cancelJobGroup talks to the scheduler
    canceller.foreach(f => f())
    true
  }

  /** True while `name` is in the cancelling state — the worker uses
    * this to classify the SparkException its killed action throws.
    */
  def isCancelling(name: String): Boolean = lock.synchronized {
    active.get(name).exists(_.status == "cancelling")
  }

  /** Terminal transition from the worker pool. */
  def markDone(name: String, success: Boolean, output: String = ""): Unit =
    lock.synchronized {
      active.remove(name).foreach { job =>
        val status =
          if (job.status == "cancelling") "cancelled"
          else if (success) "completed"
          else "failed"
        history(name) = job.copy(status = status, output = output)
      }
      saveState()
    }

  def status(name: String): Option[QueuedJob] = lock.synchronized {
    queue.find(_.name == name).orElse(active.get(name)).orElse(history.get(name))
  }

  /** 0-based position among queued jobs in dequeue order. */
  def queuePosition(name: String): Option[Int] = lock.synchronized {
    val ordered = queue.sortBy(j => (j.priorityValue, j.seq))
    val i = ordered.indexWhere(_.name == name)
    if (i < 0) None else Some(i)
  }

  def listQueue(): Seq[QueuedJob] = lock.synchronized {
    queue.sortBy(j => (j.priorityValue, j.seq)).toVector
  }

  def listActive(): Seq[QueuedJob] = lock.synchronized { active.values.toVector }

  def listHistory(): Seq[QueuedJob] = lock.synchronized { history.values.toVector }

  // ---------------------------------------------------------- persistence

  private def jobNode(j: QueuedJob): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("name", j.name)
    n.put("priority", j.priority)
    n.put("queued_at", j.queuedAt)
    n.put("status", j.status)
    n.put("output", j.output)
    n.set[ObjectNode]("config", j.config)
    n
  }

  /** Queue + active + history to one JSON file (job_queue.py:374-412).
    * Called under the lock by every mutator. Write-temp-then-atomic-
    * rename: a crash mid-write must never leave a truncated file that
    * bricks the next start's loadState.
    */
  private def saveState(): Unit = {
    val root = mapper.createObjectNode()
    val q = root.putArray("queue")
    queue.sortBy(j => (j.priorityValue, j.seq)).foreach(j => q.add(jobNode(j)))
    val a = root.putArray("active")
    active.values.foreach(j => a.add(jobNode(j)))
    val h = root.putArray("history")
    history.values.foreach(j => h.add(jobNode(j)))
    val tmp = queueFile.resolveSibling(queueFile.getFileName.toString + ".tmp")
    Files.writeString(tmp,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    Files.move(tmp, queueFile, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** Restore queued jobs; anything that was running when the previous
    * process died comes back as failed/interrupted (job_queue.py:414-471).
    */
  private def loadState(): Unit = lock.synchronized {
    if (!Files.exists(queueFile)) return
    // a pre-atomic-rename writer (or a corrupted disk) may have left
    // unparseable JSON; starting empty beats refusing to start — move
    // the bad file aside for the operator instead of throwing
    val root =
      try mapper.readTree(Files.readString(queueFile))
      catch {
        case e: Exception =>
          val aside = queueFile.resolveSibling(
            queueFile.getFileName.toString + ".corrupt")
          Files.move(queueFile, aside,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          System.err.println(s"[graft.service] queue state unreadable " +
            s"(${e.getMessage}); moved to $aside, starting with an empty queue")
          return
      }
    def readArr(field: String): Seq[ObjectNode] =
      root.path(field) match {
        case arr: ArrayNode => arr.elements().asScala.toVector.collect {
          case o: ObjectNode => o
        }
        case _ => Vector.empty
      }
    def toJob(n: ObjectNode, status: String, output: String): QueuedJob = {
      seq += 1
      QueuedJob(n.path("name").asText(), normPriority(n.path("priority").asText("medium")),
        priorityOf(n.path("priority").asText("medium")), seq,
        n.path("queued_at").asLong(System.currentTimeMillis()), status,
        n.path("config") match {
          case o: ObjectNode => o
          case _ => mapper.createObjectNode()
        }, output)
    }
    readArr("queue").foreach(n => queue += toJob(n, "queued", ""))
    readArr("active").foreach { n =>
      val j = toJob(n, "failed", "interrupted: process terminated while job was running")
      history(j.name) = j
    }
    readArr("history").foreach { n =>
      val j = toJob(n, n.path("status").asText("failed"), n.path("output").asText(""))
      history(j.name) = j
    }
  }
}

object JobQueue {

  /** One queue entry. `config` is the job's embedded engine config
    * (the same shape `graft.Main --config` parses).
    */
  final case class QueuedJob(name: String, priority: String, priorityValue: Int,
      seq: Long, queuedAt: Long, status: String, config: ObjectNode,
      output: String)

  /** high=0, medium=1, low=2; unknown strings fall back to medium
    * exactly like the reference (job_queue.py:54-61).
    */
  def priorityOf(p: String): Int = p.toLowerCase match {
    case "high" => 0
    case "low" => 2
    case _ => 1
  }

  def normPriority(p: String): String = p.toLowerCase match {
    case "high" | "low" => p.toLowerCase
    case _ => "medium"
  }
}
