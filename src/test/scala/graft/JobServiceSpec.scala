package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.service.{JobQueue, JobService, JobWorkerPool}
import org.scalatest.funsuite.AnyFunSuite

/** Queue semantics vs the reference's job_queue.py contract, the
  * worker pool's Spark job-group execution (real cancelJobGroup
  * cancellation), and an HTTP round-trip through the REST surface —
  * the reference's tests/test_job_queue.py coverage re-expressed.
  */
class JobServiceSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def cfgNode(json: String): ObjectNode =
    mapper.readTree(json).asInstanceOf[ObjectNode]
  private val dummyCfg = cfgNode("""{"k":"v"}""")

  // ------------------------------------------------------------ queue unit

  test("priority order: high before medium before low, FIFO within a level") {
    val q = new JobQueue(Files.createTempDirectory("jq").resolve("q.json"))
    Seq("a" -> "low", "b" -> "medium", "c" -> "high", "d" -> "medium",
      "e" -> "HIGH", "f" -> "bogus").foreach { case (n, p) =>
      assert(q.enqueue(n, dummyCfg, p).isDefined)
    }
    // bogus priority falls back to medium (job_queue.py:54-61)
    val order = Iterator.continually(q.dequeue()).takeWhile(_.isDefined)
      .map(_.get.name).toVector
    assert(order == Vector("c", "e", "b", "d", "f", "a"))
  }

  test("duplicate enqueue rejected while queued or active; allowed after terminal") {
    val q = new JobQueue(Files.createTempDirectory("jq").resolve("q.json"))
    assert(q.enqueue("j", dummyCfg).isDefined)
    assert(q.enqueue("j", dummyCfg).isEmpty)     // queued
    val job = q.dequeue().get
    assert(q.enqueue("j", dummyCfg).isEmpty)     // running
    q.markDone(job.name, success = true)
    assert(q.status("j").get.status == "completed")
    assert(q.enqueue("j", dummyCfg).isDefined)   // terminal -> re-runnable
  }

  test("cancel: queued cancels immediately; running goes through cancelling") {
    val q = new JobQueue(Files.createTempDirectory("jq").resolve("q.json"))
    q.enqueue("queued", dummyCfg)
    q.enqueue("running", dummyCfg, "high")
    val r = q.dequeue().get
    assert(r.name == "running")
    assert(q.cancel("queued"))
    assert(q.status("queued").get.status == "cancelled")
    var invoked = false
    q.registerCanceller("running", () => invoked = true)
    assert(q.cancel("running"))
    assert(invoked, "cancel of a running job must invoke the registered canceller")
    assert(q.isCancelling("running"))
    q.markDone("running", success = false)
    assert(q.status("running").get.status == "cancelled")
    assert(!q.cancel("nope"))
  }

  test("persistence: queued jobs survive a restart; running jobs come back failed") {
    val f = Files.createTempDirectory("jq").resolve("q.json")
    val q1 = new JobQueue(f)
    q1.enqueue("waiting", dummyCfg, "low")
    q1.enqueue("inflight", dummyCfg, "high")
    q1.dequeue() // inflight -> running, state saved
    val q2 = new JobQueue(f) // simulated process restart
    assert(q2.listQueue().map(_.name) == Vector("waiting"))
    assert(q2.status("waiting").get.config.path("k").asText() == "v")
    val dead = q2.status("inflight").get
    assert(dead.status == "failed" && dead.output.contains("interrupted"))
  }

  test("corrupt queue state does not brick startup: moved aside, queue starts empty") {
    val f = Files.createTempDirectory("jq").resolve("q.json")
    Files.writeString(f, """{"queue": [ truncated-by-a-crash""")
    val q = new JobQueue(f) // must not throw
    assert(q.listQueue().isEmpty && q.listHistory().isEmpty)
    assert(Files.exists(f.resolveSibling("q.json.corrupt")))
    // and the queue is usable afterwards (saveState recreates the file)
    assert(q.enqueue("fresh", dummyCfg).isDefined)
    assert(new JobQueue(f).listQueue().map(_.name) == Vector("fresh"))
  }

  test("registerCanceller reports a cancel that raced ahead of registration") {
    val q = new JobQueue(Files.createTempDirectory("jq").resolve("q.json"))
    q.enqueue("r", dummyCfg)
    q.dequeue()
    // cancel lands BEFORE the worker registers (the dequeue->register window)
    assert(q.cancel("r"))
    var invoked = false
    assert(q.registerCanceller("r", () => invoked = true),
      "registerCanceller must report the pending cancel")
    // the worker invokes its own canceller on a true return
  }

  test("job names cannot escape the jobs directory or shadow routes") {
    val store = new graft.Cli.JobStore(Files.createTempDirectory("js"))
    intercept[IllegalArgumentException](store.save("../escape", "", dummyCfg))
    intercept[IllegalArgumentException](store.save("a/b", "", dummyCfg))
    intercept[IllegalArgumentException](store.save("queue", "", dummyCfg))
    store.save("fine-name", "", dummyCfg)
    assert(store.get("fine-name").isDefined)
  }

  // --------------------------------------------------- pool + spark cancel

  test("pool executes by priority and really cancels a running Spark job") {
    val spark = SparkTestBase.spark
    val q = new JobQueue(Files.createTempDirectory("jq").resolve("q.json"))
    val ran = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val started = new java.util.concurrent.CountDownLatch(1)
    @volatile var sleepyFast = false
    val exec: (org.apache.spark.sql.SparkSession, JobQueue.QueuedJob) => Unit =
      (s, job) => {
        ran.add(job.name)
        if (job.name == "sleepy" && !sleepyFast) {
          started.countDown()
          // interruptible distributed work: the job-group cancel must
          // kill it
          s.range(0, 1000000L, 1, numPartitions = 4).foreach { _ =>
            Thread.sleep(1L)
          }
        } else {
          assert(s.sparkContext.getLocalProperty("spark.scheduler.pool") == job.priority)
          s.range(0, 100L).count(); ()
        }
      }
    // single worker: admission order IS the priority order
    val pool = new JobWorkerPool(spark, q, maxWorkers = 1, execute = exec)
    q.enqueue("slow-lane", dummyCfg, "low")
    q.enqueue("fast-lane", dummyCfg, "high")
    q.enqueue("mid-lane", dummyCfg, "medium")
    pool.start()
    assert(pool.awaitQuiet(60000L), "pool did not drain")
    assert(ran.toArray.toVector == Vector("fast-lane", "mid-lane", "slow-lane"))
    Seq("fast-lane", "mid-lane", "slow-lane").foreach(n =>
      assert(q.status(n).get.status == "completed"))

    // cancellation: the sleepy job would run for ~1e6 ms; cancel must
    // stop it in seconds via cancelJobGroup
    q.enqueue("sleepy", dummyCfg, "high")
    assert(started.await(30, java.util.concurrent.TimeUnit.SECONDS),
      "sleepy job never started")
    Thread.sleep(200L) // let the action submit its stages
    val t0 = System.nanoTime()
    assert(q.cancel("sleepy"))
    assert(pool.awaitQuiet(30000L), "cancelled job did not release its worker")
    val waitedSec = (System.nanoTime() - t0) / 1e9
    assert(q.status("sleepy").get.status == "cancelled")
    assert(waitedSec < 25.0, s"cancel took $waitedSec s — job group not killed")

    // a cancelled NAME must be re-runnable: cancelJobGroupAndFutureJobs
    // permanently poisons the group id, so the pool keys groups by run
    // (name-seq) — a reused name-only group would kill this run on
    // submission
    sleepyFast = true
    q.enqueue("sleepy", dummyCfg, "high")
    assert(pool.awaitQuiet(30000L), "re-run of cancelled name did not finish")
    assert(q.status("sleepy").get.status == "completed",
      "fresh run of a previously cancelled job name must complete")
    pool.stop()
  }

  // ------------------------------------------------------- http round-trip

  test("REST round-trip: save, run to completion, search, health") {
    val spark = SparkTestBase.spark
    val dir = Files.createTempDirectory("jobsvc")
    val out = dir.resolve("clusters").toString
    val svc = new JobService(spark, dir.resolve("jobs"), port = 0, maxWorkers = 1)
    svc.start()
    try {
      val base = s"http://127.0.0.1:${svc.boundPort}"
      val http = HttpClient.newHttpClient()
      def req(r: HttpRequest): (Int, String) = {
        val resp = http.send(r, HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      }
      def post(path: String, body: String) = req(HttpRequest.newBuilder(
        URI.create(base + path)).POST(HttpRequest.BodyPublishers.ofString(body)).build())
      def get(path: String) = req(HttpRequest.newBuilder(URI.create(base + path)).build())

      // save a clustering job over the real sf0.001 documents table
      val jobJson =
        s"""{"name": "dedup-docs", "description": "near-dup clustering",
           | "config": {"mode": "clustering",
           |   "source1": "/root/testdata/sf0.001/documents.parquet",
           |   "output": "$out",
           |   "cluster_config": {"threshold": 0.8,
           |     "columns": [{"source1": "text", "weight": 1.0}]}}}""".stripMargin
      assert(post("/api/jobs", jobJson)._1 == 200)
      val (lc, lb) = get("/api/jobs")
      assert(lc == 200 && lb.contains("dedup-docs"))
      assert(get("/api/jobs/nope")._1 == 404)

      // run it and poll to terminal state
      val (rc, rb) = post("/api/jobs/dedup-docs/run", """{"priority": "high"}""")
      assert(rc == 200 && rb.contains("queued"))
      assert(post("/api/jobs/dedup-docs/run", "")._1 == 409) // already queued/running
      var status = ""
      val deadline = System.currentTimeMillis() + 120000L
      while (status != "completed" && status != "failed" &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(250L)
        val (_, sb) = get("/api/jobs/dedup-docs/status")
        status = mapper.readTree(sb).path("status").asText()
      }
      assert(status == "completed",
        s"job did not complete: ${get("/api/jobs/dedup-docs/status")._2}")
      val clusters = spark.read.parquet(out)
      assert(clusters.count() == 500L)
      assert(clusters.columns.contains("cluster_id"))

      // synchronous search against the customer table
      val (sc, sb) = post("/api/search",
        """{"master": "/root/testdata/sf0.001/customer.parquet",
          | "query": {"c_name": "Customer#000000001"},
          | "threshold": 0.5, "max_results": 3}""".stripMargin)
      assert(sc == 200, sb)
      val hits = mapper.readTree(sb)
      assert(hits.isArray && hits.size() >= 1 && hits.size() <= 3, sb)

      val (hc, hb) = get("/health")
      assert(hc == 200 && mapper.readTree(hb).path("status").asText() == "healthy")

      // API discovery root (web_service.py:118-135)
      val (ac, ab) = get("/")
      assert(ac == 200 &&
        mapper.readTree(ab).path("endpoints").path("search").asText() == "/api/search")
    } finally svc.stop()
  }
}
