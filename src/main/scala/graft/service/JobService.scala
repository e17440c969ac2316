package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** REST job service — the engine-side equivalent of the reference's
  * FastAPI app (`web_service.py:118-471`), on the JDK's built-in
  * `HttpServer` (zero added dependencies). Endpoint parity:
  *
  *   GET    /health                      liveness + queue gauges
  *   GET    /api/jobs                    saved jobs [{name, description}]
  *   POST   /api/jobs                    save {name, description, config}
  *   GET    /api/jobs/queue              queued entries in dequeue order
  *   GET    /api/jobs/{name}             saved job JSON
  *   PUT    /api/jobs/{name}             update
  *   DELETE /api/jobs/{name}             delete
  *   POST   /api/jobs/{name}/run         enqueue {priority} -> position
  *   GET    /api/jobs/{name}/status      queued/running/terminal status
  *   GET    /api/jobs/{name}/queue-status  position gauge
  *   POST   /api/jobs/{name}/cancel      cancel queued or running
  *   POST   /api/search                  {master, query, threshold?,
  *                                        max_results?} -> rows
  *
  * Job definitions persist through the same `jobs/<name>.json` store
  * the `--ui` manager uses (Cli.JobStore); execution goes through the
  * queue + worker pool, so every run carries a Spark job group (HTTP
  * cancel really kills the stages) and a fair-scheduler pool named by
  * its priority.
  */
final class JobService(spark: SparkSession, jobsDir: Path, port: Int,
    maxWorkers: Int = JobWorkerPool.defaultMaxWorkers,
    bind: String = "127.0.0.1") {

  private val mapper = new ObjectMapper()
  private val store = new graft.Cli.JobStore(jobsDir)
  // queue state lives OUTSIDE the store's <name>.json glob, or the
  // job listing would surface it as a job named "queue_state"
  val queue = new JobQueue(jobsDir.resolve("_state").resolve("queue_state.json"))
  private val pool = new JobWorkerPool(spark, queue, maxWorkers)
  // loopback by default: the API is unauthenticated and /api/search
  // reads caller-supplied paths, so exposing it beyond the host is an
  // explicit operator decision (--bind 0.0.0.0, the reference's
  // uvicorn default) to make behind their own network controls
  private val server = HttpServer.create(new InetSocketAddress(bind, port), 0)

  /** Bound port (0 in the constructor picks a free one — tests). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = {
    pool.start()
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
  }

  def stop(): Unit = {
    server.stop(0)
    pool.stop()
  }

  // ------------------------------------------------------------- routing

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    try {
      (method, path.split("/").toList.filter(_.nonEmpty)) match {
        case ("GET", Nil) => apiRoot(ex)
        case ("GET", List("health")) => health(ex)
        case ("GET", List("api", "jobs")) => listJobs(ex)
        case ("POST", List("api", "jobs")) => saveJob(ex, None)
        case ("GET", List("api", "jobs", "queue")) => listQueue(ex)
        case ("GET", List("api", "jobs", name)) => getJob(ex, name)
        case ("PUT", List("api", "jobs", name)) => saveJob(ex, Some(name))
        case ("DELETE", List("api", "jobs", name)) => deleteJob(ex, name)
        case ("POST", List("api", "jobs", name, "run")) => runJob(ex, name)
        case ("GET", List("api", "jobs", name, "status")) => jobStatus(ex, name)
        case ("GET", List("api", "jobs", name, "queue-status")) => queueStatus(ex, name)
        case ("POST", List("api", "jobs", name, "cancel")) => cancelJob(ex, name)
        case ("POST", List("api", "search")) => search(ex)
        case _ => sendError(ex, 404, s"not found: $method $path")
      }
    } catch {
      case e: IllegalArgumentException => sendError(ex, 400, e.getMessage)
      case NonFatal(e) => sendError(ex, 500, String.valueOf(e.getMessage))
    } finally ex.close()
  }

  // ------------------------------------------------------------ handlers

  /** API discovery page (web_service.py:118-135). */
  private def apiRoot(ex: HttpExchange): Unit = {
    val n = mapper.createObjectNode()
    n.put("name", "Fuzzy Matching Engine API")
    n.put("version", "1.0.0")
    val e = n.putObject("endpoints")
    e.put("jobs", "/api/jobs")
    e.put("job_detail", "/api/jobs/{name}")
    e.put("run_job", "/api/jobs/{name}/run")
    e.put("job_status", "/api/jobs/{name}/status")
    e.put("queue", "/api/jobs/queue")
    e.put("cancel_job", "/api/jobs/{name}/cancel")
    e.put("queue_status", "/api/jobs/{name}/queue-status")
    e.put("search", "/api/search")
    send(ex, 200, n)
  }

  private def health(ex: HttpExchange): Unit = {
    val n = mapper.createObjectNode()
    n.put("status", "healthy")
    n.put("active_jobs", queue.listActive().size)
    n.put("queued_jobs", queue.listQueue().size)
    send(ex, 200, n)
  }

  private def listJobs(ex: HttpExchange): Unit = {
    val arr = mapper.createArrayNode()
    store.list().foreach { case (name, desc) =>
      val n = mapper.createObjectNode()
      n.put("name", name); n.put("description", desc)
      arr.add(n)
    }
    sendRaw(ex, 200, arr.toString)
  }

  private def saveJob(ex: HttpExchange, pathName: Option[String]): Unit = {
    val body = readJson(ex)
    val name = pathName.getOrElse(body.path("name").asText(""))
    require(name.nonEmpty, "job name is required")
    if (pathName.isDefined && store.get(name).isEmpty) {
      sendError(ex, 404, s"job '$name' not found"); return
    }
    val cfg = body.path("config") match {
      case o: ObjectNode => o
      case _ => throw new IllegalArgumentException("config object is required")
    }
    store.save(name, body.path("description").asText(""), cfg)
    getJob(ex, name)
  }

  private def getJob(ex: HttpExchange, name: String): Unit =
    store.get(name) match {
      case Some(j) => sendRaw(ex, 200, j.toString)
      case None => sendError(ex, 404, s"job '$name' not found")
    }

  private def deleteJob(ex: HttpExchange, name: String): Unit =
    if (store.delete(name)) {
      val n = mapper.createObjectNode(); n.put("deleted", name); send(ex, 200, n)
    } else sendError(ex, 404, s"job '$name' not found")

  private def runJob(ex: HttpExchange, name: String): Unit =
    store.get(name) match {
      case None => sendError(ex, 404, s"job '$name' not found")
      case Some(job) =>
        val priority = readJsonOpt(ex).map(_.path("priority").asText("medium"))
          .getOrElse("medium")
        val cfg = job.path("config") match {
          case o: ObjectNode => o
          case _ => mapper.createObjectNode()
        }
        queue.enqueue(name, cfg, priority) match {
          case Some(pos) =>
            val n = mapper.createObjectNode()
            n.put("name", name); n.put("status", "queued")
            n.put("priority", JobQueue.normPriority(priority))
            n.put("queue_position", pos)
            send(ex, 200, n)
          case None => sendError(ex, 409, s"job '$name' is already queued or running")
        }
    }

  private def jobStatus(ex: HttpExchange, name: String): Unit =
    queue.status(name) match {
      case Some(j) =>
        val n = mapper.createObjectNode()
        n.put("name", j.name); n.put("status", j.status)
        n.put("priority", j.priority); n.put("output", j.output)
        send(ex, 200, n)
      case None => sendError(ex, 404, s"no status for job '$name'")
    }

  private def queueStatus(ex: HttpExchange, name: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("name", name)
    queue.queuePosition(name) match {
      case Some(p) => n.put("queued", true); n.put("position", p)
      case None => n.put("queued", false)
    }
    send(ex, 200, n)
  }

  private def cancelJob(ex: HttpExchange, name: String): Unit =
    if (queue.cancel(name)) {
      val n = mapper.createObjectNode()
      n.put("name", name); n.put("cancelled", true)
      send(ex, 200, n)
    } else sendError(ex, 404, s"job '$name' is neither queued nor running")

  private def listQueue(ex: HttpExchange): Unit = {
    val arr = mapper.createArrayNode()
    queue.listQueue().zipWithIndex.foreach { case (j, i) =>
      val n = mapper.createObjectNode()
      n.put("name", j.name); n.put("priority", j.priority)
      n.put("position", i); n.put("queued_at", j.queuedAt)
      arr.add(n)
    }
    sendRaw(ex, 200, arr.toString)
  }

  /** Synchronous search (web_service.py:406-471): master path + query
    * record in the body, results as JSON rows. Runs on the request
    * thread — search is the reference's interactive low-latency mode.
    */
  private def search(ex: HttpExchange): Unit = {
    val body = readJson(ex)
    val masterPath = body.path("master").asText("")
    require(masterPath.nonEmpty, "master (path to the master dataset) is required")
    val qNode = body.path("query") match {
      case o: ObjectNode => o
      case _ => throw new IllegalArgumentException("query object is required")
    }
    import scala.jdk.CollectionConverters._
    val query = qNode.fields().asScala.map(e =>
      e.getKey -> (e.getValue.asText(), e.getValue.isNumber)).toMap
    val master = graft.io.Sources.read(spark,
      graft.config.SourceSpec(path = Some(masterPath)))
    val fields = graft.Main.searchFields(master, query, Nil)
    val hits = graft.matching.Matching.search(master, master.columns.head, fields,
      body.path("threshold").asDouble(0.5),
      body.path("max_results").asInt(10))
    val rows = hits.toJSON.collect() // bounded: LIMIT max_results upstream
    sendRaw(ex, 200, rows.mkString("[", ",", "]"))
  }

  // ------------------------------------------------------------ plumbing

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def readJson(ex: HttpExchange): ObjectNode = {
    val s = readBody(ex)
    require(s.nonEmpty, "request body is required")
    mapper.readTree(s) match {
      case o: ObjectNode => o
      case _ => throw new IllegalArgumentException("JSON object body expected")
    }
  }

  private def readJsonOpt(ex: HttpExchange): Option[ObjectNode] = {
    val s = readBody(ex)
    if (s.isEmpty) None
    else mapper.readTree(s) match {
      case o: ObjectNode => Some(o)
      case _ => None
    }
  }

  private def send(ex: HttpExchange, code: Int, node: ObjectNode): Unit =
    sendRaw(ex, code, node.toString)

  private def sendError(ex: HttpExchange, code: Int, msg: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("error", msg)
    send(ex, code, n)
  }

  private def sendRaw(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

object JobService {

  /** Session for the service: FAIR scheduling with weighted pools per
    * priority (high 4x, medium 2x, low 1x), so a high-priority job
    * admitted while a low one runs is immediately weighted onto more
    * cores — the Spark-native form of the reference's priority levels,
    * which only order ADMISSION. The allocation file is generated
    * because Spark reads pool weights from XML only.
    */
  def fairSession(master: String, shufflePartitions: Int): SparkSession = {
    val poolsXml =
      """<?xml version="1.0"?>
        |<allocations>
        |  <pool name="high"><schedulingMode>FIFO</schedulingMode><weight>4</weight><minShare>1</minShare></pool>
        |  <pool name="medium"><schedulingMode>FIFO</schedulingMode><weight>2</weight><minShare>0</minShare></pool>
        |  <pool name="low"><schedulingMode>FIFO</schedulingMode><weight>1</weight><minShare>0</minShare></pool>
        |</allocations>""".stripMargin
    val f = Files.createTempFile("graft_pools", ".xml")
    Files.writeString(f, poolsXml)
    SparkSession.builder()
      .appName("graft-service")
      .master(master)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", f.toString)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
  }

  /** `graft.service.JobService --port 8080 --jobs-dir jobs
    * [--bind 0.0.0.0] [--max-workers N]` — the uvicorn-equivalent
    * entry point (web_service.py runs standalone the same way).
    * Binds loopback unless --bind widens it (see the server field).
    */
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = fairSession(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    val bind = opts.getOrElse("bind", "127.0.0.1")
    val svc = new JobService(spark,
      Paths.get(opts.getOrElse("jobs-dir", "jobs")),
      opts.getOrElse("port", "8080").toInt,
      opts.get("max-workers").map(_.toInt).getOrElse(JobWorkerPool.defaultMaxWorkers),
      bind)
    svc.start()
    println(s"graft job service listening on $bind:${svc.boundPort}")
    Thread.currentThread().join()
  }
}
