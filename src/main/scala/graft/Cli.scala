package graft

import java.io.{BufferedReader, PrintStream}
import java.nio.file.{Files, Path, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Interactive CLI surfaces of the reference engine, re-expressed for
  * a spark-submit world:
  *
  *  - `--setup`: the configuration wizard (reference main.py:11-69) —
  *    prompts for sources (csv path or mysql table + credentials),
  *    output, optional threshold/undecided, and writes the SAME config
  *    shape the reference writes (string sources + top-level
  *    `mysql_credentials`), which `JobConfig.parse` loads directly.
  *  - `--ui`: the job-management menu (reference cli_ui.py:19-57 +
  *    job_manager.py): jobs persist as `jobs/<name>.json` with
  *    name/description/config; create/list/view/delete/run.
  *
  * Both read from an injectable Reader and write to an injectable
  * PrintStream so the suite can drive them with scripted input.
  */
object Cli {

  private val mapper = new ObjectMapper()

  private def ask(in: BufferedReader, out: PrintStream, prompt: String): String = {
    out.print(prompt)
    out.flush()
    Option(in.readLine()).getOrElse("").trim
  }

  private def askMysqlCreds(in: BufferedReader, out: PrintStream): ObjectNode = {
    val creds = mapper.createObjectNode()
    val host = ask(in, out, "MySQL host [localhost]: ")
    creds.put("host", if (host.isEmpty) "localhost" else host)
    creds.put("user", ask(in, out, "MySQL user: "))
    creds.put("password", ask(in, out, "MySQL password: "))
    creds.put("database", ask(in, out, "MySQL database: "))
    creds
  }

  /** The `--setup` wizard (main.py:11-69): same prompt flow, same
    * output shape and default path. Returns the written config path.
    */
  def setupConfig(in: BufferedReader, out: PrintStream,
      configPath: String = "config/example_config.json"): String = {
    out.println("Fuzzy Matching Engine - Configuration Setup")
    out.println("=" * 50)
    val config = mapper.createObjectNode()

    out.println("\nSource 1:")
    val t1 = ask(in, out, "Is source1 a CSV file or MySQL table? (csv/mysql) [csv]: ").toLowerCase
    if (t1 == "mysql") {
      config.put("source1", ask(in, out, "Enter table name: "))
      config.set[ObjectNode]("mysql_credentials", askMysqlCreds(in, out))
    } else config.put("source1", ask(in, out, "Enter CSV file path: "))

    out.println("\nSource 2:")
    val t2 = ask(in, out, "Is source2 a CSV file or MySQL table? (csv/mysql) [csv]: ").toLowerCase
    if (t2 == "mysql") {
      if (!config.has("mysql_credentials"))
        config.set[ObjectNode]("mysql_credentials", askMysqlCreds(in, out))
      config.put("source2", ask(in, out, "Enter table name: "))
    } else config.put("source2", ask(in, out, "Enter CSV file path: "))

    val outPath = ask(in, out, "\nOutput CSV file path [results/matches.csv]: ")
    config.put("output", if (outPath.isEmpty) "results/matches.csv" else outPath)

    if (ask(in, out, "\nConfigure advanced options? (y/n) [n]: ").toLowerCase == "y") {
      // non-numeric input falls back to the documented default rather
      // than killing the wizard (and the user's answers so far)
      def num(prompt: String): Option[Double] = {
        val s = ask(in, out, prompt)
        val v = s.toDoubleOption
        if (s.nonEmpty && v.isEmpty) out.println(s"✗ Not a number: '$s' — keeping the default.")
        v
      }
      val th = num("Match threshold (0-1) [0.85]: ")
      val un = num("Undecided range (0-1) [0.05]: ")
      if (th.nonEmpty || un.nonEmpty) {
        val mc = mapper.createObjectNode()
        th.foreach(mc.put("threshold", _))
        un.foreach(mc.put("undecided_range", _))
        config.set[ObjectNode]("match_config", mc)
      }
    }

    val p = Paths.get(configPath)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(config))
    out.println(s"\nConfiguration saved to $configPath")
    configPath
  }

  /** Job store: `jobs/<name>.json` files holding
    * {name, description, config} (job_manager.py:10-151).
    */
  final class JobStore(val jobsDir: Path) {
    Files.createDirectories(jobsDir)

    /** Job names are filenames under jobsDir — reject anything that
      * could escape it (path separators; ".." is harmless because the
      * ".json" suffix makes it a plain filename) or collide with the
      * REST route space ("queue" shadows GET /api/jobs/queue).
      */
    def validateName(name: String): Unit = {
      require(name.nonEmpty, "job name is required")
      require(!name.contains('/') && !name.contains('\\'),
        s"invalid job name '$name': must not contain path separators")
      require(name != "queue", "'queue' is a reserved job name")
    }

    def jobPath(name: String): Path = {
      validateName(name)
      jobsDir.resolve(s"$name.json")
    }

    def list(): Seq[(String, String)] = {
      // Files.list holds a directory handle until closed — drain it
      // inside try/finally or a long-lived menu session leaks fds
      val stream = Files.list(jobsDir)
      val paths =
        try stream.iterator().asScala.toVector
        finally stream.close()
      paths.filter(_.toString.endsWith(".json")).sortBy(_.toString)
        .map { p =>
          val n = mapper.readTree(Files.readString(p))
          (n.path("name").asText(p.getFileName.toString.stripSuffix(".json")),
            n.path("description").asText(""))
        }
    }

    def save(name: String, description: String, config: ObjectNode): Unit = {
      val job = mapper.createObjectNode()
      job.put("name", name)
      job.put("description", description)
      job.set[ObjectNode]("config", config)
      Files.writeString(jobPath(name),
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(job))
      ()
    }

    def get(name: String): Option[ObjectNode] =
      if (Files.exists(jobPath(name)))
        Some(mapper.readTree(Files.readString(jobPath(name))).asInstanceOf[ObjectNode])
      else None

    def delete(name: String): Boolean =
      Files.deleteIfExists(jobPath(name))

    /** Materialize a job's embedded config as a standalone file and
      * run it through the engine (job_runner semantics).
      */
    def run(spark: SparkSession, name: String): Unit = {
      val job = get(name).getOrElse(
        throw new IllegalArgumentException(s"Job '$name' not found"))
      val cfgFile = Files.createTempFile("graft_job", ".json")
      Files.writeString(cfgFile, mapper.writeValueAsString(job.get("config")))
      Main.runConfig(spark, cfgFile.toString)
    }
  }

  /** The `--ui` menu loop (cli_ui.py:19-57). Reads menu choices until
    * Exit; unknown choices re-prompt like the reference.
    */
  def ui(in: BufferedReader, out: PrintStream, spark: SparkSession,
      jobsDir: Path = Paths.get("jobs")): Unit = {
    val store = new JobStore(jobsDir)
    var running = true
    while (running) {
      out.println("\n" + "=" * 60)
      out.println("FUZZY MATCHING ENGINE - JOB MANAGER")
      out.println("=" * 60)
      out.println("\n1. Create New Job")
      out.println("2. List Jobs")
      out.println("3. Edit Job")
      out.println("4. Delete Job")
      out.println("5. Run Job")
      out.println("6. View Job Details")
      out.println("7. Exit")
      out.println("=" * 60)
      ask(in, out, "\nSelect an option: ") match {
        case "1" | "3" =>
          // Edit re-runs the wizard under the same name (the reference's
          // configurator walks the same prompts)
          val name = ask(in, out, "Job name: ")
          if (name.nonEmpty) {
            val desc = ask(in, out, "Description: ")
            val tmp = Files.createTempFile("graft_setup", ".json")
            setupConfig(in, out, tmp.toString)
            store.save(name, desc,
              mapper.readTree(Files.readString(tmp)).asInstanceOf[ObjectNode])
            out.println(s"\nJob '$name' saved.")
          }
        case "2" =>
          out.println("\n" + "=" * 60)
          out.println("SAVED JOBS")
          out.println("=" * 60)
          val jobs = store.list()
          if (jobs.isEmpty) out.println("\nNo jobs found.")
          else jobs.foreach { case (n, d) => out.println(f"$n%-30s $d%-30s") }
        case "4" =>
          val name = ask(in, out, "Job name to delete: ")
          if (store.delete(name)) out.println(s"Job '$name' deleted.")
          else out.println(s"Job '$name' not found.")
        case "5" =>
          val name = ask(in, out, "Job name to run: ")
          // a typo'd name or a failing job must re-prompt (reference
          // cli_ui catches per-action errors), not kill the menu loop
          try {
            store.run(spark, name)
            out.println("Done!")
          } catch {
            case scala.util.control.NonFatal(e) =>
              out.println(s"✗ Job '$name' failed: ${e.getMessage}")
          }
        case "6" =>
          val name = ask(in, out, "Job name: ")
          store.get(name) match {
            case Some(j) => out.println(mapper.writerWithDefaultPrettyPrinter()
              .writeValueAsString(j))
            case None => out.println(s"Job '$name' not found.")
          }
        case "7" => running = false
        case _ => out.println("\n✗ Invalid option. Please select 1-7.")
      }
    }
  }
}
