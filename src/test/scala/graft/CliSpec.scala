package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.config.JobConfig

/** Interactive CLI surfaces (--setup wizard, --ui job manager) driven
  * with scripted input — the reference's main.py:11-69 + cli_ui.py
  * flows re-expressed; outputs must load through JobConfig.parse.
  */
class CliSpec extends AnyFunSuite {

  private def reader(lines: String*): BufferedReader =
    new BufferedReader(new StringReader(lines.mkString("\n") + "\n"))

  private def sink(): (PrintStream, ByteArrayOutputStream) = {
    val bos = new ByteArrayOutputStream()
    (new PrintStream(bos, true, "UTF-8"), bos)
  }

  test("--setup wizard (csv flow + advanced) writes a loadable config") {
    val dir = Files.createTempDirectory("setup")
    val cfgPath = dir.resolve("cfg.json").toString
    val (out, bos) = sink()
    val in = reader("csv", "a.csv", "csv", "b.csv", "out.csv", "y", "0.9", "0.1")
    val written = Cli.setupConfig(in, out, cfgPath)
    assert(written == cfgPath)
    assert(bos.toString("UTF-8").contains("Configuration saved to"))
    val cfg = JobConfig.parseFile(cfgPath)
    assert(cfg.source1.get.path.contains("a.csv"))
    assert(cfg.source2.get.path.contains("b.csv"))
    assert(cfg.output.path.contains("out.csv"))
    assert(cfg.matchConfig.threshold == 0.9)
    assert(cfg.matchConfig.undecidedRange == 0.1)
  }

  test("--setup mysql flow: top-level mysql_credentials map to a JDBC table spec") {
    val dir = Files.createTempDirectory("setup")
    val cfgPath = dir.resolve("cfg.json").toString
    val (out, _) = sink()
    // mysql source1 (table + creds), csv source2, default output, no advanced
    val in = reader("mysql", "people", "dbhost", "u", "pw", "db",
      "csv", "b.csv", "", "n")
    Cli.setupConfig(in, out, cfgPath)
    val cfg = JobConfig.parseFile(cfgPath)
    assert(cfg.source1.get.isJdbc, "string source + mysql_credentials must become a table spec")
    assert(cfg.source1.get.table.contains("people"))
    assert(cfg.source1.get.host.contains("dbhost"))
    assert(cfg.source1.get.jdbcUrl.contains("jdbc:mysql://dbhost/db"))
    assert(cfg.source2.get.path.contains("b.csv"))
    assert(cfg.output.path.contains("results/matches.csv"))
  }

  test("--ui job manager: create, list, view, run end-to-end, delete") {
    val spark = SparkTestBase.spark
    val dir = Files.createTempDirectory("ui")
    val s1 = dir.resolve("s1.csv").toString
    val s2 = dir.resolve("s2.csv").toString
    Files.writeString(dir.resolve("s1.csv"),
      "id,name\n1,alice cooper\n2,bob dylan\n")
    Files.writeString(dir.resolve("s2.csv"),
      "id,name\n1,alice cooper\n2,bob dillan\n")
    val outCsv = dir.resolve("matches.csv").toString
    val jobsDir = dir.resolve("jobs")
    val (out, bos) = sink()
    val in = reader(
      "1", "demo", "match the demo csvs",          // create job: name, description
      "csv", s1, "csv", s2, outCsv, "n",           // embedded wizard
      "2",                                          // list
      "6", "demo",                                  // view
      "5", "demo",                                  // run
      "4", "demo",                                  // delete
      "7")                                          // exit
    Cli.ui(in, out, spark, jobsDir)
    val printed = bos.toString("UTF-8")
    assert(printed.contains("FUZZY MATCHING ENGINE - JOB MANAGER"))
    assert(printed.contains("Job 'demo' saved."))
    assert(printed.contains("demo"), "list must show the job")
    assert(printed.contains("\"config\""), "view must print the stored config")
    assert(printed.contains("Done!"), "run must complete")
    assert(printed.contains("Job 'demo' deleted."))
    assert(!Files.exists(jobsDir.resolve("demo.json")), "delete must remove the file")
    // the run produced real matches on the csv pair
    val got = spark.read.option("header", "true").csv(outCsv)
    assert(got.count() == 2)
    assert(got.columns.contains("overall_score") && got.columns.contains("match_result"))
  }

  test("unknown menu option re-prompts like the reference") {
    val spark = SparkTestBase.spark
    val dir = Files.createTempDirectory("ui2")
    val (out, bos) = sink()
    Cli.ui(reader("9", "7"), out, spark, dir.resolve("jobs"))
    assert(bos.toString("UTF-8").contains("Invalid option. Please select 1-7."))
  }

  test("running an unknown or failing job re-prompts instead of killing the menu") {
    val spark = SparkTestBase.spark
    val dir = Files.createTempDirectory("ui3")
    val (out, bos) = sink()
    // 5 with a typo'd name, then create a job whose config points at a
    // missing csv, run it (fails inside the engine), then exit cleanly
    val in = reader(
      "5", "nope",
      "1", "bad", "points at a missing file",
      "csv", dir.resolve("missing.csv").toString, "csv",
      dir.resolve("missing2.csv").toString, dir.resolve("o.csv").toString, "n",
      "5", "bad",
      "7")
    Cli.ui(in, out, spark, dir.resolve("jobs"))
    val printed = bos.toString("UTF-8")
    assert(printed.contains("✗ Job 'nope' failed:"))
    assert(printed.contains("✗ Job 'bad' failed:"))
  }

  test("--setup advanced options survive non-numeric input (default kept)") {
    val dir = Files.createTempDirectory("setup2")
    val cfgPath = dir.resolve("cfg.json").toString
    val (out, bos) = sink()
    val in = reader("csv", "a.csv", "csv", "b.csv", "out.csv", "y", "0,9", "0.1")
    Cli.setupConfig(in, out, cfgPath)
    assert(bos.toString("UTF-8").contains("Not a number: '0,9'"))
    val cfg = JobConfig.parseFile(cfgPath)
    assert(cfg.matchConfig.threshold == 0.75,
      "bad threshold input writes no key -> engine default (config_validator.py default)")
    assert(cfg.matchConfig.undecidedRange == 0.1, "the valid answer is still honored")
  }
}
