package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.ColumnAnalyzer
import graft.config.JobConfig
import graft.dedup.{Dedup, DedupConfig}
import graft.io.Sources
import graft.matching.{MatchOptions, Matching}

/** spark-submit entry point with the reference CLI's surface
  * (/root/reference/src/main.py:71-302):
  *
  *   graft.Main --config cfg.json                   # matching/clustering
  *   graft.Main --search --master data.parquet \
  *              --query '{"name":"Bob"}' [--threshold 0.7] [--max-results 10]
  *
  * The job queue / REST service / interactive UI of the reference are
  * orchestration, not engine semantics (SURVEY §2.12) — spark-submit
  * plus warehouse checkpoints replace them.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args.toList)
    val builder = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // spark-submit injects the master; direct JVM launches fall back to
    // local with all cores (reference CLI is single-machine too)
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    try {
      if (opts.contains("search")) runSearch(spark, opts)
      else runConfig(spark, opts("config"))
    } finally spark.stop()
  }

  private def runConfig(spark: SparkSession, path: String): Unit = {
    val cfg = JobConfig.parseFile(path)
    cfg.mode match {
      case "clustering" =>
        val src = Sources.read(spark, cfg.source1.get)
        val cc = cfg.clusterConfig
        // id column: first column if no 'id'; cluster over configured
        // columns' concatenation (reference clusters on per-column
        // similarity; the dedup path uses the text concatenation)
        val idCol = src.columns.find(_.toLowerCase == "id").getOrElse(src.columns.head)
        val clusterCols: Seq[org.apache.spark.sql.Column] =
          if (cc.columns.nonEmpty) cc.columns.map(c => col(c.source1))
          else src.columns.filterNot(_ == idCol).toSeq.map(col)
        val textCol = concat_ws(" ", clusterCols: _*)
        val withText = src.withColumn("_cluster_text", textCol)
        val out = Dedup.nearDupClusters(withText, idCol, "_cluster_text",
          DedupConfig(threshold = cc.threshold, exactVerify = true))
          .drop("_cluster_text")
        Sources.write(out, cfg.output)
        if (cc.generateSummary)
          Sources.write(Sources.clusterSummary(out),
            cfg.output.copy(path = cfg.output.path.map(_ + "_summary")))

      case _ => // matching
        val s1 = Sources.read(spark, cfg.source1.get)
        val s2 = Sources.read(spark, cfg.source2.get)
        val mc = cfg.matchConfig
        val mapping = ColumnAnalyzer.analyzeColumns(s1, s2,
          mc.columns.map(c => (c.source1, c.source2.getOrElse(c.source1), c.weight)))
        val id1 = s1.columns.head
        val id2 = s2.columns.head
        val out = Matching.matchTables(s1, s2, id1, id2, mapping,
          MatchOptions(mc.threshold, mc.undecidedRange, mc.blockingStrategies,
            mc.returnAllMatches))
        Sources.write(out, cfg.output)
    }
  }

  private def runSearch(spark: SparkSession, opts: Map[String, String]): Unit = {
    val master = Sources.read(spark, graft.config.SourceSpec(path = Some(opts("master"))))
    val query: Map[String, String] = {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(opts("query"))
      import scala.jdk.CollectionConverters._
      node.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }
    val mappings = ColumnAnalyzer.autoDetectQueryMappings(
      query.keys.toSeq, master.columns.toSeq)
    val fields = mappings.toSeq.sortBy(_._1).map { case (qk, mcol) =>
      Matching.SearchField(mcol, query(qk),
        ColumnAnalyzer.detectColumnType(master, mcol), 1.0)
    }
    val hits = Matching.search(master, master.columns.head, fields,
      opts.getOrElse("threshold", "0.5").toDouble,
      opts.getOrElse("max-results", "10").toInt)
    hits.show(100, truncate = false)
    opts.get("output").foreach(p =>
      Sources.write(hits, graft.config.SourceSpec(path = Some(p))))
  }

  private def parseArgs(args: List[String]): Map[String, String] = {
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] = rest match {
      case Nil => acc
      case "--search" :: t => loop(t, acc + ("search" -> "true"))
      case k :: v :: t if k.startsWith("--") => loop(t, acc + (k.stripPrefix("--") -> v))
      case other :: _ => throw new IllegalArgumentException(s"unexpected argument: $other")
    }
    val m = loop(args, Map.empty)
    require(m.contains("config") || m.contains("search"),
      "usage: graft.Main --config cfg.json | --search --master PATH --query JSON")
    m
  }
}
