package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The spark-submit pipeline surface: full run, resume, incremental
  * batch generation — all through the CLI argument path.
  */
class PipelineMainSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  
  private def sink(): (PrintStream, ByteArrayOutputStream) = {
    val bos = new ByteArrayOutputStream()
    (new PrintStream(bos, true, "UTF-8"), bos)
  }

  test("full run + resume + incremental batch through the spark-submit surface") {
    val dir = Files.createTempDirectory("pipe")
    val pages = fixtures.WebPages.fromDocuments(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val basePath = s"$dir/base.parquet"
    val batchPath = s"$dir/batch.parquet"
    pages.where(col("page_id") % 2 === 0).write.parquet(basePath)
    pages.where(col("page_id") % 2 =!= 0).write.parquet(batchPath)
    val wh = s"$dir/wh"
    val outPath = s"$dir/clusters.parquet"

    // full run over the base half
    val (out1, bos1) = sink()
    PipelineMain.run(spark,
      Map("input" -> basePath, "warehouse" -> wh, "output" -> outPath,
        "threshold" -> "0.8"), out1)
    assert(bos1.toString("UTF-8").contains("6 stages built"))
    val nBase = spark.read.parquet(outPath).count()
    assert(nBase == pages.where(col("page_id") % 2 === 0).count())

    // resume: nothing rebuilds
    val (out2, bos2) = sink()
    PipelineMain.run(spark,
      Map("input" -> basePath, "warehouse" -> wh), out2)
    assert(bos2.toString("UTF-8").contains("0 stages built"))

    // incremental generation 1 over the odd half
    val (out3, bos3) = sink()
    PipelineMain.run(spark,
      Map("batch" -> batchPath, "gen" -> "1", "warehouse" -> wh,
        "output" -> s"$dir/g1.parquet", "threshold" -> "0.8"), out3)
    assert(bos3.toString("UTF-8").contains(s"pipeline done: ${pages.count()} pages"))
    val g1 = spark.read.parquet(s"$dir/g1.parquet")
    assert(g1.count() == pages.count(), "generation table covers base + batch")
    assert(g1.columns.toSet == Set("page_id", "url", "cluster_id", "cluster_size", "bucket"))
  }

  test("--frontier drops re-crawled urls before the batch merge") {
    val dir = Files.createTempDirectory("pipefr")
    val pages = fixtures.WebPages.fromDocuments(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val basePath = s"$dir/base.parquet"
    val batchPath = s"$dir/batch.parquet"
    val base = pages.where(col("page_id") % 2 === 0)
    base.write.parquet(basePath)
    // batch = genuinely new odd pages + RE-CRAWLS of base pages (same
    // url, shifted page_id — without the frontier these would inflate
    // the merge; with it they never reach the signature stage)
    val fresh = pages.where(col("page_id") % 2 =!= 0)
    val recrawl = base.limit(20).withColumn("page_id", col("page_id") + 10000000L)
    fresh.unionByName(recrawl).write.parquet(batchPath)
    val wh = s"$dir/wh"
    val (out1, _) = sink()
    PipelineMain.run(spark,
      Map("input" -> basePath, "warehouse" -> wh, "threshold" -> "0.8"), out1)

    val (out2, bos2) = sink()
    PipelineMain.run(spark,
      Map("batch" -> batchPath, "gen" -> "1", "frontier" -> "true",
        "warehouse" -> wh, "output" -> s"$dir/g1.parquet", "threshold" -> "0.8"), out2)
    assert(bos2.toString("UTF-8").contains(s"pipeline done: ${pages.count()} pages"),
      s"re-crawled urls must not enter the merge:\n${bos2.toString("UTF-8")}")
    val g1 = spark.read.parquet(s"$dir/g1.parquet")
    assert(g1.count() == pages.count())
    assert(g1.where(col("page_id") >= 10000000L).count() == 0,
      "no re-crawled page_id may survive the frontier")

    // the bloom artifact is committed once and resumed on the next batch
    val (out3, bos3) = sink()
    PipelineMain.run(spark,
      Map("batch" -> batchPath, "gen" -> "1", "frontier" -> "true",
        "warehouse" -> wh, "threshold" -> "0.8"), out3)
    assert(bos3.toString("UTF-8").contains("0 stages built"))
  }
}
