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

  test("--c4-filter --gopher-filter --line-dedup compose before dedup through the arg path") {
    import spark.implicits.{StringToColumn => _, _}
    val dir = Files.createTempDirectory("pipeq")
    val boiler = "Subscribe to our newsletter for updates and offers every single day."
    val nav = "home | about | contact" // C4: no terminal punctuation -> dropped
    def good(i: Int) =
      s"The quick brown fox number brave$i jumps over the lazy dog today.\n" +
        s"$nav\n$boiler\n" +
        s"The weather report for region zone$i shows that the sunshine will continue."
    // passes C4 (3 sentences, >= 5 words/line) but has ZERO Gopher stop
    // words -> dropped by the gopher pass specifically
    val junk = "Zxqv bnmt plkj qwer asdf. Zxqv bnmt plkj qwer asdf. Zxqv bnmt plkj qwer asdf."
    val pages = ((0 until 20).map(i => (i.toLong, s"https://q.example.org/p$i", good(i))) :+
      ((99L, "https://q.example.org/junk", junk))).toDF("page_id", "url", "text")
    val inPath = s"$dir/pages.parquet"
    pages.write.parquet(inPath)
    val wh = s"$dir/wh"
    val outPath = s"$dir/clusters.parquet"
    val qualityOpts = Map("input" -> inPath, "warehouse" -> wh, "threshold" -> "0.8",
      "c4-filter" -> "true", "gopher-filter" -> "true", "gopher-min-words" -> "5",
      "line-dedup" -> "true")

    val (out1, _) = sink()
    PipelineMain.run(spark, qualityOpts + ("output" -> outPath), out1)
    // the gopher-junk page never reaches the cluster table; good pages do
    val clusters = spark.read.parquet(outPath)
    assert(clusters.count() == 20)
    assert(clusters.where(col("page_id") === 99L).count() == 0)

    // the committed quality stage holds the composed pass's output:
    // nav line gone everywhere (C4), boilerplate line surviving exactly
    // once corpus-wide (line dedup), junk page judged and dropped (gopher)
    val q = new io.Warehouse(wh, spark).read("quality")
    assert(q.count() == 20)
    assert(q.where(col("text").contains("home | about")).count() == 0)
    assert(q.where(col("text").contains("Subscribe to our newsletter")).count() == 1)

    // resumable like every stage: identical args rebuild nothing
    val (out2, bos2) = sink()
    PipelineMain.run(spark, qualityOpts, out2)
    assert(bos2.toString("UTF-8").contains("0 stages built"))
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
