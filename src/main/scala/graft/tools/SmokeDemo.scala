package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
import graft.dedup.{Dedup, DedupConfig}

/** End-to-end smoke: drives the public library surface on the driver
  * testdata (documents.parquet) — kernels via SQL registration and the
  * full near-dup clustering pipeline. `sbt "runMain graft.tools.SmokeDemo"`.
  */
object SmokeDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.functions.registerAll(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.createOrReplaceTempView("documents")

    println("== kernels via SQL ==")
    spark.sql(
      """SELECT jaro_winkler_sim('martha', 'marhta') AS jw,
        |       token_set_ratio('john smith', 'smith john') AS tsr,
        |       date_sim('2020-01-15', '01/15/2020') AS ds""".stripMargin).show()

    println("== near-dup clusters on documents ==")
    val clustered = Dedup.nearDupClusters(docs, "doc_id", "text", DedupConfig())
    clustered.select("doc_id", "cluster_id", "cluster_size")
      .orderBy(desc("cluster_size"), asc("cluster_id")).show(10)
    val summary = clustered.agg(
      count(lit(1)).as("docs"),
      countDistinct(col("cluster_id")).as("clusters"),
      sum(when(col("cluster_size") > 1, 1).otherwise(0)).as("docs_in_dup_groups"))
    summary.show()

    println("== plan of the signature stage ==")
    Dedup.signatures(docs, "doc_id", "text").explain("formatted")
    spark.stop()
  }
}
