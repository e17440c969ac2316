package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.SourceSpec
import graft.norm.Normalizers

/** Source/sink dispatch on SourceSpec (reference
  * /root/reference/src/data_loader.py:17-46 and output_writer.py):
  * path extension routes csv/parquet/json; `s3://` rewrites to `s3a://`
  * (native read — no temp-file download); a `table` spec routes to the
  * JDBC reader with partitioned-read options (interface kept; no
  * database ships in this sandbox). The reference's >500 MB chunked
  * CSV read is free here — a partitioned scan.
  */
object Sources {

  def read(spark: SparkSession, spec: SourceSpec): DataFrame = spec match {
    case SourceSpec(Some(path), None, _, _, _, _) => readPath(spark, path)
    case s if s.isJdbc =>
      val reader = spark.read.format("jdbc")
        .option("dbtable", s.table.get)
      val withUrl = s.host.map(h =>
        reader.option("url", s"jdbc:mysql://$h/${s.database.getOrElse("")}")).getOrElse(reader)
      val withAuth = (for { u <- s.user; p <- s.password } yield
        withUrl.option("user", u).option("password", p)).getOrElse(withUrl)
      withAuth.load()
    case other => throw new IllegalArgumentException(s"unreadable source spec: $other")
  }

  private def readPath(spark: SparkSession, path0: String): DataFrame = {
    val path = if (path0.startsWith("s3://")) "s3a://" + path0.stripPrefix("s3://") else path0
    val lower = path.toLowerCase
    if (lower.endsWith(".csv"))
      spark.read.option("header", "true").csv(path)
    else if (lower.endsWith(".json") || lower.endsWith(".jsonl"))
      spark.read.json(path)
    else
      spark.read.parquet(path)
  }

  /** Load-time normalization of every string column — the reference's
    * `_normalize_dataframe` (data_loader.py:216-227): lower, strip,
    * collapse whitespace, null -> "". Dictionary encoding
    * (data_loader.py:230-243) is free: Parquet/Tungsten.
    */
  def normalizeStrings(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        Normalizers.normalizeString(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  def write(df: DataFrame, spec: SourceSpec): Unit = spec match {
    case SourceSpec(Some(path0), None, _, _, _, _) =>
      val path = if (path0.startsWith("s3://")) "s3a://" + path0.stripPrefix("s3://") else path0
      val lower = path.toLowerCase
      if (lower.endsWith(".csv"))
        df.write.mode("overwrite").option("header", "true").csv(path)
      else if (lower.endsWith(".json") || lower.endsWith(".jsonl"))
        df.write.mode("overwrite").json(path)
      else df.write.mode("overwrite").parquet(path)
    case s if s.isJdbc =>
      df.write.format("jdbc").mode("overwrite").option("dbtable", s.table.get).save()
    case other => throw new IllegalArgumentException(s"unwritable sink spec: $other")
  }

  /** Cluster summary report (output_writer.py:286-343): totals,
    * singleton/multi counts, size histogram, top-10 largest clusters.
    */
  def clusterSummary(clusters: DataFrame): DataFrame = {
    val byCluster = clusters.select(col("cluster_id"), col("cluster_size")).distinct()
    val hist = byCluster.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(lit("hist").as("section"), col("cluster_size").cast("string").as("key"),
        col("n_clusters").cast("string").as("value"))
    val totals = byCluster.agg(
      count(lit(1)).as("clusters"),
      sum(col("cluster_size")).as("rows"),
      count(when(col("cluster_size") === 1, 1)).as("singletons"),
      count(when(col("cluster_size") > 1, 1)).as("multi"))
      .selectExpr("stack(4, 'clusters', cast(clusters as string), " +
        "'rows', cast(rows as string), 'singletons', cast(singletons as string), " +
        "'multi', cast(multi as string)) as (key, value)")
      .select(lit("totals").as("section"), col("key"), col("value"))
    val top = byCluster.orderBy(col("cluster_size").desc, col("cluster_id").asc).limit(10)
      .select(lit("top10").as("section"), col("cluster_id").cast("string").as("key"),
        col("cluster_size").cast("string").as("value"))
    totals.unionAll(hist).unionAll(top)
  }
}
