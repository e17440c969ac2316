package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.SourceSpec
import graft.norm.Normalizers

/** Source/sink dispatch on SourceSpec (reference
  * /root/reference/src/data_loader.py:17-46 and output_writer.py):
  * path extension routes csv/parquet/json; `s3://` rewrites to `s3a://`
  * (native read — no temp-file download); a `table` spec routes to the
  * JDBC reader/writer (round-trip tested against embedded Derby in
  * SourcesSpec) with partitioned reads on `partition_column` — the
  * distributed form of the reference's chunked MySQL read
  * (data_loader.py:174-214). The reference's >500 MB chunked CSV read
  * is free here — a partitioned scan.
  */
object Sources {

  def read(spark: SparkSession, spec: SourceSpec): DataFrame = spec match {
    case s if s.path.isDefined && !s.isJdbc => readPath(spark, s.path.get)
    case s if s.isJdbc =>
      val base = jdbcOptions(spark.read.format("jdbc"), s)
        .option("dbtable", s.table.get)
      s.partitionColumn match {
        case Some(col) =>
          val n = s.numPartitions.getOrElse(spark.sparkContext.defaultParallelism)
          // bounds auto-derived with ONE min/max pushdown query when not
          // configured — the distributed analogue of the reference's
          // chunked read (data_loader.py:193-197), which also needs no
          // caller-supplied bounds
          val (lo, hi) = (s.lowerBound, s.upperBound) match {
            case (Some(l), Some(u)) => (l, u)
            case _ =>
              // quote per-dialect: Spark's JDBC writer creates quoted
              // (case-sensitive) column names
              val q = org.apache.spark.sql.jdbc.JdbcDialects
                .get(s.jdbcUrl.getOrElse("")).quoteIdentifier(col)
              val row = jdbcOptions(spark.read.format("jdbc"), s)
                .option("dbtable",
                  s"(SELECT min($q) AS lo, max($q) AS hi FROM ${s.table.get}) b")
                .load().head()
              (row.get(0).toString.toDouble.toLong, row.get(1).toString.toDouble.toLong)
          }
          base.option("partitionColumn", col)
            .option("numPartitions", n)
            .option("lowerBound", lo)
            .option("upperBound", hi)
            .load()
        case None => base.load()
      }
    case other => throw new IllegalArgumentException(s"unreadable source spec: $other")
  }

  private def jdbcOptions(r0: org.apache.spark.sql.DataFrameReader, s: SourceSpec) = {
    var r = r0
    s.jdbcUrl.foreach(u => r = r.option("url", u))
    s.driver.foreach(d => r = r.option("driver", d))
    for { u <- s.user; p <- s.password } r = r.option("user", u).option("password", p)
    r
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
    case s if s.path.isDefined && !s.isJdbc =>
      val path0 = s.path.get
      val path = if (path0.startsWith("s3://")) "s3a://" + path0.stripPrefix("s3://") else path0
      val lower = path.toLowerCase
      if (lower.endsWith(".csv"))
        df.write.mode("overwrite").option("header", "true").csv(path)
      else if (lower.endsWith(".json") || lower.endsWith(".jsonl"))
        df.write.mode("overwrite").json(path)
      else df.write.mode("overwrite").parquet(path)
    case s if s.isJdbc =>
      var w = df.write.format("jdbc").mode("overwrite").option("dbtable", s.table.get)
      s.jdbcUrl.foreach(u => w = w.option("url", u))
      s.driver.foreach(d => w = w.option("driver", d))
      for { u <- s.user; p <- s.password } w = w.option("user", u).option("password", p)
      // parallel insert connections (sink-side analogue of chunking)
      s.numPartitions.foreach(n => w = w.option("numPartitions", n))
      w.save()
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
