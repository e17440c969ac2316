package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.config.SourceSpec
import graft.io.Sources

/** JDBC source/sink round-trip against embedded Derby (the sandbox's
  * stand-in for the reference's MySQL path, data_loader.py:174-214) —
  * exercises the real Spark JDBC read/write code, including the
  * partitioned read with auto-derived bounds.
  */
class SourcesSpec extends AnyFunSuite {

  private lazy val dbDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-derby")
    System.setProperty("derby.system.home", d.toString)
    d
  }
  private def spec(extra: SourceSpec => SourceSpec = identity): SourceSpec =
    extra(SourceSpec(
      table = Some("people"),
      url = Some(s"jdbc:derby:$dbDir/db;create=true"),
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver")))

  test("JDBC write + read round-trip (embedded Derby)") {
    val spark = SparkTestBase.spark
    val df = spark.range(100).select($"id",
      concat(lit("name"), $"id").as("name"), ($"id" % 7).cast("double").as("score"))
    Sources.write(df, spec())
    val back = Sources.read(spark, spec())
    assert(back.count() == 100)
    assert(back.orderBy($"id").collect().toSeq ==
      df.orderBy($"id").collect().toSeq)
  }

  test("partitioned JDBC read splits the scan and auto-derives bounds") {
    val spark = SparkTestBase.spark
    val s = spec(_.copy(partitionColumn = Some("id"), numPartitions = Some(4)))
    val back = Sources.read(spark, s)
    assert(back.rdd.getNumPartitions == 4,
      "partitionColumn + numPartitions must produce a 4-way partitioned scan")
    assert(back.select(sum($"id")).head().getLong(0) == (0L until 100L).sum)
    // explicit bounds are honored as-is (no min/max probe query)
    val s2 = spec(_.copy(partitionColumn = Some("id"), numPartitions = Some(2),
      lowerBound = Some(0L), upperBound = Some(100L)))
    assert(Sources.read(spark, s2).count() == 100)
  }

  test("config JSON parses JDBC partitioned-read fields") {
    val cfg = graft.config.JobConfig.parse(
      """{"mode": "clustering",
        | "source1": {"table": "people", "url": "jdbc:derby:memory:x",
        |   "driver": "d", "partition_column": "id", "num_partitions": 8,
        |   "lower_bound": 5, "upper_bound": 50},
        | "output": "/tmp/out.parquet",
        | "cluster_config": {"columns": [{"source1": "name"}]}}""".stripMargin)
    val s = cfg.source1.get
    assert(s.partitionColumn.contains("id") && s.numPartitions.contains(8) &&
      s.lowerBound.contains(5L) && s.upperBound.contains(50L) &&
      s.url.contains("jdbc:derby:memory:x") && s.driver.contains("d"))
  }
}
