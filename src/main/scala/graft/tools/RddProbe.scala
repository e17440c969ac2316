package graft.tools
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: does `df.rdd` run Spark jobs under AQE (Spark 4.1), and
  * does the non-adaptive `sparkPlan.execute()` avoid them? Decides the
  * implementation of [[graft.dedup.Dedup.ensureParallel]]'s split probe.
  */
object RddProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    val df = spark.read.parquet("/tmp/graft_bench_corpus_scaling")
      .select(org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.col("text")).as("n"))
    Thread.sleep(300); jobs.set(0)
    val t0 = System.nanoTime()
    val n1 = df.rdd.getNumPartitions
    val t1 = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(s"[rdd-probe] df.rdd: partitions=$n1 jobs=${jobs.get} sec=$t1")
    jobs.set(0)
    val df2 = spark.read.parquet("/tmp/graft_bench_corpus_scaling")
      .select(org.apache.spark.sql.functions.upper(org.apache.spark.sql.functions.col("text")).as("t"))
    val s0 = System.nanoTime()
    val n2 = df2.queryExecution.sparkPlan.execute().getNumPartitions
    val s1 = (System.nanoTime() - s0) / 1e9
    Thread.sleep(300)
    println(s"[rdd-probe] sparkPlan.execute(): partitions=$n2 jobs=${jobs.get} sec=$s1")

    // collapseAndSign's exact shape: probe -> persist -> groupBy persist
    // -> 2nd probe inside a projection over the un-materialized caches
    // -> count. Which step submits the pre-count jobs seen in TailProbe?
    import org.apache.spark.sql.functions._
    jobs.set(0)
    val raw = spark.read.parquet("/tmp/graft_bench_corpus_scaling")
      .select(col("doc_id").cast("long").as("id"),
        graft.norm.Normalizers.normalizeString(col("text")).as("_t"))
    val probed = graft.dedup.Dedup.ensureParallel(raw)
    println(s"[rdd-probe] after ensureParallel#1: jobs=${jobs.get}")
    val norm = probed.withColumn("_h1", xxhash64(col("_t")))
      .withColumn("_h2", xxhash64(col("_t"), lit(1))).persist()
    val grouped = norm.groupBy(col("_h1"), col("_h2"))
      .agg(min(col("id")).as("rep"), first(col("_t")).as("_t")).persist()
    val reps = grouped.select(col("rep").as("id"), col("_t").as("text"))
    println(s"[rdd-probe] after plan building: jobs=${jobs.get}")
    val t2 = System.nanoTime()
    val reprobe = graft.dedup.Dedup.ensureParallel(reps)
    println(s"[rdd-probe] after ensureParallel#2: jobs=${jobs.get} sec=${(System.nanoTime() - t2) / 1e9}")
    val sigs = reprobe.select(col("id"), length(col("text")).as("n")).persist()
    val t3 = System.nanoTime()
    sigs.count()
    println(s"[rdd-probe] after count: jobs=${jobs.get} sec=${(System.nanoTime() - t3) / 1e9}")
    spark.stop()
  }
}
