package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup._
object ScaleProbe {
  def session(cores: Int) = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  def corpus(spark: SparkSession, groups: Int, reps: Int) = {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val parts = for (g <- 0 until groups; r <- 0 until reps) yield {
      val remapped = if (g == 0) col("text")
        else array_join(transform(split(col("text"), " "), t => concat(t, lit(s"g$g"))), " ")
      val t = if (r == 0) remapped else concat(remapped, lit(s" wq${r}zr"))
      docs.select((col("doc_id") + (g.toLong*reps + r) * 10000000L).as("doc_id"), t.as("text"))
    }
    parts.reduce(_ unionAll _).repartition(64)
  }
  def main(args: Array[String]): Unit = {
    val groups = args.headOption.map(_.toInt).getOrElse(16)
    val cores = args.drop(1).map(_.toInt).toSeq match { case Nil => Seq(1, 4); case cs => cs }
    val cfg = DedupConfig(candidateMode = "star")
    val path = s"/tmp/graft_scale_corpus_$groups"
    var spark = session(32)
    if (!new java.io.File(path + "/_SUCCESS").exists())
      corpus(spark, groups, 8).write.mode("overwrite").parquet(path)
    val n = spark.read.parquet(path).count()
    Dedup.nearDupClusters(spark.read.parquet(path).limit(2000), "doc_id", "text", cfg).count()
    spark.stop()
    for (c <- cores) {
      spark = session(c)
      Dedup.nearDupClusters(spark.read.parquet(path).limit(5000), "doc_id", "text", cfg).count()
      val t0 = System.nanoTime()
      Dedup.nearDupClusters(spark.read.parquet(path), "doc_id", "text", cfg).count()
      val t = (System.nanoTime()-t0)/1e9
      println(f"[scale] cores=$c docs=$n t=$t%.2f thr=${n/t}%.0f")
      spark.stop()
    }
  }
}
