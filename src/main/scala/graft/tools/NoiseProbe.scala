package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup._
object NoiseProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("4").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores,4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig(candidateMode = "star")
    val path = "/tmp/graft_scale_corpus_16"
    Dedup.nearDupClusters(spark.read.parquet(path).limit(5000), "doc_id", "text", cfg).count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      Dedup.nearDupClusters(spark.read.parquet(path), "doc_id", "text", cfg).count()
      println(f"[noise] cores=$cores run$i t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
