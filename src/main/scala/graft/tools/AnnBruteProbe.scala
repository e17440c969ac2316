package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: attributes the brute-force ANN row's wall between the
  * broadcast nested-loop scoring join and the top-k window, with a
  * noop sink per stage (guide §1.4).
  * runMain graft.tools.AnnBruteProbe [groups]
  */
object AnnBruteProbe {
  def main(args: Array[String]): Unit = {
    val groups = args.headOption.map(_.toInt).getOrElse(128)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = s"/tmp/graft_ann_corpus_$groups"
    val n =
      if (new java.io.File(s"$path/_SUCCESS").exists())
        spark.read.parquet(path).count()
      else graft.Bench.buildEmbCorpus(spark, "/root/testdata/sf0.1", groups, path)
    val emb = spark.read.parquet(path)
    val annQ = graft.Bench.annQueries(emb)
    println(s"[ann-brute] corpus=$n queries=${annQ.count()}")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ann-brute] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // replicate bruteForceTopK's stages
    val q = annQ.select(col("vec_id").cast("long").as("query_id"), col("embedding").as("_qv"))
      .withColumn("_qn", graft.emb.Embeddings.l2norm(col("_qv")))
    val c = emb.select(col("vec_id").cast("long").as("neighbor_id"), col("embedding").as("_cv"))
      .withColumn("_cn", graft.emb.Embeddings.l2norm(col("_cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        when(col("_qn") * col("_cn") === 0.0, 0.0)
          .otherwise(graft.emb.Embeddings.dot(col("_qv"), col("_cv")) /
            (col("_qn") * col("_cn"))).as("sim"))
    // warmup
    noop(scored.limit(1000000))
    for (i <- 1 to 2) time(s"scored only (BNLJ + dot, run $i)")(noop(scored))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    val full = scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
    for (i <- 1 to 2) time(s"scored + window top-5 (run $i)")(noop(full))
    // library entry for reference
    for (i <- 1 to 2) time(s"bruteForceTopK count (run $i)")(
      graft.emb.Embeddings.bruteForceTopK(emb, annQ, "vec_id", "embedding", 5).count())
    spark.stop()
  }
}
