package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.dedup.{Dedup, DedupConfig}

/** Dev probe: per-Spark-job wall breakdown of the bench dedup pipeline
  * — where the serial tail (stage barriers, CC rounds) actually goes.
  * runMain graft.tools.TailProbe [cores] [corpusPath]
  */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val path = if (args.length > 1) args(1) else "/tmp/graft_scale_corpus_16"
    val aqe = sys.env.getOrElse("TAIL_PROBE_AQE", "true")
    val sp = sys.env.getOrElse("TAIL_PROBE_SHUFFLE", math.max(cores, 4).toString)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", sp)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig(candidateMode = "star")

    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, String)]
    @volatile var t0 = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val last = j.stageInfos.maxByOption(_.stageId)
        val name = last.map(s => s"${s.name.takeWhile(_ != '\n')} tasks=${s.numTasks}")
          .getOrElse("?")
        starts(j.jobId) = (j.time, name)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (s, name) =>
          rows.synchronized { rows += ((j.jobId, (s - t0) / 1e3, (j.time - s) / 1e3, name)) }
        }
    })

    // the bench's exact job shape (Bench.dedupJob): committed
    // cluster-table contract, no text join back
    def job(df: org.apache.spark.sql.DataFrame): Long = {
      val st = Dedup.clusterState(df, "doc_id", "text", cfg)
      val n = Dedup.stateClusters(st).count()
      st.release()
      n
    }
    // warmup
    job(spark.read.parquet(path).limit(100000))
    Thread.sleep(500)
    rows.clear()
    t0 = System.currentTimeMillis()
    val wall0 = System.nanoTime()
    job(spark.read.parquet(path))
    val wall = (System.nanoTime() - wall0) / 1e9
    Thread.sleep(500)
    val jobs = rows.sortBy(_._1)
    println(f"[tail-probe] cores=$cores wall=$wall%.2f jobs=${jobs.size} jobSum=${jobs.map(_._3).sum}%.2f")
    jobs.foreach { case (id, rel, d, name) =>
      println(f"[tail-probe]   job $id%3d start=$rel%7.2f dur=$d%7.2f  $name%s")
    }
    // gaps between consecutive jobs = driver-side serial time
    val gaps = jobs.zip(jobs.drop(1)).map { case ((_, s1, d1, _), (i2, s2, _, _)) =>
      (i2, s2 - (s1 + d1))
    }.filter(_._2 > 0.2)
    gaps.foreach { case (before, g) => println(f"[tail-probe]   gap before job $before%3d: $g%6.2f s") }
    spark.stop()
  }
}
