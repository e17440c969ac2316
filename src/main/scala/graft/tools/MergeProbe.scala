package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, DedupConfig}

/** Dev probe: per-Spark-job wall breakdown of the incremental merge
  * (Dedup.addBatch) on the bench corpus — where the merge's time goes
  * relative to the full recompute.
  * runMain graft.tools.MergeProbe [cores] [corpusPath]
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val path = if (args.length > 1) args(1) else "/tmp/graft_bench_corpus"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig(candidateMode = "star")
    import spark.implicits._

    val corpus = spark.read.parquet(path)
    val replicaIdx = pmod((corpus("doc_id") / 10000000L).cast("long"), lit(8))
    val baseDocs = corpus.where(replicaIdx =!= 7)
    val batchDocs = corpus.where(replicaIdx === 7)
    val baseState = Dedup.clusterState(baseDocs, "doc_id", "text", cfg)
    baseState.assignments.count()

    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, String)]
    @volatile var t0 = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // per-stage callsites: the graft/Dedup frames in each stage's
        // details tell WHICH operator subtree this AQE stage job runs
        val name = j.stageInfos.sortBy(_.stageId).map { s =>
          val site = s.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("MergeProbe"))
            .getOrElse(s.name.takeWhile(_ != '\n'))
          s"[${s.stageId}:${s.numTasks}t ${site.trim.take(60)}]"
        }.mkString(" ")
        starts(j.jobId) = (j.time, name)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (s, name) =>
          rows.synchronized { rows += ((j.jobId, (s - t0) / 1e3, (j.time - s) / 1e3, name)) }
        }
    })

    t0 = System.currentTimeMillis()
    val wall0 = System.nanoTime()
    val ms = Dedup.addBatch(baseState, batchDocs, "doc_id", "text", cfg)
    val tCall = (System.nanoTime() - wall0) / 1e9
    ms.assignments.count()
    val wall = (System.nanoTime() - wall0) / 1e9
    println(f"[merge-probe] addBatch-call=$tCall%.2f assignments-count=${wall - tCall}%.2f")
    Thread.sleep(500)
    val jobs = rows.sortBy(_._1)
    println(f"[merge-probe] cores=$cores wall=$wall%.2f jobs=${jobs.size} jobSum=${jobs.map(_._3).sum}%.2f")
    jobs.foreach { case (id, rel, d, name) =>
      if (d > 0.5) println(f"[merge-probe]   job $id%3d start=$rel%7.2f dur=$d%7.2f  $name%s")
    }
    ms.release(); baseState.release()
    spark.stop()
  }
}
