package graft.tools
import scala.jdk.CollectionConverters._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, DedupConfig}

/** Dev probe: per-Spark-job wall breakdown of the incremental merge
  * (Dedup.addBatch) on the bench corpus — where the merge's time goes
  * relative to the full recompute.
  * runMain graft.tools.MergeProbe [cores] [corpusPath] [denom]
  * denom picks the batch:corpus ratio exactly as Bench's merge series
  * does (8 = the whole held-out replica slice, 32/128 = subsampled by
  * base doc id); > 8 also builds the persisted band index on the base
  * state, the configuration the crossover claim rests on.
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val path = if (args.length > 1) args(1) else "/tmp/graft_bench_corpus"
    val denom = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig(candidateMode = "star")
    import spark.implicits._

    // optional 4th arg: union `mult-1` token-remapped copies onto the
    // corpus (cross-copy jaccard ~0, replica structure preserved) so
    // the base can be 2-4x the corpus without building a new parquet —
    // the batch:base regime a crawl pipeline actually lives in
    val mult = if (args.length > 3) args(3).toInt else 1
    val raw = spark.read.parquet(path)
    val corpus = (1 until mult).foldLeft(raw) { (acc, k) =>
      acc.unionAll(raw.select(
        (raw("doc_id") + k * 2560000000L).as("doc_id"),
        array_join(transform(split(raw("text"), " "), t => concat(t, lit(s"x$k"))), " ")
          .as("text")))
    }
    val baseId = corpus("doc_id") % 10000000L
    val replicaIdx = pmod((corpus("doc_id") / 10000000L).cast("long"), lit(8))
    val baseDocs = corpus.where(replicaIdx =!= 7)
    val batchDocs = raw.where(
      pmod((raw("doc_id") / 10000000L).cast("long"), lit(8)) === 7 &&
      raw("doc_id") % 10000000L % (denom / 8) === 0)
    val baseState = Dedup.withBandIndex(
      Dedup.clusterState(baseDocs, "doc_id", "text", cfg))
    baseState.assignments.count()
    println(s"[merge-probe] denom=$denom batch=${batchDocs.count()} docs")

    // per-JOB wall + call site: each eager action inside addBatch
    // (sigs.count, cross.count, newEdges.count, CC rounds, the final
    // assignments count) surfaces as one or more jobs; the call site
    // names the Dedup.scala line that triggered it
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, String)]
    val jobStartTs = scala.collection.mutable.Map.empty[Int, (Long, String)]
    @volatile var tj0 = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val p = Option(e.properties)
        val site = p.flatMap(q => Option(q.getProperty("spark.job.description")))
          .orElse(p.flatMap(q => Option(q.getProperty("callSite.short"))))
          .orElse(p.flatMap(q => Option(q.getProperty("spark.sql.execution.root.id")).map("root=" + _)))
          .getOrElse("?") +
          p.flatMap(q => Option(q.getProperty("spark.sql.execution.root.id")).map(" root=" + _)).getOrElse("") +
          " rdd=" + e.stageInfos.lastOption.map(_.name.take(60)).getOrElse("")
        jobStartTs.synchronized { jobStartTs(e.jobId) = (e.time, site); () }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        jobStartTs.synchronized {
          jobStartTs.remove(e.jobId).foreach { case (t, site) =>
            jobs += ((e.jobId, (t - tj0) / 1e3, (e.time - t) / 1e3, site)); ()
          }
        }
      }
    })

    // EXECUTED stages only (SparkListenerStageCompleted never fires for
    // skipped/reused stages), with per-stage task-time and scope names
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, String)]
    @volatile var t0 = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = e.stageInfo
        val scopes = s.rddInfos.flatMap(_.scope).map(_.name)
          .filterNot(_ == "mapPartitionsInternal").distinct.take(8).mkString(",")
        val dur = (s.completionTime.getOrElse(0L) - s.submissionTime.getOrElse(0L)) / 1e3
        val rel = (s.submissionTime.getOrElse(0L) - t0) / 1e3
        stages.synchronized {
          stages += ((s.stageId, rel, dur, s"${s.numTasks}t $scopes")); ()
        }
      }
    })

    t0 = System.currentTimeMillis()
    tj0 = t0
    val wall0 = System.nanoTime()
    val ms = Dedup.addBatch(baseState, batchDocs, "doc_id", "text", cfg)
    val tCall = (System.nanoTime() - wall0) / 1e9
    ms.assignments.count()
    val wall = (System.nanoTime() - wall0) / 1e9
    println(f"[merge-probe] addBatch-call=$tCall%.2f assignments-count=${wall - tCall}%.2f")
    // cache-hit probes: if these are slow, consumers were recomputing
    // the collapse instead of reading the persisted signature tables
    val newSigs = ms.retained.last
    val tProbe1 = { val t = System.nanoTime(); newSigs.count(); (System.nanoTime() - t) / 1e9 }
    val tProbe2 = { val t = System.nanoTime()
      newSigs.select($"id", $"sig").where($"sig".isNotNull).count()
      (System.nanoTime() - t) / 1e9 }
    val tProbe3 = { val t = System.nanoTime(); baseState.signatures.count(); (System.nanoTime() - t) / 1e9 }
    val tProbe4 = { val t = System.nanoTime()
      baseState.signatures.select($"id", $"sig").where($"sig".isNotNull).count()
      (System.nanoTime() - t) / 1e9 }
    println(f"[merge-probe] cacheProbe newSigs count=$tProbe1%.2f narrowSel=$tProbe2%.2f baseSigs count=$tProbe3%.2f narrowSel=$tProbe4%.2f")
    Thread.sleep(500)
    val ss = stages.sortBy(-_._3)
    println(f"[merge-probe] cores=$cores wall=$wall%.2f stages=${ss.size} stageSum=${ss.map(_._3).sum}%.2f")
    jobs.sortBy(_._2).foreach { case (id, rel, d, site) =>
      println(f"[merge-probe] job $id%3d start=$rel%7.2f dur=$d%6.2f  $site%s")
    }
    ss.take(15).foreach { case (id, rel, d, name) =>
      println(f"[merge-probe]   stage $id%3d start=$rel%7.2f dur=$d%7.2f  $name%s")
    }
    // full chronology (>=0.2 s) — attributes each job window's stages
    stages.sortBy(_._2).filter(_._3 >= 0.2).foreach { case (id, rel, d, name) =>
      println(f"[merge-probe]   chrono stage $id%3d start=$rel%7.2f dur=$d%7.2f  $name%s")
    }
    ms.release(); baseState.release()
    spark.stop()
  }
}
