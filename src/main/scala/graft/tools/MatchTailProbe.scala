package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.matching.{MatchColumn, MatchOptions, Matching}

/** Dev probe: per-Spark-job wall breakdown of the fully-scored
  * 10k x 10k match (Bench's `match_scored_10kx10k` row) — where the
  * candidate join, scoring, and best-match window actually spend time.
  * runMain graft.tools.MatchTailProbe [cores] [n]
  */
object MatchTailProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val n = args.drop(1).headOption.getOrElse("10000").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val firsts = Seq("james", "mary", "robert", "patricia", "john", "jennifer", "michael",
      "linda", "david", "elizabeth", "william", "barbara", "richard", "susan", "joseph",
      "jessica", "thomas", "sarah", "charles", "karen", "chris", "nancy", "daniel", "lisa",
      "matthew", "betty", "anthony", "margaret", "mark", "sandra")
    val lasts = Seq("smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
      "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez", "wilson",
      "anderson", "thomas", "taylor", "moore", "jackson", "martin", "lee", "perez",
      "thompson", "white", "harris", "sanchez", "clark", "ramirez", "lewis", "robinson")
    def fixture(salt: Int) = {
      val f = element_at(typedLit(firsts), (pmod(xxhash64(col("id"), lit(salt)), lit(30)) + 1).cast("int"))
      val l = element_at(typedLit(lasts), (pmod(xxhash64(col("id"), lit(salt + 1)), lit(30)) + 1).cast("int"))
      spark.range(n.toLong).select(col("id"),
        concat(f, lit(" "), l).as("name"),
        concat(f, lit("."), l, lit("@example.com")).as("email"),
        lpad(pmod(xxhash64(col("id"), lit(salt + 2)), lit(10000000000L)).cast("string"), 10, "0").as("phone"))
    }
    val s1 = fixture(1).withColumnRenamed("id", "id1")
    val s2 = fixture(1).select(col("id").as("id2"), col("name").as("name2"),
      col("email").as("email2"), col("phone").as("phone2"))
    val mapping = Seq(
      MatchColumn("name", "name2", "string_name", 0.4),
      MatchColumn("email", "email2", "email", 0.3),
      MatchColumn("phone", "phone2", "phone", 0.3))
    val opts = MatchOptions(threshold = 0.85, undecidedRange = 0.05,
      blockingStrategies = Seq("first_char", "three_gram"), earlyTermination = false)

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

    def job(): Long = Matching.matchTables(s1, s2, "id1", "id2", mapping, opts).count()
    // warmup at a tenth
    Matching.matchTables(s1.limit(n / 10), s2.limit(n / 10), "id1", "id2", mapping, opts).count()
    Thread.sleep(500)
    rows.clear()
    t0 = System.currentTimeMillis()
    val wall0 = System.nanoTime()
    val c = job()
    val wall = (System.nanoTime() - wall0) / 1e9
    Thread.sleep(500)
    val jobs = rows.sortBy(_._1)
    println(f"[match-tail] cores=$cores n=$n rows=$c wall=$wall%.2f jobs=${jobs.size} jobSum=${jobs.map(_._3).sum}%.2f")
    jobs.foreach { case (id, rel, d, name) =>
      println(f"[match-tail]   job $id%3d start=$rel%7.2f dur=$d%7.2f  $name%s")
    }
    val gaps = jobs.zip(jobs.drop(1)).map { case ((_, s1r, d1, _), (i2, s2r, _, _)) =>
      (i2, s2r - (s1r + d1))
    }.filter(_._2 > 0.2)
    gaps.foreach { case (before, g) => println(f"[match-tail]   gap before job $before%3d: $g%6.2f s") }
    spark.stop()
  }
}
