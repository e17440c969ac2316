package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: time one SparkEntry query.
  * runMain graft.tools.QueryProbe <name> [sfDir] [cores] [reps]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cores = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[query-probe] $name cores=$cores run$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
