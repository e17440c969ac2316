package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.matching.{MatchColumn, MatchOptions, Matching}

/** Dev probe: times the reference-shaped 10k x 10k match (Bench's
  * fixture) under knob combinations — early termination on/off,
  * salting on/off — to attribute where the time goes.
  */
object MatchProbe {
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
    def run(tag: String, o: MatchOptions): Unit = {
      val t0 = System.nanoTime()
      val c = Matching.matchTables(s1, s2, "id1", "id2", mapping, o).count()
      println(f"[match-probe] cores=$cores n=$n $tag rows=$c t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val base = MatchOptions(threshold = 0.85, undecidedRange = 0.05,
      blockingStrategies = Seq("first_char", "three_gram"))
    // warm-up at a tenth of the size
    val cw = Matching.matchTables(s1.limit(n / 10), s2.limit(n / 10), "id1", "id2", mapping, base).count()
    println(s"[match-probe] warmup rows=$cw")
    run("et_salted", base)
    for (i <- 1 to 2) {
      run(s"noet_unsalted_$i", base.copy(earlyTermination = false, saltBuckets = 1))
      run(s"noet_salted_$i", base.copy(earlyTermination = false))
      run(s"noet_forcedsalt_$i", base.copy(earlyTermination = false, saltThreshold = 1024))
    }
    spark.stop()
  }
}
