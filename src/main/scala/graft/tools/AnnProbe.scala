package graft.tools
import org.apache.spark.sql.SparkSession

/** Measures brute-force vs persisted-IVF-probe ANN at a SCALED
  * embedding corpus — the data behind Bench's ann rows and the r5 fix
  * of the r4 "probe beats brute" claim (the driver falsified it at the
  * raw sf0.1 table, where both rows measure fixed overhead: 2k vectors
  * is no regime for an inverted file).
  *
  * Corpus construction and query-set selection are SHARED with the
  * bench (`Bench.buildEmbCorpus` / `Bench.annQueries`) so this probe
  * measures exactly the corpus the committed ann rows ran on. Usage:
  *   runMain graft.tools.AnnProbe [groups] [nlist] [nprobe]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val groups = args.headOption.map(_.toInt).getOrElse(128)
    val nlist = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val nprobe = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = s"/tmp/graft_ann_corpus_$groups"
    val n = graft.Bench.buildEmbCorpus(spark, "/root/testdata/sf0.1", groups, path)
    val emb = spark.read.parquet(path)
    val annQ = graft.Bench.annQueries(emb)
    val nQ = annQ.count()
    println(s"[ann] corpus=$n queries=$nQ nlist=$nlist nprobe=$nprobe")

    val wh = new graft.io.Warehouse(
      java.nio.file.Files.createTempDirectory("ann_probe").toString, spark)
    val tBuild = time {
      graft.emb.IvfIndex.build(wh, emb, "vec_id", "embedding", nlist = nlist, iters = 3)
    }
    println(f"[ann] ivf build (untimed in Bench): $tBuild%.2f s")

    def timed(label: String)(f: => Long): Double = {
      val warm = f // untimed warm pass (JIT + codegen), like Bench's min-of-2 first sample
      val ts = Seq.fill(2)(time(f))
      println(f"[ann] $label: ${ts.min}%.2f s (samples ${ts.map(t => f"$t%.2f").mkString(", ")}; rows $warm)")
      ts.min
    }
    val tb = timed("brute")(
      graft.emb.Embeddings.bruteForceTopK(emb, annQ, "vec_id", "embedding", 5).count())
    val tp = timed("ivf probe")(
      graft.emb.IvfIndex.probe(wh, annQ, "vec_id", "embedding", k = 5, nprobe = nprobe).count())
    println(f"[ann] ratio brute/probe = ${tb / tp}%.2fx")
    spark.stop()
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
}
