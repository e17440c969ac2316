package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.dedup.{Dedup, DedupConfig}
import graft.norm.Normalizers

/** Dev probe: isolates each stage of the bench dedup pipeline with a
  * noop sink (guide §1.4) — collapse, signatures, banding, star join +
  * distinct, verify — and A/Bs alternative verify shapes for identical
  * results + wall time.
  * runMain graft.tools.DedupStageProbe [cores] [corpusPath]
  */
object DedupStageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val path = if (args.length > 1) args(1) else "/tmp/graft_bench_corpus"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, math.min(4 * cores, 32)).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig(candidateMode = "star")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = graft.CacheHygiene.described(spark, tag)(f)
      println(f"[stage-probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val df = spark.read.parquet(path)
    // warmup: full pipeline at 100k docs
    locally {
      val st = Dedup.clusterState(df.limit(100000), "doc_id", "text", cfg)
      Dedup.stateClusters(st).count(); st.release()
    }

    // ---- collapse + signature stages, replicated from collapseAndSign
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val norm = Dedup.ensureParallel(df.select(col("doc_id").cast("long").as("id"),
        Normalizers.normalizeString(col("text")).as("_t")))
      .withColumn("_h1", xxhash64(col("_t")))
      .withColumn("_h2", xxhash64(col("_t"), lit(1)))
      .persist(lvl)
    time("collapse: norm persist")(norm.count())
    val grouped = norm.groupBy(col("_h1"), col("_h2"))
      .agg(min(col("id")).as("rep"), first(col("_t")).as("_t"))
      .persist(lvl)
    time("collapse: grouped persist")(grouped.count())
    val exactEdges = norm
      .join(grouped.select(col("_h1"), col("_h2"), col("rep")), Seq("_h1", "_h2"))
      .where(col("id") =!= col("rep"))
      .select(col("rep").as("u"), col("id").as("v"))
    time("collapse: exact edges")(noop(exactEdges))
    val reps = grouped.select(col("rep").as("id"), col("_t").as("text"))
    val sigs = Dedup.signatures(reps, "id", "text", cfg).persist(lvl)
    time("signatures persist")(sigs.count())

    // ---- banding / candidates
    val r = cfg.rowsPerBand
    val bandArr = array((0 until cfg.bands).map(b =>
      xxhash64(slice(col("sig"), b * r + 1, r), lit(b))): _*)
    val bands = sigs.select(col("id"), posexplode(bandArr).as(Seq("band", "bh")))
    time("bands (noop)")(noop(bands))
    val mins = bands.groupBy(col("band"), col("bh")).agg(min(col("id")).as("id1"))
    time("mins agg (noop)")(noop(mins))
    val starEdges = bands.join(mins, Seq("band", "bh"))
      .where(col("id") =!= col("id1"))
      .select(col("id1"), col("id").as("id2"))
    time("star join pre-distinct")(noop(starEdges))
    val cands = starEdges.distinct()
    time("star join + distinct")(noop(cands))

    // ---- verify shapes over the SAME persisted candidate table
    val candsP = cands.persist(lvl)
    val nCands = time("cands persist+count")(candsP.count())
    println(s"[stage-probe] candidates = $nCands")

    val narrow = sigs.select(col("id"), col("sig"))
    // current shape: two joins
    val vCur = candsP
      .join(narrow.as("a"), candsP("id1") === col("a.id"))
      .join(narrow.as("b"), candsP("id2") === col("b.id"))
      .select(col("id1"), col("id2"), graft.functions.minhash_jaccard(
        col("a.sig"), col("b.sig")).as("sim"))
      .where(col("sim") >= cfg.threshold)
    for (i <- 1 to 2) time(s"verify 2-join (run $i)")(noop(vCur))

    // alt A: semi-pruned hub side (id1 side is the small star-hub set)
    val hubs = candsP.select(col("id1").as("id")).distinct()
    val hubSigs = narrow.join(broadcast(hubs), Seq("id"), "left_semi")
    val vHub = candsP
      .join(hubSigs.as("a"), candsP("id1") === col("a.id"))
      .join(narrow.as("b"), candsP("id2") === col("b.id"))
      .select(col("id1"), col("id2"), graft.functions.minhash_jaccard(
        col("a.sig"), col("b.sig")).as("sim"))
      .where(col("sim") >= cfg.threshold)
    for (i <- 1 to 2) time(s"verify hub-pruned (run $i)")(noop(vHub))

    // alt B: union + single shuffle groupBy assembling both sigs per pair
    val u = candsP.select(col("id1"), col("id2"), col("id1").as("id"), lit(0).as("_s"))
      .unionAll(candsP.select(col("id1"), col("id2"), col("id2").as("id"), lit(1).as("_s")))
    val vUni = u.join(narrow, Seq("id"))
      .groupBy(col("id1"), col("id2"))
      .agg(min_by(col("sig"), col("_s")).as("sa"), max_by(col("sig"), col("_s")).as("sb"))
      .select(col("id1"), col("id2"),
        graft.functions.minhash_jaccard(col("sa"), col("sb")).as("sim"))
      .where(col("sim") >= cfg.threshold)
    for (i <- 1 to 2) time(s"verify union-agg (run $i)")(noop(vUni))

    // result equivalence of the shapes (count + checksum)
    def sigOf(v: DataFrame): (Long, Long) = {
      val row = v.select(col("id1"), col("id2"), round(col("sim"), 9).as("s"))
        .agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(id1, id2, s))"), lit(0L))).head()
      (row.getLong(0), row.getLong(1))
    }
    println(s"[stage-probe] checksum cur=${sigOf(vCur)} hub=${sigOf(vHub)} uni=${sigOf(vUni)}")
    spark.stop()
  }
}
