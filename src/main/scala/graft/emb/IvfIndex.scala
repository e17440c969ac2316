package graft.emb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft._

/** IVF (inverted-file) approximate nearest neighbors: a k-means coarse
  * quantizer splits the corpus into `nlist` cells; a query scores only
  * the cells of its `nprobe` nearest centroids and verifies exact
  * cosine inside them — the third ANN tier next to brute force (the
  * exact baseline) and RHP-LSH (`Embeddings.lshTopK`).
  *
  * Scale shape: training is standard Lloyd's — assignment is a
  * broadcast join against the (small) centroid table with a map-side
  * max_by, means are a posexplode + per-(cell, dim) partial-agg
  * average, so no stage materializes more than (rows x nlist) skinny
  * score rows and nothing but the nlist x dim centroid table ever
  * reaches the driver. Search touches nprobe/nlist of the corpus: at
  * rest the assigned table is written partitioned by cell id
  * (`Warehouse` partitionBy), so cell probes prune partitions on scan.
  *
  * Determinism: centroid INIT is content-derived (the nlist rows with
  * the smallest xxhash64(id, seed)) so identical input + config always
  * seeds identically. Mean aggregation is floating-point and
  * order-sensitive, so centroid values can wobble at the last ulp
  * between runs — cell BOUNDARIES are therefore not bit-pinned, but
  * planted-duplicate search results are (a query identical to a corpus
  * vector scores the same cells; verify is exact cosine).
  */
object IvfIndex {

  private def dvec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Train `nlist` centroids with `iters` Lloyd's iterations.
    *
    * Returns a DRIVER-LOCAL relation: the final nlist x dim centroid
    * table is collected (bounded driver state — the coarse quantizer is
    * small by design, exactly what single-node ANN libraries hold in
    * RAM) and re-created as a LocalRelation. Consequences: every
    * persisted training generation is freed before returning (no cached
    * blocks outlive the call — r2 ADVICE leak), downstream broadcast
    * joins ship the literal table with no recompute lineage, and the
    * result survives any number of actions.
    *
    * @return (cid, centroid) DataFrame, nlist rows of array<double>
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, seed: Long): DataFrame = {
    val spark = corpus.sparkSession
    val vecs = corpus.select(col(idCol).cast("long").as("id"), dvec(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // content-derived init: nlist sample rows by seeded hash order
    var centroids = vecs
      .orderBy(xxhash64($"id", lit(seed)).asc, $"id".asc).limit(nlist)
      .select((row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(xxhash64($"id", lit(seed)).asc, $"id".asc)) - 1).as("cid"), $"v".as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
      val assigned = assignCells(vecs, centroids)
      // element-wise mean per cell; cells that lost every member keep
      // their previous centroid (left join fallback)
      val means = assigned.join(vecs, "id")
        .select($"cid", posexplode($"v").as(Seq("pos", "x")))
        .groupBy($"cid", $"pos").agg(avg($"x").as("m"))
        .groupBy($"cid").agg(
          transform(array_sort(collect_list(struct($"pos", $"m"))), s => s("m")).as("cNew"))
      val next = centroids.join(means, Seq("cid"), "left")
        .select($"cid", coalesce($"cNew", $"c").as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before freeing the parent generation
      centroids.unpersist(blocking = false)
      centroids = next
    }
    val local = centroids.collect() // nlist rows — bounded by construction
    centroids.unpersist(blocking = false)
    vecs.unpersist(blocking = false)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(local.toSeq.asJava, centroids.schema)
  }

  /** Nearest-centroid (max cosine) cell per row: broadcast join +
    * max_by — ties break to the lowest cid deterministically.
    * Input must carry (id, v: array<double>).
    */
  private def assignCells(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .select($"id", $"cid", Embeddings.cosine($"v", $"c").as("sim"))
      .groupBy($"id").agg(max_by($"cid", struct($"sim", -$"cid")).as("cid"))

  /** (id, cid) assignment of a corpus under a trained centroid table. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    assignCells(
      corpus.select(col(idCol).cast("long").as("id"), dvec(col(vecCol)).as("v")),
      centroids)

  /** Top-k search against a (centroids, cells) index, where `cells`
    * carries (cid, neighbor_id, v: array<double>) — the shared probe
    * kernel of the inline and persisted paths. The cells side is
    * probed with a BROADCAST equi-join on cid: against a cid-
    * partitioned at-rest cells table, Spark's dynamic partition
    * pruning turns the probe into a scan of only the nprobe cells'
    * partitions (PlanSpec-asserted).
    */
  private def probeIndex(centroids: DataFrame, cells: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val qv = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("_qv"))
    // query -> its nprobe nearest cells
    val probes = qv.select($"query_id", dvec($"_qv").as("v"))
      .crossJoin(broadcast(centroids))
      .select($"query_id", $"cid", Embeddings.cosine($"v", $"c").as("csim"))
      .withColumn("_r", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"csim".desc, $"cid".asc)))
      .where($"_r" <= nprobe)
      .select($"query_id", $"cid")
    // candidates = probed cells' members; the cell vectors ride the
    // cells table, so verify needs no second corpus join. The query
    // vector casts to double to match the stored cell vectors — value-
    // identical to a float/float dot (float->double is exact and the
    // kernel accumulates in double either way).
    val scored = broadcast(probes.join(qv.select($"query_id", dvec($"_qv").as("_qv")), "query_id"))
      .join(cells, "cid")
      .where($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id", Embeddings.cosine($"_qv", $"v").as("sim"))
    Embeddings.topKPerQuery(scored, k)
  }

  /** Top-k neighbors per query, probing the `nprobe` nearest cells.
    * Inline variant: trains + assigns per call (small/ad-hoc corpora).
    * Real pipelines build the index ONCE with [[build]] and probe it
    * many times with [[probe]].
    * Output: (query_id, neighbor_id, sim, rank) like the other tiers.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
      seed: Long = 42L): DataFrame = {
    val centroids = train(corpus, idCol, vecCol, nlist, iters, seed)
    val vecs = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      dvec(col(vecCol)).as("v"))
    val cells = assign(corpus, idCol, vecCol, centroids)
      .withColumnRenamed("id", "neighbor_id")
      .join(vecs, "neighbor_id")
    probeIndex(centroids, cells, queries, idCol, vecCol, k, nprobe)
  }

  /** Build (or resume) the PERSISTED index in a warehouse: a
    * `<name>_centroids` table (nlist rows) and a `<name>_cells` table
    * (cid, neighbor_id, v) written PARTITIONED BY cid — the at-rest
    * layout that lets [[probe]] prune to the probed cells' partitions.
    * Committed via the same manifest/fingerprint protocol as every
    * pipeline stage: a killed build resumes, a changed corpus or
    * config rebuilds (fingerprint folds in the input snapshot).
    *
    * @param inputId caller-tracked input identity (e.g. an Iceberg
    *                snapshot id); derived by scanning when absent
    */
  def build(wh: graft.io.Warehouse, corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, iters: Int = 3, seed: Long = 42L,
      name: String = "ivf", inputId: Option[String] = None): Unit = {
    val fp = s"ivf_n${nlist}_i${iters}_s${seed}" +
      s"_in${inputId.getOrElse(graft.dedup.WebDedup.inputSnapshot(corpus))}"
    val centroids = wh.getOrCreate(s"${name}_centroids", fp) {
      train(corpus, idCol, vecCol, nlist, iters, seed)
    }
    wh.getOrCreate(s"${name}_cells", fp, parent = Some(s"${name}_centroids"),
        partitionBy = Seq("cid")) {
      val vecs = corpus.select(col(idCol).cast("long").as("neighbor_id"),
        dvec(col(vecCol)).as("v"))
      assign(corpus, idCol, vecCol, centroids)
        .withColumnRenamed("id", "neighbor_id")
        .join(vecs, "neighbor_id")
        .select($"cid", $"neighbor_id", $"v")
    }
    ()
  }

  /** Probe a persisted index built by [[build]]. The cells scan reads
    * only the probed cids' partitions (dynamic partition pruning over
    * the cid-partitioned table — the broadcast probe side supplies the
    * runtime cid set).
    */
  def probe(wh: graft.io.Warehouse, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int = 4, name: String = "ivf"): DataFrame =
    probeIndex(wh.read(s"${name}_centroids"), wh.read(s"${name}_cells"),
      queries, idCol, vecCol, k, nprobe)
}
