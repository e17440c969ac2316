package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft._

/** Distributed connected components over a pair table, replacing the
  * reference's driver-side union-find
  * (/root/reference/src/clusterer.py:41-78,774-784) with the
  * alternating large-star / small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — O(log n)
  * rounds, each a pair of shuffles, no driver materialization.
  *
  * Input:  edges DataFrame with two long columns (src, dst).
  * Output: (id, cluster_id) where cluster_id = min member id of the
  * component — deterministic and stable across partitionings, unlike
  * the reference's enumeration-order dense ids (compared as partitions,
  * see SURVEY §5).
  *
  * Skew: large-star attaches every neighbor of a high-degree node to
  * the component minimum, so hot nodes shrink each round; the groupBy
  * min is a partial (map-side) aggregate, and AQE handles residual join
  * skew. Lineage is truncated every round via localCheckpoint to keep
  * plans O(1) deep.
  */
object ConnectedComponents {

  /** @param edges      two-column DataFrame (any names) of long ids
    * @param maxRounds  safety bound; the algorithm converges in
    *                   O(log n) rounds (SoCC'14 Thm 3.2)
    */
  def run(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"edges must have 2 columns, got ${cols.mkString(",")}")
    // canonical undirected edge set, self-loops dropped
    var e = edges
      .select(col(cols(0)).cast("long").as("u"), col(cols(1)).cast("long").as("v"))
      .where($"u" =!= $"v")
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .distinct()
      .localCheckpoint(true)

    var converged = false
    var round = 0
    var prevSig = checksum(e)
    while (!converged && round < maxRounds) {
      // ---- large-star: for each node u, connect strictly-larger
      // neighbors to m = min(N(u) ∪ {u})
      val nbrsL = e.select($"u", $"v").union(e.select($"v".as("u"), $"u".as("v")))
      val minsL = nbrsL.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"u", $"mn").as("m"))
      val large = nbrsL.where($"v" > $"u")
        .join(minsL, "u")
        .where($"v" =!= $"m")
        .select(least($"v", $"m").as("u"), greatest($"v", $"m").as("v"))
        .distinct()

      // ---- small-star: for each node u with smaller neighbors
      // N = {v ∈ Γ(u) : v < u}, connect N ∪ {u} to m = min(N)
      val nbrsS = large.select($"u", $"v").union(large.select($"v".as("u"), $"u".as("v")))
        .where($"v" < $"u")
      val minsS = nbrsS.groupBy($"u").agg(min($"v").as("m"))
      // m <= v < u by construction, so emitted edges are already canonical
      val small = nbrsS.join(minsS, "u")
        .select(explode(array(
          struct($"m".as("a"), $"v".as("b")),
          struct($"m".as("a"), $"u".as("b")))).as("e"))
        .select($"e.a".as("u"), $"e.b".as("v"))
        .where($"u" =!= $"v")
        .distinct()
        .localCheckpoint(true)

      // convergence: edge set unchanged (order-free checksum + count)
      val sig = checksum(small)
      converged = sig == prevSig
      prevSig = sig
      e = small
      round += 1
    }

    // fixpoint is a star forest: every edge is (root=u, member=v), u<v
    val members = e.select($"v".as("id"), $"u".as("cluster_id"))
    val roots = e.select($"u".as("id")).distinct()
      .select($"id", $"id".as("cluster_id"))
    members.union(roots).distinct()
  }

  private def checksum(e: DataFrame): (Long, String) = {
    // decimal(38) sum: ANSI mode (Spark 4 default) would overflow a
    // long sum of 64-bit hashes
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")), lit(0)).as("h")
    ).head()
    (row.getLong(0), row.get(1).toString)
  }

  /** Attach cluster_id (min member id; nodes absent from any edge map to
    * themselves) and cluster_size to a source table.
    */
  def assign(source: DataFrame, idCol: String, edges: DataFrame): DataFrame = {
    val assignments = run(edges)
    val withCluster = source
      .join(assignments.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce($"cluster_id", col(idCol).cast("long")))
    val sizes = withCluster.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
    withCluster.join(sizes, "cluster_id")
  }
}
