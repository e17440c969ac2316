package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft._

/** Distributed connected components over a pair table, replacing the
  * reference's driver-side union-find
  * (/root/reference/src/clusterer.py:41-78,774-784) with min-label
  * propagation plus pointer jumping (hash-to-min with path compression,
  * Rastogi et al., "Finding Connected Components in Map-Reduce in
  * Logarithmic Rounds", ICDE'13): every node keeps the minimum label
  * seen; each round it takes the min over its neighbors' labels AND its
  * label's label (jump). Jumping doubles compressed-path depth per
  * round, so rounds are O(log diameter); each round is ~3 shuffle
  * barriers — less than half the large-star/small-star round — which
  * matters because CC rounds are the serial critical path of the whole
  * dedup job at every cluster size.
  *
  * Input:  edges DataFrame with two long columns (src, dst).
  * Output: (id, cluster_id) where cluster_id = min member id of the
  * component — deterministic and stable across partitionings, unlike
  * the reference's enumeration-order dense ids (compared as partitions,
  * see SURVEY §5).
  *
  * Skew: a hot component floods its min label to all members — both
  * the message groupBy and the jump join aggregate map-side (partial
  * min), so hot labels reduce before the shuffle; AQE handles residual
  * join skew. The adjacency is eagerly checkpointed (hash-partitioned
  * on u) once up front; each round's labels are lazily checkpointed and
  * materialized by that round's convergence check, which counts the
  * round's ACTUAL label changes (the prior label rides the round
  * aggregation), so convergence is detected exactly at the fixpoint
  * with no confirm-round waste. The check runs EVERY round — fusing
  * rounds into one job was measured 2.4x slower under AQE (see the
  * `checkEvery` param note).
  */
object ConnectedComponents {

  /** @param edges      two-column DataFrame (any names) of long ids
    * @param maxRounds  safety bound; pointer jumping converges in
    *                   O(log n) rounds
    * @param checkEvery run the convergence check (a serial job barrier)
    *                   every this-many rounds. KEEP AT 1: fusing rounds
    *                   (checkEvery=2) looked like it would halve the
    *                   serial job count, but a fused window leaves round
    *                   k's label tables lazy while round k+1's plan
    *                   references them from multiple branches — AQE
    *                   materializes those branches as CONCURRENT stage
    *                   jobs, each recomputing the un-cached round-k
    *                   subtree before any blocks land. Measured on the
    *                   640k-doc bench corpus at 4 cores: checkEvery=2
    *                   cost 2.4x total job time (857 s vs 353 s) and
    *                   2.4x wall. One barrier per round is the cheaper
    *                   serial tail.
    */
  def run(edges: DataFrame, maxRounds: Int = 50, checkEvery: Int = 1): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"edges must have 2 columns, got ${cols.mkString(",")}")
    // undirected adjacency, self-loops dropped, both directions
    val canon = edges
      .select(col(cols(0)).cast("long").as("u"), col(cols(1)).cast("long").as("v"))
      .where($"u" =!= $"v")
    // no distinct: verified pair tables are already unique, and
    // duplicate edges only produce duplicate messages that the min
    // aggregation absorbs — a full dedup shuffle here is pure latency.
    // EAGER checkpoint: adj is the boundary between the (expensive)
    // edge-producing pipeline and the (cheap) label rounds, and it is
    // referenced by every round. A lazy checkpoint here lets the first
    // convergence check materialize it through MULTIPLE concurrent AQE
    // stage-materialization jobs — each recomputing the whole verify
    // pipeline before any blocks are cached (measured 5x on the bench
    // corpus). One up-front job runs that pipeline exactly once.
    // Hash-partitioned on u BEFORE the checkpoint: localCheckpoint
    // preserves outputPartitioning, so every round's message join reads
    // adj co-located and shuffles only the (far smaller) label side —
    // one up-front exchange instead of one full-adjacency exchange per
    // round, which is what dominates at web scale.
    val adj = graft.CacheHygiene.described(edges.sparkSession, "graft: CC adjacency checkpoint")(
      canon.union(canon.select($"v".as("u"), $"u".as("v")))
        .repartition($"u")
        .localCheckpoint(true))

    // label(x) = min(x, min neighbor) — every non-isolated node appears
    // as u in adj, so this covers all nodes. Lazy: it reads only the
    // materialized adj blocks, so late materialization duplicates a
    // cheap aggregation at worst.
    var labelsCp = adj.groupBy($"u".as("id"))
      .agg(min($"v").as("mn"))
      .select($"id", least($"id", $"mn").as("lbl"))
      .localCheckpoint(false)
    var labels = labelsCp

    // AQE stays ON for the label rounds. Disabling it here was tried
    // (the rounds are tiny fixed-width exchanges with nothing to
    // re-plan, and the warm-JVM job count fell 48 -> 34) and REVERTED:
    // pristine-JVM A/B at both bench levels measured it slightly
    // SLOWER (t4 47.2-50.0 s vs 44.4-45.2 s; t1 134.6-145.2 s vs
    // 130.9 s on the 640k corpus) — AQE's concurrent query-stage
    // materialization overlaps a round's sub-jobs, which outweighs its
    // per-exchange barrier cost even on the serial critical path.
    var converged = false
    var round = 0
    // persists/checkpoints of rounds whose materializing job has not
    // run yet (unchecked rounds are lazy): freeing them early would
    // either lose the cache before its double-read or unmark a
    // checkpoint pre-materialization — flush only after each check
    var pendingFree = List.empty[(DataFrame, Boolean)] // (frame, isCheckpoint)
    while (!converged && round < maxRounds) {
      // neighbor messages: x's label flows to every neighbor.
      // shuffle_hash on the label side (r6, guide §3.1): adj is
      // checkpoint-partitioned on u and at least edge-factor larger
      // than the label table, so the SortMergeJoin default re-SORTED
      // the full adjacency every round; building the (narrow) labels
      // per partition streams adj untouched.
      val msgs = adj.join(labels.withColumnRenamed("id", "u").hint("shuffle_hash"), "u")
        .select($"v".as("id"), $"lbl")
      // fresh aliases on both union sides: `labels` attributes reach the
      // union through both branches (directly and via the msgs join),
      // and duplicate expression ids across branches trip Catalyst's
      // union constraint rewrite (AttributeMap lookup, Spark 4.1.2)
      // persisted: the jump self-join below reads it twice — without
      // this the whole message/groupBy subtree computes twice per round
      // `prev` rides the aggregation for the convergence test: labels
      // has exactly one row per id, so max(prev) IS the round's prior
      // label — change detection costs one map-side-aggregated column,
      // no extra join or full-table checksum
      val viaEdges = labels.select($"id".as("id"), $"lbl".as("lbl"), $"lbl".as("prev"))
        .union(msgs.select($"id".as("id"), $"lbl".as("lbl"),
          lit(null).cast("long").as("prev")))
        .groupBy($"id").agg(min($"lbl").as("lbl"), max($"prev").as("prev"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // pointer jump: also take label(label(x)) — labels always point to
      // smaller ids in the same component, so this is safe and compresses
      // chains exponentially
      val jumped = viaEdges.as("a")
        .join(viaEdges.select($"id".as("jid"), $"lbl".as("jlbl")).hint("shuffle_hash").as("b"),
          col("a.lbl") === col("b.jid"), "left")
        .select(col("a.id").as("id"),
          least(col("a.lbl"), coalesce(col("jlbl"), col("a.lbl"))).as("lbl"),
          col("a.prev").as("prev"))
        .localCheckpoint(false)

      pendingFree = (viaEdges, false) :: (labelsCp, true) :: pendingFree
      labelsCp = jumped
      labels = jumped.select($"id", $"lbl")
      round += 1
      if (round % checkEvery == 0 || round >= maxRounds) {
        // one job materializes every lazy round since the last check
        // (their checkpoints/persists fill as intermediates of this job)
        // and counts this round's ACTUAL label changes. Labels decrease
        // monotonically, so changed == 0 in the latest round means the
        // fixpoint was reached — detection is exact at the first check
        // after stabilization (the old checksum-equality test needed a
        // full confirm WINDOW: up to checkEvery extra rounds of work)
        val changed = graft.CacheHygiene.described(edges.sparkSession, s"graft: CC round $round")(
          jumped.agg(
            coalesce(sum(when($"lbl" =!= $"prev", 1L).otherwise(0L)), lit(0L))).head().getLong(0))
        // all pending generations are now dead — free them, or up to
        // maxRounds generations of RDD blocks pile up in the block manager
        pendingFree.foreach { case (df, isCp) =>
          if (isCp) freeCheckpoint(df) else { df.unpersist(blocking = false); () }
        }
        pendingFree = Nil
        converged = changed == 0
      }
    }

    freeCheckpoint(adj)
    labels.select($"id", $"lbl".as("cluster_id"))
  }

  /** Free the checkpointed label blocks backing a result of
    * `run`/`assign` once it has been CONSUMED (collected or written).
    * The result's lineage is truncated at those checkpoints, so the
    * frame must not be acted on after release — the MLlib-model-style
    * explicit lifecycle (`WebDedup` calls this internally right after
    * committing the stage; in-session callers use `Dedup.release`).
    */
  def release(result: DataFrame, blocking: Boolean = false): Unit =
    graft.CacheHygiene.releaseCheckpoints(result, blocking)

  /** Unpersist the RDD behind a localCheckpoint'ed DataFrame (its
    * analyzed plan is a LogicalRDD over the checkpointed blocks).
    * Quietly — see [[graft.CacheHygiene.releaseCheckpoints]].
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        org.apache.spark.graftshim.QuietUnpersist(lr.rdd.sparkContext, lr.rdd, blocking = false)
      case _ => // not a checkpointed frame — nothing to free
    }

  /** Dense 0-based renumbering of a key column (reference-compat dense
    * cluster ids, clusterer.py:778-784) WITHOUT a global un-partitioned
    * window: range-partition the distinct keys (total order across
    * partitions), number rows per partition with a PARTITIONED window,
    * and add per-partition start offsets computed from the tiny
    * partition-count table (<= shuffle-partition rows, collected to the
    * driver like any plan statistic). Equivalent to
    * `dense_rank() over (order by key) - 1` at any scale.
    *
    * @return (key, dense_id) mapping — join it back to the full table
    */
  def denseIds(keys: DataFrame): DataFrame = {
    val keyCol = keys.columns.head
    val ranged = keys.select(col(keyCol)).distinct()
      .repartitionByRange(col(keyCol))
      .withColumn("_p", spark_partition_id())
      // persisted: pins the sampled range boundaries so the offset job
      // and the final numbering see identical partitions
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = ranged.groupBy($"_p").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (p, n) => val o = acc; acc += n; p -> o }.toMap
    }
    val offMap = typedLit(offsets)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"_p").orderBy(col(keyCol).asc)
    ranged.select(col(keyCol),
      (row_number().over(w) - 1 + coalesce(try_element_at(offMap, $"_p"), lit(0L)))
        .as("dense_id"))
  }

  /** Attach cluster_id (min member id; nodes absent from any edge map to
    * themselves) and cluster_size to a source table.
    *
    * Sizes are aggregated on the LABEL table, not the joined source:
    * nodes outside every edge are singletons (size 1 via coalesce), so
    * counting assignment rows per label is equivalent to counting
    * source rows per cluster — and the source table crosses exactly ONE
    * shuffle join instead of two (at web scale the label table is the
    * dup minority; the old shape shipped the full corpus through a
    * second join just to attach a count).
    */
  def assign(source: DataFrame, idCol: String, edges: DataFrame): DataFrame = {
    val assignments = run(edges)
    val sizes = assignments.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
    val labeled = assignments.join(sizes, "cluster_id")
      .select($"id".as(idCol), $"cluster_id", $"cluster_size")
    source.join(labeled, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce($"cluster_id", col(idCol).cast("long")))
      .withColumn("cluster_size", coalesce($"cluster_size", lit(1L)))
  }
}
