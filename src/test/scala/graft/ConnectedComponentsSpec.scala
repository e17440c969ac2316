package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.ConnectedComponents

/** CC vs a local union-find oracle on randomized graphs (mirrors the
  * reference's UnionFind unit semantics,
  * /root/reference/tests/test_clustering.py:10-36), plus shape cases
  * that stress large-star/small-star: chains, cliques, stars.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def unionFindOracle(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical label = min member; second pass
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }
  }

  private def runCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("u", "v")
    val labels = ConnectedComponents.run(df)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // production callers release after consuming (Dedup.release); the
    // suite follows the same lifecycle so shared-session suites that
    // assert a clean block manager (DecontaminateSpec) can't inherit
    // this suite's checkpoint blocks
    ConnectedComponents.release(labels)
    out
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    assert(runCC(edges) == unionFindOracle(0, edges))
  }

  test("chain graph (worst case for propagation)") {
    check((0L until 40L).map(i => (i, i + 1)))
  }
  test("descending chain") {
    check((0L until 40L).map(i => (i + 1, i)))
  }
  test("clique") {
    val nodes = (0L until 15L)
    check(for (a <- nodes; b <- nodes if a < b) yield (a, b))
  }
  test("star with high root id") {
    check((0L until 30L).map(i => (1000L, i)))
  }
  test("two components + self loops + duplicates") {
    check(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 1L), (10L, 11L), (11L, 12L)))
  }
  test("empty edges") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("u", "v")
    val labels = ConnectedComponents.run(df)
    assert(labels.count() == 0)
    ConnectedComponents.release(labels)
  }
  test("randomized graphs match union-find oracle") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val n = 60 + trial * 20
      val m = n + rnd.nextInt(n)
      val edges = (0 until m).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      check(edges)
    }
  }
  test("permutation invariance of labels") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 120).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    val a = runCC(edges)
    val b = runCC(rnd.shuffle(edges.map { case (u, v) => (v, u) }))
    assert(a == b)
  }

  test("assign attaches cluster_id and cluster_size, singletons self-labeled") {
    import spark.implicits._
    val src = (0L until 10L).map(i => (i, s"row$i")).toDF("id", "payload")
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("u", "v")
    val assigned = ConnectedComponents.assign(src, "id", edges)
    val out = assigned
      .select("id", "cluster_id", "cluster_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    ConnectedComponents.release(assigned)
    assert(out.contains((0L, 0L, 3L)))
    assert(out.contains((1L, 0L, 3L)))
    assert(out.contains((2L, 0L, 3L)))
    assert(out.contains((5L, 5L, 2L)))
    assert(out.contains((6L, 5L, 2L)))
    assert(out.contains((3L, 3L, 1L))) // singleton
    assert(out.size == 10)
  }
}
