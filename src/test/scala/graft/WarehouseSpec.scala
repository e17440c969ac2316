package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Warehouse

/** Manifest/lineage content contract: data-file paths are recorded
  * RELATIVE to the table's data dir (partition-relative lineage), and
  * the content-derived snapshot id must not depend on the absolute
  * warehouse root — two roots with identical content produce identical
  * snapshot ids.
  */
class WarehouseSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def build(root: String): String = {
    val wh = new Warehouse(root, spark)
    wh.getOrCreate("tbl", "fp1", partitionBy = Seq("bucket")) {
      Seq((1L, 0L), (2L, 1L), (3L, 0L)).toDF("id", "bucket")
    }
    java.nio.file.Files.readString(java.nio.file.Paths.get(root, "tbl", "_manifest.json"))
  }

  test("manifest records partition-relative paths for a partitioned table") {
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    val manifest = build(root)
    val pathRe = """"path": "([^"]+)"""".r
    val paths = pathRe.findAllMatchIn(manifest).map(_.group(1)).toSeq
    assert(paths.nonEmpty)
    // every path is data/bucket=<v>/part-*.parquet — relative, under the
    // partition dir, never the absolute filesystem path of the root
    assert(paths.forall(_.matches("""data/bucket=\d+/part-[^/]+\.parquet""")),
      s"non-relative or non-partitioned lineage path in: ${paths.mkString(", ")}")
    assert(!manifest.contains(root), "manifest must not embed the warehouse root")
  }

  test("snapshot id derives from relative lineage, not the absolute root") {
    // part-file names carry per-write UUIDs, so ids differ across
    // rebuilds BY DESIGN (that is what invalidates descendants); what
    // must never leak into the hash is the warehouse root itself —
    // assert by recomputing the id from the manifest's own relative
    // paths (the root appears nowhere in the inputs)
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    val manifest = build(root)
    val snapRe = """"snapshot": "([0-9a-f]+)"""".r
    val snap = snapRe.findFirstMatchIn(manifest).map(_.group(1))
    val pathRe = """\{"path": "data/([^"]+)", "bytes": (\d+)\}""".r
    val files = pathRe.findAllMatchIn(manifest).map(m => (m.group(1), m.group(2).toLong)).toSeq
    val expected = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        "fp1" + 3 + files.map(f => f._1 + f._2).mkString(",")).toLong & 0xffffffffL)
    assert(snap.contains(expected),
      s"snapshot $snap must equal the root-free recomputation $expected")
  }
}
