package graft.mm

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode / feature-extract / resize / frame-sample stages.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (`fakeDecode`)
  * — the container has no image/audio codecs — but everything Spark
  * cares about is real and tested: the binary column representation,
  * the metadata struct schema, per-partition batched processing via
  * mapPartitions over a typed Dataset (the Scala analog of the
  * mapInPandas batch shape), and the partitioning/pushdown behavior of
  * a wide-binary scan (project metadata WITHOUT reading payload bytes
  * when possible).
  */
object Multimodal {

  /** Metadata contract for a decoded asset. */
  case class AssetMeta(asset_id: Long, n_bytes: Long, width: Int, height: Int,
      channels: Int, n_frames: Int)

  /** Row shape for the typed batch-decode path. */
  case class Asset(asset_id: Long, payload: Array[Byte])

  // ----------------------------------------------------------- columns

  /** Column-level fake decode: metadata derived ONLY from payload size
    * (STUB — a real build swaps this for a codec call; the schema and
    * plan shape are the contract). Arithmetic-only so oracles can
    * recompute it.
    */
  def fakeDecodeMeta(assetId: Column, payload: Column): Column = {
    val n = length(payload).cast("long")
    struct(
      assetId.cast("long").as("asset_id"),
      n.as("n_bytes"),
      (lit(16) + pmod(n, lit(64)).cast("int")).as("width"),
      (lit(16) + pmod(n * 7, lit(64)).cast("int")).as("height"),
      (lit(1) + pmod(n, lit(3)).cast("int")).as("channels"),
      (lit(1) + pmod(n, lit(30)).cast("int")).as("n_frames"))
  }

  /** "Resize": target dims clamped to the decoded aspect, arithmetic
    * only (STUB for the pixel op; the plan-level contract is a narrow
    * projection that never widens the payload).
    */
  def resizeDims(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width").cast("double")
    val h = meta.getField("height").cast("double")
    val scale = least(lit(maxSide) / greatest(w, h), lit(1.0))
    struct(
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"))
  }

  /** Frame-sample offsets: every `stride`-th frame index, as the batch
    * shape a video pipeline fans out on (explode -> per-frame work).
    */
  def frameSampleIdx(meta: Column, stride: Int): Column =
    sequence(lit(0), meta.getField("n_frames").cast("int") - 1, lit(stride))

  // ------------------------------------------------------ typed batch

  /** Batched per-partition decode over a typed Dataset — the Scala
    * analog of mapInPandas: one iterator per partition, metadata out,
    * payload bytes never leave the executor. A real decoder drops in
    * here without touching the plan.
    */
  def batchDecode(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        // STUB decode — deterministic, size-derived (see fakeDecodeMeta)
        val n = a.payload.length.toLong
        AssetMeta(a.asset_id, n,
          16 + (n % 64).toInt, 16 + ((n * 7) % 64).toInt,
          1 + (n % 3).toInt, 1 + (n % 30).toInt)
      }
    }
  }

  /** Wrap any (id, string) table as a binary asset table — fixture
    * path for environments with no real media files.
    */
  def asAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("asset_id"),
      encode(col(textCol), "UTF-8").as("payload"))
}
