package graft.io

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-shaped warehouse over plain Parquet: every table commits by
  * writing data files first and a `_manifest.json` last (the commit
  * marker), so a killed run leaves no manifest and the stage rebuilds —
  * the checkpoint/resume + per-partition lineage semantics the north
  * rule asks for, behind a trait swappable for a real Iceberg catalog
  * (no Iceberg runtime jar ships in this environment; SURVEY §7.1).
  *
  * All metadata I/O goes through the Hadoop FileSystem API resolved
  * from the root's scheme — the warehouse root can be file:/, hdfs:/ or
  * s3a:/ exactly like the data writes (java.nio would silently pin the
  * commit markers to the driver's local disk).
  *
  * Manifest records: snapshot id (content-derived, no wall clock),
  * parent snapshot, config fingerprint, row count, schema, and the
  * per-partition data-file list with sizes (lineage). `getOrCreate`
  * with a mismatched fingerprint discards the stale checkpoint and
  * rebuilds — resuming never silently reuses results computed under a
  * different config.
  */
final class Warehouse(val root: String, spark: SparkSession) {

  private val rootPath = new HPath(root)
  private val fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dir(name: String): HPath = new HPath(rootPath, name)
  private def manifestPath(name: String): HPath = new HPath(dir(name), "_manifest.json")

  /** How many tables this instance actually built (vs resumed) —
    * observable resume behavior for tests.
    */
  @volatile var buildCount: Int = 0

  private val snapRe = """"snapshot": "([0-9a-f]+)"""".r
  private val parentSnapRe = """"parent_snapshot": (?:"([0-9a-f]+)"|null)""".r
  private val fpRe = """"fingerprint": "([^"]*)"""".r

  private def readString(p: HPath): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def writeString(p: HPath, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Committed snapshot id of a table, if any. */
  def snapshotOf(name: String): Option[String] =
    if (!fs.exists(manifestPath(name))) None
    else snapRe.findFirstMatchIn(readString(manifestPath(name))).map(_.group(1))

  /** The fingerprint a table was committed under, if any — lets a
    * dependent pipeline validate COMPATIBILITY with an existing base
    * (e.g. same signature family) rather than blindly reading it.
    */
  def fingerprintOf(name: String): Option[String] =
    if (!fs.exists(manifestPath(name))) None
    else fpRe.findFirstMatchIn(readString(manifestPath(name))).map(_.group(1))

  /** A stage is resumable only if its fingerprint matches AND the
    * parent snapshot it was built from is still the parent's current
    * snapshot — a rebuilt upstream stage (new input, new config)
    * invalidates every downstream checkpoint even when this stage's
    * own fingerprint is unchanged.
    */
  def committed(name: String, fingerprint: String, parent: Option[String] = None): Boolean =
    fs.exists(manifestPath(name)) && {
      val m = readString(manifestPath(name))
      m.contains("\"fingerprint\": \"" + fingerprint + "\"") && {
        val recordedParent = parentSnapRe.findFirstMatchIn(m).flatMap(g => Option(g.group(1)))
        parent match {
          case None => true
          case Some(p) => snapshotOf(p).exists(cur => recordedParent.contains(cur))
        }
      }
    }

  def read(name: String): DataFrame = spark.read.parquet(new HPath(dir(name), "data").toString)

  /** Resume point: reuse the committed table if its fingerprint
    * matches, else (re)build, commit, and read back (reading back means
    * downstream stages never recompute this lineage).
    */
  def getOrCreate(name: String, fingerprint: String, parent: Option[String] = None,
      partitionBy: Seq[String] = Nil)(build: => DataFrame): DataFrame = {
    if (!committed(name, fingerprint, parent)) {
      buildCount += 1
      val d = dir(name)
      if (fs.exists(d)) fs.delete(d, true)
      val dataDir = new HPath(d, "data").toString
      val writer = build.write.mode("overwrite")
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(dataDir)
      commitManifest(name, fingerprint, parent)
    }
    read(name)
  }

  private def commitManifest(name: String, fingerprint: String, parent: Option[String]): Unit = {
    val dataDir = new HPath(dir(name), "data")
    // recursive listing: partitioned tables nest files under key=value
    // dirs; lineage records the partition-relative path of every file
    val it = fs.listFiles(dataDir, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    // qualify the base before relativizing: listFiles yields scheme-
    // qualified paths (file:/...), and URI.relativize returns the child
    // UNCHANGED when schemes differ — a schemeless root would record
    // absolute paths in the lineage and fold the warehouse root into
    // the content-derived snapshot id
    val base = fs.makeQualified(dataDir).toUri
    while (it.hasNext) {
      val st = it.next()
      val rel = base.relativize(fs.makeQualified(st.getPath).toUri).getPath
      if (rel.endsWith(".parquet")) buf += ((rel, st.getLen))
    }
    val files = buf.toSeq.sortBy(_._1)
    val rows = read(name).count()
    val schema = read(name).schema.json
    // content-derived snapshot id: stable across identical re-runs
    val snapshotId = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        fingerprint + rows + files.map(f => f._1 + f._2).mkString(",")).toLong & 0xffffffffL)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val fileJson = files.map { case (f, sz) =>
      s"""{"path": ${q(s"data/$f")}, "bytes": $sz}"""
    }.mkString("[", ", ", "]")
    val json =
      s"""{
         |  "table": ${q(name)},
         |  "snapshot": ${q(snapshotId)},
         |  "parent": ${parent.map(q).getOrElse("null")},
         |  "parent_snapshot": ${parent.flatMap(snapshotOf).map(q).getOrElse("null")},
         |  "fingerprint": ${q(fingerprint)},
         |  "rows": $rows,
         |  "files": $fileJson,
         |  "schema": $schema
         |}""".stripMargin
    writeString(manifestPath(name), json)
  }

  /** Append a metrics row (stage, key, value) to the warehouse metrics
    * table — the per-stage observability surface (counters the
    * reference keeps in-process, matcher.py:398-401, become a table).
    */
  def logMetrics(stage: String, metrics: Map[String, Long]): Unit = {
    import spark.implicits._
    val df = metrics.toSeq.sortBy(_._1).toDF("key", "value")
      .select(org.apache.spark.sql.functions.lit(stage).as("stage"), $"key", $"value")
    df.write.mode("append").parquet(new HPath(dir("_metrics"), "data").toString)
  }

  def metrics(): DataFrame = read("_metrics")

  def drop(name: String): Unit = if (fs.exists(dir(name))) { fs.delete(dir(name), true); () }
}
