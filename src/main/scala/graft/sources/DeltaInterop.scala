package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.streaming.CdcApply

/** Delta Lake table-format interop — the export/read seam the
  * BASELINE's "Delta/Iceberg interop" family names, built against the
  * PUBLIC Delta transaction-log protocol (delta.io PROTOCOL.md: a
  * `_delta_log/` of ordered JSON commit files whose `add`/`remove`
  * actions define the live parquet file set — no library required,
  * the log is newline-delimited JSON and the data is plain parquet).
  *
  * [[exportSnapshot]] publishes a CDC table's CURRENT snapshot as a
  * Delta table readable by any Delta reader (delta-rs, Spark+delta,
  * DuckDB's delta extension — none ship in this container, so the
  * round-trip is validated by [[readDelta]], this engine's own
  * protocol reader, plus structural spec checks in DeltaInteropSpec).
  * Re-exporting after more CDC batches appends a NEW log version that
  * removes the previous file set and adds the current one — the
  * full-rewrite commit shape, always protocol-correct; readers see an
  * atomic flip. The schemaString rides Spark's own StructType JSON,
  * which IS Delta's schema serialization.
  *
  * [[readDelta]] replays a `_delta_log` (ours or another writer's):
  * base state from the newest complete CHECKPOINT (classic parquet
  * or v2 top-level + sidecars) when one exists (real aged logs delete the JSON commits a
  * checkpoint covers — a JSON-only replay would silently lose their
  * adds; a gap in the JSON sequence with no covering checkpoint
  * refuses as truncated), then the net add/remove set of the JSON
  * tail in version order, then one ordinary parquet scan of the live
  * files under the declared schema — pruning, pushdown, and codegen
  * identical to any parquet read. Partitioned
  * tables reconstruct their partition columns from each add-action's
  * `partitionValues` (typed literals per file group — Catalyst
  * constant-folds partition predicates and prunes whole groups);
  * column mapping (name and id modes) resolves physical names /
  * parquet field ids; deletion vectors ([[DeletionVectors]]) decode
  * on executors and anti-join deleted row indexes away; v2
  * checkpoints (top-level json/parquet + `_sidecars/` parquet files)
  * load like classic ones. Reader features beyond those
  * (timestampNtz, ...) are REFUSED loudly rather than silently
  * misread.
  *
  * Scale: an export is one snapshot write + one driver-side log
  * append; a read is one log replay (driver-side, O(commits) small
  * JSON files — the same metadata class as a manifest read) + one
  * multi-path parquet scan.
  */
object DeltaInterop {

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m
  }

  private def logDir(table: String) = new Path(table, "_delta_log")

  private def versionFile(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.json")

  /** Clear the debris a crash in the pre-commit window can leave for
    * `version`: the data dir `v<version>/` and the log tmp file
    * `.tmp-<version>`. Safe by construction — no committed log entry
    * can reference either (the version is derived as head+1, so if the
    * rename had landed the version would not be recomputed), and
    * without this sweep a crashed export would make every retry fail
    * permanently on `errorifexists`/`create(overwrite=false)`.
    */
  private def clearAborted(spark: SparkSession, table: String,
      version: Long): Unit = {
    val fs = CdcApply.fsFor(spark, table)
    val dataDir = new Path(table, s"v$version")
    if (fs.exists(dataDir)) fs.delete(dataDir, true)
    val tmp = new Path(logDir(table), s".tmp-$version")
    if (fs.exists(tmp)) fs.delete(tmp, false)
  }

  /** Live versions present in the log, ascending; empty = no table. */
  private def versions(spark: SparkSession, table: String): Seq[Long] = {
    val fs = CdcApply.fsFor(spark, table)
    val dir = logDir(table)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted
  }

  /** Export the CDC table's current snapshot at `cdcRoot` as version
    * N+1 (or 0) of the Delta table at `deltaDir`. Returns the
    * committed log version. The data lands under `v<version>/` inside
    * the table dir (Delta paths are table-relative; subdirectories
    * are protocol-legal), written as ordinary snappy parquet.
    */
  def exportSnapshot(spark: SparkSession, cdcRoot: String,
      deltaDir: String): Long = {
    val snap = CdcApply.readSnapshot(spark, cdcRoot).getOrElse(
      throw new IllegalArgumentException(s"no CDC table at $cdcRoot"))
    val fs = CdcApply.fsFor(spark, deltaDir)
    val prior = versions(spark, deltaDir)
    // head INCLUDING checkpoints: a truncated log (checkpointLog)
    // has no JSON commits, but the next version is still head+1
    val version = math.max(
      prior.lastOption.getOrElse(-1L),
      latestCheckpoint(spark, deltaDir).map(_.version)
        .getOrElse(-1L)) + 1L
    clearAborted(spark, deltaDir, version)
    val rel = s"v$version"
    snap.write.mode("errorifexists")
      .parquet(new Path(deltaDir, rel).toString)
    val dataFiles = fs.listStatus(new Path(deltaDir, rel)).toSeq
      .filter(st => st.getPath.getName.endsWith(".parquet"))
    val node = mapper.createObjectNode _
    val actions = scala.collection.mutable.ArrayBuffer[String]()
    if (version == 0L) {
      val protocol = node()
      val p = protocol.putObject("protocol")
      p.put("minReaderVersion", 1)
      p.put("minWriterVersion", 2)
      actions += mapper.writeValueAsString(protocol)
    }
    // metaData on every commit we author (protocol requires it at
    // version 0; repeating it is legal and keeps each commit
    // self-describing under additive CDC schema evolution)
    val meta = node()
    val m = meta.putObject("metaData")
    m.put("id", java.util.UUID
      .nameUUIDFromBytes(deltaDir.getBytes("UTF-8")).toString)
    m.put("schemaString", snap.schema.json)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    m.putArray("partitionColumns")
    m.putObject("configuration")
    m.put("createdTime", 0L)
    actions += mapper.writeValueAsString(meta)
    // remove every file live in the prior version (full-rewrite shape)
    readLiveFiles(spark, deltaDir, prior).foreach { path =>
      val rm = node()
      val r = rm.putObject("remove")
      r.put("path", path)
      r.put("dataChange", true)
      actions += mapper.writeValueAsString(rm)
    }
    dataFiles.foreach { st =>
      val add = node()
      val a = add.putObject("add")
      a.put("path", s"$rel/${st.getPath.getName}")
      a.put("size", st.getLen)
      a.putObject("partitionValues")
      a.put("modificationTime", st.getModificationTime)
      a.put("dataChange", true)
      actions += mapper.writeValueAsString(add)
    }
    val tmp = new Path(logDir(deltaDir), s".tmp-$version")
    val out = fs.create(tmp, false)
    out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, versionFile(deltaDir, version)))
      throw new IllegalStateException(
        s"concurrent Delta export lost the commit race for " +
          s"version $version of $deltaDir")
    version
  }

  /** INCREMENTAL export — the 100 TB path: re-publish ONLY the
    * buckets whose physical identity (base dir + pending delta dirs)
    * changed since the last export, as one new log version removing
    * exactly those buckets' previous files and adding their rewritten
    * snapshots. A trickle-fed table exports in O(changed buckets)
    * per sync, not O(table) — the same cost class as the CDC mirror.
    * The per-bucket export state rides a sidecar JSON next to the log
    * (exporter-private, invisible to Delta readers). Returns the
    * committed version, or None when nothing changed (no empty
    * commits). First call on an empty dir exports everything —
    * [[exportSnapshot]]'s full shape with per-bucket layout.
    */

  /** Bucket identity for the incremental sync, RENAME-STATE included:
    * a metadata-only rename changes every bucket's identity, so the
    * next sync republishes the whole table under the new names (the
    * export reader is name-based; mixing old-name and new-name files
    * under one declared schema would read NULLs).
    */
  private def bucketIdentity(m: CdcApply.Manifest): Map[Int, String] = {
    val suffix =
      if (m.renames.isEmpty) ""
      else "+r=" + m.renames.map { case (s, l) => s"$s>$l" }.mkString(",")
    m.buckets.map { case (id, e) =>
      id -> (e.allRels.mkString("+") + suffix) }
  }

  def exportIncremental(spark: SparkSession, cdcRoot: String,
      deltaDir: String): Option[Long] = {
    val m = CdcApply.currentManifest(spark, cdcRoot).getOrElse(
      throw new IllegalArgumentException(s"no CDC table at $cdcRoot"))
    val fs = CdcApply.fsFor(spark, deltaDir)
    val statePath = new Path(deltaDir, "_graft_export_state.json")
    val priorVs = versions(spark, deltaDir)
    // sidecar state: the log version it describes + per-bucket
    // (identity, files). A crash can land BETWEEN the log commit and
    // the state write, so the state is trusted only when its stamp
    // matches the log head — otherwise the next sync SELF-HEALS with
    // a full rewrite whose removals come from the LOG's live set (the
    // one source that is always right).
    val rawState: Option[(Long, Map[Int, (String, Seq[String])])] =
      if (!fs.exists(statePath)) None
      else {
        val in = fs.open(statePath)
        val text = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        in.close()
        val n = mapper.readTree(text)
        import scala.jdk.CollectionConverters._
        val v = Option(n.get("version")).map(_.asLong(-1L)).getOrElse(-1L)
        val buckets = Option(n.get("buckets")).map(
          _.properties().asScala.map { e =>
            val files = e.getValue.get("files").elements().asScala
              .map(_.asText()).toSeq
            e.getKey.toInt ->
              (e.getValue.get("identity").asText(), files)
          }.toMap).getOrElse(Map.empty[Int, (String, Seq[String])])
        Some((v, buckets))
      }
    if (priorVs.nonEmpty && rawState.isEmpty)
      throw new IllegalStateException(
        s"Delta table at $deltaDir has log versions but no export " +
          "state — it was written by exportSnapshot (or a foreign " +
          "writer); incremental export requires its own lineage. " +
          "Use a fresh directory, or keep using exportSnapshot.")
    // head INCLUDING checkpoints: after checkpointLog(truncate=true)
    // the stamped version's JSON is gone but the checkpoint IS that
    // committed state — the sync stays incremental
    val stateConsistent =
      rawState.exists(_._1 == math.max(
        priorVs.lastOption.getOrElse(-1L),
        latestCheckpoint(spark, deltaDir).map(_.version)
          .getOrElse(-1L)))
    val prior: Map[Int, (String, Seq[String])] =
      if (stateConsistent) rawState.get._2
      else Map.empty // stale stamp: treat every bucket as changed
    val current: Map[Int, String] =
      bucketIdentity(m)
    val changed = current.filter { case (id, ident) =>
      !prior.get(id).exists(_._1 == ident) }.keys.toSeq.sorted
    val dropped = (prior.keySet -- current.keySet).toSeq.sorted
    if (changed.isEmpty && dropped.isEmpty &&
        (priorVs.nonEmpty ||
          latestCheckpoint(spark, deltaDir).isDefined))
      return None
    val version = math.max(
      priorVs.lastOption.getOrElse(-1L),
      latestCheckpoint(spark, deltaDir).map(_.version)
        .getOrElse(-1L)) + 1L
    clearAborted(spark, deltaDir, version)
    // removals: the trusted state's files for the touched buckets, or
    // (self-heal path) EVERYTHING the log currently serves
    val removals: Seq[String] =
      if (stateConsistent)
        (changed ++ dropped).flatMap(id =>
          prior.get(id).toSeq.flatMap(_._2))
      else readLiveFiles(spark, deltaDir, priorVs)
    // rewrite each changed bucket's RESOLVED logical rows under its
    // own per-version dir (tombstones stripped, internals dropped —
    // Delta readers must see the logical table, never merge state)
    val written: Map[Int, Seq[String]] = changed.map { id =>
      val rel = s"v$version/b$id"
      CdcApply.applyRenames(CdcApply.stripInternal(
        CdcApply.readBucketsResolved(spark, cdcRoot, m, Some(Seq(id)))
          .getOrElse(throw new IllegalStateException(
            s"bucket $id vanished during export of $cdcRoot")),
        m.conf), m)
        .write.mode("errorifexists")
        .parquet(new Path(deltaDir, rel).toString)
      id -> fs.listStatus(new Path(deltaDir, rel)).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => s"$rel/${st.getPath.getName}")
    }.toMap
    val node = mapper.createObjectNode _
    val actions = scala.collection.mutable.ArrayBuffer[String]()
    if (version == 0L) {
      val protocol = node()
      val p = protocol.putObject("protocol")
      p.put("minReaderVersion", 1)
      p.put("minWriterVersion", 2)
      actions += mapper.writeValueAsString(protocol)
    }
    val schema = CdcApply.applyRenames(CdcApply.stripInternal(
      CdcApply.readBucketsResolved(spark, cdcRoot, m, None).get, m.conf),
      m).schema
    val meta = node()
    val mm = meta.putObject("metaData")
    mm.put("id", java.util.UUID
      .nameUUIDFromBytes(deltaDir.getBytes("UTF-8")).toString)
    mm.put("schemaString", schema.json)
    val fmt = mm.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    mm.putArray("partitionColumns")
    mm.putObject("configuration")
    mm.put("createdTime", 0L)
    actions += mapper.writeValueAsString(meta)
    removals.foreach { path =>
      val rm = node()
      val r = rm.putObject("remove")
      r.put("path", path)
      r.put("dataChange", true)
      actions += mapper.writeValueAsString(rm)
    }
    written.toSeq.sortBy(_._1).foreach { case (id, files) =>
      files.foreach { path =>
        val add = node()
        val a = add.putObject("add")
        a.put("path", path)
        a.put("size",
          fs.getFileStatus(new Path(deltaDir, path)).getLen)
        a.putObject("partitionValues")
        a.put("modificationTime", 0L)
        a.put("dataChange", true)
        actions += mapper.writeValueAsString(add)
      }
    }
    val tmp = new Path(logDir(deltaDir), s".tmp-$version")
    val out = fs.create(tmp, false)
    out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, versionFile(deltaDir, version)))
      throw new IllegalStateException(
        s"concurrent Delta export lost the commit race for " +
          s"version $version of $deltaDir")
    // new state: changed buckets' fresh files, unchanged carry over;
    // stamped with the log version it describes (the crash detector)
    val newState = mapper.createObjectNode()
    newState.put("version", version)
    val bucketsNode = newState.putObject("buckets")
    current.toSeq.sortBy(_._1).foreach { case (id, ident) =>
      val b = bucketsNode.putObject(id.toString)
      b.put("identity", ident)
      val arr = b.putArray("files")
      written.getOrElse(id, prior(id)._2).foreach(arr.add)
    }
    val stateTmp = new Path(deltaDir, s"._graft_export_state-$version")
    val so = fs.create(stateTmp, false)
    so.write(mapper.writeValueAsString(newState).getBytes("UTF-8"))
    so.close()
    fs.delete(statePath, false)
    if (!fs.rename(stateTmp, statePath))
      throw new IllegalStateException(
        s"export state rename failed for $deltaDir")
    Some(version)
  }

  /** Reader features this engine implements for protocol v3 tables.
    * Anything else (timestampNtz, ...) refuses loudly — never
    * misread.
    */
  private val SupportedReaderFeatures =
    Set("columnMapping", "deletionVectors", "v2Checkpoint")

  /** Everything one ordered log replay yields: the latest declared
    * schema, its partition columns and table configuration, and the
    * net live file set — each file with its add-action
    * `partitionValues` (string-serialized per the protocol; a JSON
    * null value reads as None) and its `deletionVector` descriptor
    * when one rides the add. ONE pass over the commit files. An add
    * for an already-live path REPLACES its entry — the DV-update
    * commit shape (DELETE re-adds the file with a larger vector).
    */
  private case class LiveFile(path: String,
      partitionValues: Map[String, Option[String]],
      dv: Option[DeletionVectors.DvDescriptor],
      stats: Option[String] = None)

  private case class LogState(schema: Option[StructType],
      partitionColumns: Seq[String], config: Map[String, String],
      files: Seq[LiveFile])

  private def checkProtocol(table: String, minReader: Int,
      readerFeatures: Set[String]): Unit =
    if (minReader == 3) {
      val unsupported = readerFeatures -- SupportedReaderFeatures
      if (unsupported.nonEmpty)
        throw new UnsupportedOperationException(
          s"Delta table $table requires reader features " +
            s"${unsupported.mkString(", ")}; this reader " +
            s"implements ${SupportedReaderFeatures.mkString(", ")}")
    } else if (minReader > 3)
      throw new UnsupportedOperationException(
        s"Delta table $table needs reader version $minReader; this " +
          "reader implements protocol versions 1-2 and " +
          "version-3 tables whose readerFeatures are within " +
          SupportedReaderFeatures.mkString(", "))
    // mr 1: plain. mr 2: column mapping — handled at read time.

  /** The newest COMPLETE classic parquet checkpoint in the log
    * (single-part `<v>.checkpoint.parquet` or multi-part
    * `<v>.checkpoint.<i>.<n>.parquet` with all n parts present), as
    * (version, part paths). `_last_checkpoint` is advisory — the
    * listing is authoritative (a torn pointer must not hide a
    * complete checkpoint or point at an incomplete one).
    */
  private sealed trait Ckpt { def version: Long }
  private case class ClassicCkpt(version: Long, parts: Seq[Path])
    extends Ckpt
  private case class V2Ckpt(version: Long, file: Path, json: Boolean)
    extends Ckpt

  private def latestCheckpoint(spark: SparkSession, table: String,
      maxVersion: Option[Long] = None): Option[Ckpt] = {
    val fs = CdcApply.fsFor(spark, table)
    if (!fs.exists(logDir(table))) return None
    val names = fs.listStatus(logDir(table)).toSeq
      .map(_.getPath.getName)
    val Single = "(\\d{20})\\.checkpoint\\.parquet".r
    val Part = "(\\d{20})\\.checkpoint\\.(\\d{10})\\.(\\d{10})\\.parquet".r
    // V2 checkpoints (Delta 3.x `v2Checkpoint` reader feature) are
    // UUID-named single top-level files, json or parquet; their file
    // actions may live in sidecars referenced from the top file
    val V2 = "(\\d{20})\\.checkpoint\\.([A-Za-z0-9_-]+)\\.(json|parquet)".r
    val classicByVersion = scala.collection.mutable
      .Map[Long, scala.collection.mutable.ArrayBuffer[(Int, Int, String)]]()
    val v2ByVersion = scala.collection.mutable
      .Map[Long, scala.collection.mutable.ArrayBuffer[(String, Boolean)]]()
    names.foreach {
      case n @ Single(v) =>
        classicByVersion.getOrElseUpdate(v.toLong,
          scala.collection.mutable.ArrayBuffer()) += ((1, 1, n))
      case n @ Part(v, i, k) =>
        classicByVersion.getOrElseUpdate(v.toLong,
          scala.collection.mutable.ArrayBuffer()) +=
          ((i.toInt, k.toInt, n))
      case n @ V2(v, _, ext) =>
        v2ByVersion.getOrElseUpdate(v.toLong,
          scala.collection.mutable.ArrayBuffer()) +=
          ((n, ext == "json"))
      case _ => ()
    }
    val classic: Option[Ckpt] = classicByVersion.toSeq
      .filter(e => maxVersion.forall(e._1 <= _))
      .sortBy(-_._1).collectFirst {
        case (v, parts)
            if parts.map(_._2).distinct.size == 1 &&
              parts.map(_._1).sorted == (1 to parts.head._2) =>
          ClassicCkpt(v, parts.sortBy(_._1).map(p =>
            new Path(logDir(table), p._3)).toSeq)
      }
    val v2: Option[Ckpt] = v2ByVersion.toSeq
      .filter(e => maxVersion.forall(e._1 <= _))
      .sortBy(-_._1).headOption.map { case (v, files) =>
        // multiple writers may race the same version with different
        // uuids — any one is a complete checkpoint; pick
        // deterministically
        val (name, json) = files.sortBy(_._1).head
        V2Ckpt(v, new Path(logDir(table), name), json)
      }
    (classic.toSeq ++ v2.toSeq).sortBy(-_.version).headOption
  }

  /** Protocol gate + latest metaData from a checkpoint-shaped
    * DataFrame (classic parts or a v2 top-level parquet file).
    */
  private def parquetProtocolAndMeta(df: DataFrame, table: String)
      : (Option[StructType], Seq[String], Map[String, String]) = {
    import org.apache.spark.sql.functions.col
    val cols = df.columns.toSet
    if (cols.contains("protocol")) {
      df.filter(col("protocol").isNotNull).select("protocol.*")
        .collect().foreach { r =>
          val feats =
            if (r.schema.fieldNames.contains("readerFeatures") &&
                !r.isNullAt(r.fieldIndex("readerFeatures")))
              r.getSeq[String](r.fieldIndex("readerFeatures")).toSet
            else Set.empty[String]
          checkProtocol(table, r.getAs[Int]("minReaderVersion"), feats)
        }
    }
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Seq.empty
    var config: Map[String, String] = Map.empty
    if (cols.contains("metaData")) {
      df.filter(col("metaData").isNotNull).select("metaData.*")
        .collect().foreach { r =>
          schema = Some(DataType.fromJson(
            r.getAs[String]("schemaString")).asInstanceOf[StructType])
          partCols = Option(r.getSeq[String](
            r.fieldIndex("partitionColumns"))).map(_.toSeq)
            .getOrElse(Seq.empty)
          config = Option(r.getMap[String, String](
            r.fieldIndex("configuration"))).map(_.toMap)
            .getOrElse(Map.empty)
        }
    }
    (schema, partCols, config)
  }

  /** Collect a checkpoint-shaped DataFrame's add rows into `live`
    * (no-op when the frame carries no add column). A checkpoint's add
    * rows ARE the live files; its remove rows are expired-tombstone
    * bookkeeping. Driver-side collect of (path, partitionValues,
    * deletionVector, stats) per live file — the same O(files) driver
    * footprint the log replay itself carries.
    */
  private def parquetAdds(df: DataFrame,
      live: scala.collection.mutable.LinkedHashMap[String, LiveFile])
      : Unit = {
    import org.apache.spark.sql.functions.col
    if (!df.columns.contains("add")) return
    val addSchema = df.schema("add").dataType
      .asInstanceOf[StructType]
    val hasDv = addSchema.fieldNames.contains("deletionVector")
    val hasStats = addSchema.fieldNames.contains("stats")
    val cols0 = Seq(col("add.path"), col("add.partitionValues")) ++
      (if (hasDv) Seq(col("add.deletionVector")) else Nil) ++
      (if (hasStats) Seq(col("add.stats")) else Nil)
    val dvIdx = 2
    val statsIdx = if (hasDv) 3 else 2
    val selected = df.filter(col("add").isNotNull).select(cols0: _*)
    selected.collect().foreach { r =>
      val path = r.getString(0)
      val pv = Option(r.getMap[String, String](1))
        .map(_.toMap).getOrElse(Map.empty[String, String])
        .map { case (k, v) => k -> Option(v) }
      val dv =
        if (hasDv && !r.isNullAt(dvIdx)) {
          val d = r.getStruct(dvIdx)
          Some(DeletionVectors.DvDescriptor(
            d.getAs[String]("storageType"),
            d.getAs[String]("pathOrInlineDv"),
            if (d.schema.fieldNames.contains("offset") &&
                !d.isNullAt(d.fieldIndex("offset")))
              Some(d.getAs[Number]("offset").longValue())
            else None,
            d.getAs[Number]("sizeInBytes").intValue(),
            d.getAs[Number]("cardinality").longValue()))
        } else None
      val stats =
        if (hasStats && !r.isNullAt(statsIdx))
          Option(r.getString(statsIdx)).filter(_.nonEmpty)
        else None
      live.put(path, LiveFile(path, pv, dv, stats))
    }
  }

  /** A commit/checkpoint `add` action node → [[LiveFile]]. */
  private def addFromNode(
      a: com.fasterxml.jackson.databind.JsonNode): LiveFile = {
    import scala.jdk.CollectionConverters._
    val pv = Option(a.get("partitionValues"))
      .map(_.properties().asScala.map { e =>
        e.getKey ->
          (if (e.getValue.isNull) None
           else Some(e.getValue.asText()))
      }.toMap).getOrElse(Map.empty[String, Option[String]])
    val dv = Option(a.get("deletionVector"))
      .filterNot(_.isNull).map { d =>
        DeletionVectors.DvDescriptor(
          d.get("storageType").asText(),
          d.get("pathOrInlineDv").asText(),
          Option(d.get("offset")).filterNot(_.isNull)
            .map(_.asLong()),
          d.get("sizeInBytes").asInt(),
          d.get("cardinality").asLong())
      }
    val stats = Option(a.get("stats")).filterNot(_.isNull)
      .map(_.asText()).filter(_.nonEmpty)
    LiveFile(a.get("path").asText(), pv, dv, stats)
  }

  /** Load the base state from a checkpoint: classic parquet (single or
    * multi-part), or a v2 checkpoint (Delta 3.x `v2Checkpoint`
    * feature) — a UUID-named json/parquet TOP-LEVEL file carrying
    * protocol, metaData, a `checkpointMetadata` action whose version
    * must match the file name, optionally inline file actions, and
    * `sidecar` actions naming parquet files under `_delta_log/
    * _sidecars/` that carry the rest of the file actions. A missing
    * sidecar or a checkpointMetadata mismatch REFUSES — the top file
    * commits the checkpoint, so an incomplete one is corruption, not
    * an in-progress upload.
    */
  private def loadCheckpoint(spark: SparkSession, table: String,
      cp: Ckpt,
      live: scala.collection.mutable.LinkedHashMap[String, LiveFile])
      : (Option[StructType], Seq[String], Map[String, String]) =
    cp match {
      case ClassicCkpt(_, parts) =>
        val df = spark.read.parquet(parts.map(_.toString): _*)
        require(df.columns.contains("add"),
          s"checkpoint at $table carries no add column — not a " +
            "classic checkpoint; refusing")
        val meta = parquetProtocolAndMeta(df, table)
        parquetAdds(df, live)
        meta
      case V2Ckpt(version, file, json) =>
        val fs = CdcApply.fsFor(spark, table)
        val sidecarDir = new Path(logDir(table), "_sidecars")
        var ckptMetaVersion: Option[Long] = None
        var sidecars: Seq[String] = Seq.empty
        val meta =
          if (json) {
            import scala.jdk.CollectionConverters._
            val in = fs.open(file)
            val text = new String(
              org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
            in.close()
            var schema: Option[StructType] = None
            var partCols: Seq[String] = Seq.empty
            var config: Map[String, String] = Map.empty
            text.linesIterator.filter(_.nonEmpty).foreach { line =>
              val n = mapper.readTree(line)
              if (n.has("protocol")) {
                val p = n.get("protocol")
                checkProtocol(table,
                  p.get("minReaderVersion").asInt(),
                  Option(p.get("readerFeatures"))
                    .map(_.elements().asScala.map(_.asText()).toSet)
                    .getOrElse(Set.empty[String]))
              }
              if (n.has("metaData")) {
                val md = n.get("metaData")
                schema = Some(DataType.fromJson(
                  md.get("schemaString").asText())
                  .asInstanceOf[StructType])
                partCols = Option(md.get("partitionColumns"))
                  .map(_.elements().asScala.map(_.asText()).toSeq)
                  .getOrElse(Seq.empty)
                config = Option(md.get("configuration"))
                  .map(_.properties().asScala.map(e =>
                    e.getKey -> e.getValue.asText()).toMap)
                  .getOrElse(Map.empty)
              }
              if (n.has("checkpointMetadata"))
                ckptMetaVersion = Some(
                  n.get("checkpointMetadata").get("version").asLong())
              if (n.has("sidecar"))
                sidecars :+= n.get("sidecar").get("path").asText()
              if (n.has("add")) {
                val f = addFromNode(n.get("add"))
                live.put(f.path, f)
              }
            }
            (schema, partCols, config)
          } else {
            val df = spark.read.parquet(file.toString)
            val m = parquetProtocolAndMeta(df, table)
            import org.apache.spark.sql.functions.col
            if (df.columns.contains("checkpointMetadata"))
              df.filter(col("checkpointMetadata").isNotNull)
                .select("checkpointMetadata.version").collect()
                .foreach(r => ckptMetaVersion =
                  Some(r.getAs[Number](0).longValue()))
            if (df.columns.contains("sidecar"))
              sidecars = df.filter(col("sidecar").isNotNull)
                .select("sidecar.path").collect()
                .map(_.getString(0)).toSeq
            parquetAdds(df, live)
            m
          }
        require(ckptMetaVersion.contains(version),
          s"v2 checkpoint ${file.getName} at $table carries " +
            s"checkpointMetadata version ${ckptMetaVersion
              .fold("<none>")(_.toString)} != file-name version " +
            s"$version — refusing a checkpoint that cannot prove " +
            "its own identity")
        sidecars.foreach { name =>
          val p = new Path(sidecarDir, name)
          if (!fs.exists(p))
            throw new IllegalStateException(
              s"v2 checkpoint ${file.getName} at $table references " +
                s"missing sidecar $name — the checkpoint is " +
                "incomplete; refusing rather than serving a " +
                "silently partial table")
          parquetAdds(spark.read.parquet(p.toString), live)
        }
        meta
    }

  private def replayLog(spark: SparkSession, table: String,
      vs: Seq[Long], versionAsOf: Option[Long] = None): LogState = {
    import scala.jdk.CollectionConverters._
    val fs = CdcApply.fsFor(spark, table)
    val live = scala.collection.mutable.LinkedHashMap[String, LiveFile]()
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Seq.empty
    var config: Map[String, String] = Map.empty
    // REAL aged tables checkpoint the log and DELETE the JSON commits
    // the checkpoint covers — replaying only the surviving JSONs
    // would silently lose those commits' adds. Base the state on the
    // newest complete checkpoint when one exists, then require the
    // JSON tail to be CONTIGUOUS through the head (a gap with no
    // covering checkpoint is a truncated log: refuse, never misread).
    // VERSION AS OF replays the same way with everything past the
    // requested version out of scope; a version older than the oldest
    // reconstructable state refuses (its commits are gone).
    val available = math.max(
      latestCheckpoint(spark, table).map(_.version).getOrElse(-1L),
      vs.lastOption.getOrElse(-1L))
    versionAsOf.foreach(v => require(v >= 0 && v <= available,
      s"version $v of the Delta table at $table is not available " +
        s"(log head is $available)"))
    // VERSION AS OF may fall between two checkpoints: base on the
    // newest COMPLETE checkpoint at-or-below the requested version
    // (not the global newest filtered away), so aged logs whose
    // early JSONs were cleaned under an older checkpoint still serve
    // the read
    val cp = latestCheckpoint(spark, table, versionAsOf)
    val cpV = cp.map(_.version).getOrElse(-1L)
    val tail = vs.filter(v => v > cpV && versionAsOf.forall(v <= _))
    val head = versionAsOf.getOrElse(
      math.max(cpV, vs.lastOption.getOrElse(-1L)))
    val expected = ((cpV + 1) to head).toSeq
    if (tail != expected) {
      val missing = (expected.toSet -- tail.toSet).toSeq.sorted
      throw new IllegalStateException(
        s"Delta log at $table is missing commit files for versions " +
          s"${missing.take(5).mkString(", ")}" +
          (if (missing.size > 5) ", ..." else "") +
          " with no covering checkpoint — " +
          versionAsOf.fold("the log is truncated")(v =>
            s"version $v is not reconstructable") +
          "; refusing rather than serving a silently incomplete table")
    }
    cp.foreach { c =>
      val (s, pc, cfg) = loadCheckpoint(spark, table, c, live)
      schema = s.orElse(schema)
      partCols = pc
      config = cfg
    }
    tail.foreach { v =>
      val in = fs.open(versionFile(table, v))
      val text = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      in.close()
      // actions within ONE commit are reconciled per the protocol
      // with NO intra-commit ordering guarantee: a DV update may
      // serialize the add (new vector) before the remove (old
      // vector) of the same path. Buffer the commit's file actions,
      // then apply removes first and adds last — line order inside
      // the commit never decides whether a file survives.
      val commitAdds =
        scala.collection.mutable.LinkedHashMap[String, LiveFile]()
      val commitRemoves =
        scala.collection.mutable.LinkedHashSet[String]()
      text.linesIterator.filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("protocol")) {
          val p = n.get("protocol")
          checkProtocol(table, p.get("minReaderVersion").asInt(),
            Option(p.get("readerFeatures"))
              .map(_.elements().asScala.map(_.asText()).toSet)
              .getOrElse(Set.empty[String]))
        }
        if (n.has("metaData")) {
          val md = n.get("metaData")
          schema = Some(DataType.fromJson(
            md.get("schemaString").asText()).asInstanceOf[StructType])
          partCols = Option(md.get("partitionColumns"))
            .map(_.elements().asScala.map(_.asText()).toSeq)
            .getOrElse(Seq.empty)
          config = Option(md.get("configuration"))
            .map(_.properties().asScala.map(e =>
              e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty)
        }
        if (n.has("add")) {
          val f = addFromNode(n.get("add"))
          commitAdds.put(f.path, f)
        }
        if (n.has("remove")) commitRemoves +=
          n.get("remove").get("path").asText()
      }
      commitRemoves.foreach(live.remove)
      commitAdds.foreach { case (p, f) => live.put(p, f) }
    }
    LogState(schema, partCols, config, live.values.toSeq)
  }

  /** Table-relative live file paths after replaying `vs` in order. */
  private def readLiveFiles(spark: SparkSession, table: String,
      vs: Seq[Long]): Seq[String] =
    replayLog(spark, table, vs).files.map(_.path)

  /** TIMESTAMP AS OF resolution: the latest commit whose instant is
    * at-or-before `ts` (epoch millis), per the protocol's reader
    * rules — a commit's instant is its `commitInfo.inCommitTimestamp`
    * when the log carries one (authoritative under the
    * inCommitTimestamp feature), else the commit FILE's modification
    * time; instants are then adjusted to be strictly increasing
    * (max(own, previous + 1ms), the same monotonicity repair every
    * Delta reader applies, so a clock-skewed writer cannot make time
    * travel non-deterministic). Refuses when `ts` predates the first
    * SURVIVING commit — commits cleaned up under a checkpoint have no
    * recoverable instants, and guessing would misread.
    */
  private def resolveTimestamp(spark: SparkSession, table: String,
      vs: Seq[Long], ts: Long): Long = {
    val fs = CdcApply.fsFor(spark, table)
    require(vs.nonEmpty,
      s"timestampAsOf over $table: no commit JSONs survive (the log " +
        "is checkpoint-only) — commit instants are unrecoverable; " +
        "use versionAsOf")
    val raw = vs.map { v =>
      val p = versionFile(table, v)
      val in = fs.open(p)
      val text = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      in.close()
      val ict = text.linesIterator.filter(_.nonEmpty).flatMap { line =>
        val n = mapper.readTree(line)
        Option(n.get("commitInfo")).flatMap(ci =>
          Option(ci.get("inCommitTimestamp")).filterNot(_.isNull)
            .map(_.asLong()))
      }.nextOption()
      (v, ict.getOrElse(fs.getFileStatus(p).getModificationTime))
    }
    val adjusted = raw.tail.scanLeft(raw.head) {
      case ((_, prev), (v, t)) => (v, math.max(t, prev + 1))
    }
    val at = adjusted.filter(_._2 <= ts)
    require(at.nonEmpty,
      s"timestamp $ts is before the first available commit of the " +
        s"Delta table at $table (earliest surviving instant is " +
        s"${adjusted.head._2} at version ${adjusted.head._1}; earlier " +
        "commits, if any, were cleaned up) — refusing rather than " +
        "guessing")
    at.last._1
  }

  // ---- metadata-level file pruning on a `where` predicate -------------
  // (shared satisfiability logic lives in [[MetaPrune]])

  /** Per-file add-action stats, top-level columns only. Delta
    * truncates long string bounds SOUNDLY (min truncated down, max
    * padded up), so interval pruning on them stays a superset.
    */
  private case class AddStats(numRecords: Option[Long],
      min: Map[String, String], max: Map[String, String],
      nullCount: Map[String, Long])

  private def parseStats(s: String): Option[AddStats] =
    scala.util.Try {
      val n = mapper.readTree(s)
      import scala.jdk.CollectionConverters._
      def m(field: String): Map[String, String] =
        Option(n.get(field)).map(_.properties().asScala.collect {
          case e if !e.getValue.isNull && e.getValue.isValueNode =>
            e.getKey -> e.getValue.asText()
        }.toMap).getOrElse(Map.empty)
      AddStats(
        Option(n.get("numRecords")).filterNot(_.isNull).map(_.asLong()),
        m("minValues"), m("maxValues"),
        Option(n.get("nullCount")).map(_.properties().asScala.collect {
          case e if e.getValue.isNumber =>
            e.getKey -> e.getValue.asLong()
        }.toMap).getOrElse(Map.empty))
    }.toOption

  /** Keep the files a `where` predicate can match, deciding from LOG
    * METADATA alone: partition values are exact point intervals, data
    * columns use the add-action stats intervals (conservative —
    * missing stats, unsupported conjunct shapes, or incomparable
    * types keep the file). A file is dropped only when some top-level
    * conjunct is PROVABLY unsatisfiable on it, so the kept set is
    * always a superset of the matching files; the caller re-applies
    * the predicate as a row filter.
    */
  private def pruneFiles(spark: SparkSession, files: Seq[LiveFile],
      declared: StructType, partitionColumns: Seq[String],
      whereSql: String): Seq[LiveFile] = {
    import MetaPrune.{Cmp, NullTest}
    val partSet = partitionColumns.toSet
    val byName = declared.fields.map(f => f.name -> f).toMap
    val tests = MetaPrune.conjunctTests(spark, whereSql)
    if (tests.isEmpty) return files
    files.filter { f =>
      lazy val stats = f.stats.flatMap(parseStats)
      tests.forall {
        case Cmp(n, op, l) if partSet(n) =>
          byName.get(n).forall { fld =>
            f.partitionValues.get(n)
              .orElse(f.partitionValues.get(
                scala.util.Try(fld.metadata.getString(
                  "delta.columnMapping.physicalName")).getOrElse(n)))
              .fold(true) {
                case None => false // all-null partition: no row passes
                case Some(raw) =>
                  (MetaPrune.boundKey(fld.dataType, raw),
                    MetaPrune.litKey(fld.dataType, l)) match {
                      case (Some(v), Some(k)) =>
                        MetaPrune.satisfiable(op, Some(v), Some(v), k)
                      case _ => true
                    }
              }
          }
        case Cmp(n, op, l) =>
          byName.get(n).forall { fld =>
            stats.fold(true) { st =>
              // all-null column in this file: no comparison passes
              val allNull = (st.numRecords, st.nullCount.get(n)) match {
                case (Some(r), Some(c)) => r > 0 && c == r
                case _ => false
              }
              if (allNull) false
              else MetaPrune.litKey(fld.dataType, l).fold(true) { k =>
                MetaPrune.satisfiable(op,
                  st.min.get(n).flatMap(
                    MetaPrune.boundKey(fld.dataType, _)),
                  st.max.get(n).flatMap(
                    MetaPrune.boundKey(fld.dataType, _)), k)
              }
            }
          }
        case MetaPrune.InList(n, ls) if partSet(n) =>
          byName.get(n).forall { fld =>
            f.partitionValues.get(n)
              .orElse(f.partitionValues.get(
                scala.util.Try(fld.metadata.getString(
                  "delta.columnMapping.physicalName")).getOrElse(n)))
              .fold(true) {
                case None => false // all-null partition: no row passes
                case Some(raw) =>
                  MetaPrune.boundKey(fld.dataType, raw) match {
                    case Some(v) => MetaPrune.anySatisfiable(
                      fld.dataType, ls, Some(v), Some(v))
                    case None => true
                  }
              }
          }
        case MetaPrune.InList(n, ls) =>
          byName.get(n).forall { fld =>
            stats.fold(true) { st =>
              val allNull = (st.numRecords, st.nullCount.get(n)) match {
                case (Some(r), Some(c)) => r > 0 && c == r
                case _ => false
              }
              if (allNull) false
              else MetaPrune.anySatisfiable(fld.dataType, ls,
                st.min.get(n).flatMap(
                  MetaPrune.boundKey(fld.dataType, _)),
                st.max.get(n).flatMap(
                  MetaPrune.boundKey(fld.dataType, _)))
            }
          }
        case NullTest(n, isNull) if partSet(n) =>
          f.partitionValues.get(n).fold(true)(v =>
            if (isNull) v.isEmpty else v.nonEmpty)
        case NullTest(n, isNull) =>
          stats.fold(true) { st =>
            (st.numRecords, st.nullCount.get(n)) match {
              case (Some(r), Some(c)) =>
                if (isNull) c > 0 else c < r
              case _ => true
            }
          }
      }
    }
  }

  /** CONTINUOUS export: a Structured Streaming query tailing the CDC
    * table's changelog whose every micro-batch runs one
    * [[exportIncremental]] sync — the changelog events are the WAKE
    * SIGNAL (their content is not re-derived; the sync reads the
    * manifest), so the Delta mirror follows the table with per-batch
    * latency at O(changed buckets) per sync, the
    * [[CdcApply.syncMirror]] pattern pointed at the open ecosystem.
    * Requires a changelog-enabled table. Caller owns the returned
    * query's lifecycle (trigger/checkpoint via `options`).
    */
  def startContinuousExport(spark: SparkSession, cdcRoot: String,
      deltaDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val feed = CdcApply.readChangesStream(spark, cdcRoot).getOrElse(
      throw new IllegalArgumentException(
        s"continuous export needs a changelog-enabled table at " +
          s"$cdcRoot (applyBatch(changelog = true))"))
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the changelog file lands BEFORE the manifest pointer flips,
        // so the wake signal can outrun the commit: wait (bounded)
        // until the head covers this micro-batch's newest change
        // batch, then sync — the export itself reads the manifest
        val target = batch
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions
              .col(CdcApply.ChangeBatchCol)))
          .head()
        if (!target.isNullAt(0)) {
          val want = target.getLong(0)
          val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
          while (!CdcApply.currentVersion(spark, cdcRoot)
              .exists(_ >= want) && System.nanoTime() < deadline)
            Thread.sleep(25)
        }
        exportIncremental(spark, cdcRoot, deltaDir)
        ()
      }
      .start()
  }

  /** VACUUM for an exported table — the Delta maintenance op: delete
    * every data file under the table dir that the CURRENT live set no
    * longer references (files a later commit removed). Time travel to
    * the versions that referenced them stops resolving, exactly as
    * Delta's VACUUM documents; the log itself is retained (it is the
    * table's history, and it is small). Returns the deleted paths.
    * Driver-side metadata work + one delete per dead file.
    */
  /** MERGE-ON-READ export — the Delta twin of [[IcebergV2]]'s O(batch)
    * sync, using DELETION VECTORS instead of equality delete files
    * (Delta has no equality deletes; DVs are its MOR primitive). The
    * bucket-incremental exporter ([[exportIncremental]]) must REWRITE
    * every bucket a trickle batch touches — O(bucket) parquet per
    * sync; this export writes per sync only
    *  - ONE new data file holding the current images of the touched
    *    keys, and
    *  - per prior file holding an OLD image of a touched key, a
    *    deletion-vector update (same path re-added with the file's
    *    DV unioned with the new dead row indexes — the protocol's
    *    DV-update commit shape),
    * so data work is **O(changed rows)**, independent of bucket or
    * table size. Old-image row indexes resolve through ONE
    * metadata-attached scan of the live files semi-joined (broadcast)
    * to the touched keys — O(table) read at most, zero rewrite; the
    * collected (file, index) set is O(changed rows).
    *
    * Correct-by-idempotence: a crash between the log commit and the
    * state write re-syncs the same change window — every current
    * image of a touched key (including the previous sync's own adds)
    * gets DV-deleted and re-added fresh, so the net state is
    * unchanged. Returns the committed version, None when the CDC
    * table hasn't moved. Own lineage only: a log without this
    * exporter's state sidecar refuses (mixing writers would corrupt
    * both). Deletes resolve via the CDC stamp feed
    * ([[CdcApply.changesSince]]), so the source table must retain
    * stamps back to the last sync.
    */
  def exportMor(spark: SparkSession, cdcRoot: String,
      deltaDir: String): Option[Long] = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import scala.jdk.CollectionConverters._
    val fs = CdcApply.fsFor(spark, deltaDir)
    val conf = CdcApply.tableConfOf(spark, cdcRoot).getOrElse(
      throw new IllegalArgumentException(s"no CDC table at $cdcRoot"))
    val cur = CdcApply.currentVersion(spark, cdcRoot).getOrElse(
      throw new IllegalArgumentException(
        s"no committed batch at $cdcRoot"))
    val statePath = new Path(logDir(deltaDir), "_graft_mor_state.json")
    val vs = versions(spark, deltaDir)
    val hasLog =
      vs.nonEmpty || latestCheckpoint(spark, deltaDir).isDefined
    val state: Option[(Long, Long)] =
      if (!fs.exists(statePath)) None
      else {
        val in = fs.open(statePath)
        val text = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        in.close()
        val n = mapper.readTree(text)
        require(Option(n.get("format")).exists(_.asText() == "mor1"),
          s"unknown MOR export state format at $deltaDir")
        Some((n.get("lastBatch").asLong(), n.get("version").asLong()))
      }
    if (hasLog && state.isEmpty)
      throw new IllegalStateException(
        s"Delta log at $deltaDir carries no MOR export state — it " +
          "was written by another exporter (or a foreign writer); " +
          "exportMor requires its own lineage. Use a fresh directory.")
    val version = math.max(
      vs.lastOption.getOrElse(-1L),
      latestCheckpoint(spark, deltaDir).map(_.version)
        .getOrElse(-1L)) + 1L
    // crash-debris sweep: nothing committed can reference either
    val dataDir = new Path(deltaDir, s"mor/v$version")
    if (fs.exists(dataDir)) fs.delete(dataDir, true)
    val tmpLog = new Path(logDir(deltaDir), s".tmp-$version")
    if (fs.exists(tmpLog)) fs.delete(tmpLog, false)
    def writeState(lastBatch: Long, v: Long): Unit =
      IcebergInterop.replaceSmallFile(spark,
        new Path(logDir(deltaDir), s"._graft_mor_state-$v"), statePath,
        s"""{"format":"mor1","lastBatch":$lastBatch,"version":$v}"""
          .getBytes("UTF-8"))
    def commit(actions: Seq[String]): Unit = {
      val out = fs.create(tmpLog, false)
      out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
      out.close()
      if (!fs.rename(tmpLog, versionFile(deltaDir, version)))
        throw new IllegalStateException(
          s"concurrent Delta export lost the commit race for " +
            s"version $version of $deltaDir")
    }
    val node = mapper.createObjectNode _
    def metaAction(schema: StructType): String = {
      val meta = node()
      val m = meta.putObject("metaData")
      m.put("id", java.util.UUID
        .nameUUIDFromBytes(deltaDir.getBytes("UTF-8")).toString)
      m.put("schemaString", schema.json)
      val fmt = m.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      m.putArray("partitionColumns")
      m.putObject("configuration")
      m.put("createdTime", 0L)
      mapper.writeValueAsString(meta)
    }
    def addAction(path: String,
        dv: Option[DeletionVectors.DvDescriptor],
        stats: Option[String]): String = {
      val add = node()
      val a = add.putObject("add")
      a.put("path", path)
      a.put("size", 1L)
      a.putObject("partitionValues")
      a.put("modificationTime", 0L)
      a.put("dataChange", true)
      dv.foreach { d =>
        val dn = a.putObject("deletionVector")
        dn.put("storageType", d.storageType)
        dn.put("pathOrInlineDv", d.pathOrInlineDv)
        d.offset.foreach(o => dn.put("offset", o))
        dn.put("sizeInBytes", d.sizeInBytes)
        dn.put("cardinality", d.cardinality)
      }
      stats.foreach(s => a.put("stats", s))
      mapper.writeValueAsString(add)
    }
    def dataFileAdds(dir: Path): Seq[String] =
      fs.listStatus(dir).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => addAction(s"mor/v$version/${st.getPath.getName}",
          None, None))
    state match {
      case None =>
        // initial sync: the full snapshot, protocol declared v3 +
        // deletionVectors up front (every later sync emits DVs)
        val snap = CdcApply.readSnapshot(spark, cdcRoot).getOrElse(
          throw new IllegalArgumentException(
            s"CDC table at $cdcRoot has no readable snapshot"))
        snap.write.mode("errorifexists").parquet(dataDir.toString)
        val protocol = node()
        val p = protocol.putObject("protocol")
        p.put("minReaderVersion", 3)
        p.put("minWriterVersion", 7)
        p.putArray("readerFeatures").add("deletionVectors")
        p.putArray("writerFeatures").add("deletionVectors")
        commit(mapper.writeValueAsString(protocol) +:
          metaAction(snap.schema) +: dataFileAdds(dataDir))
        writeState(cur, version)
        Some(version)
      case Some((lastBatch, _)) if lastBatch >= cur => None
      case Some((lastBatch, _)) =>
        val feed = CdcApply.changesSince(spark, cdcRoot, lastBatch)
          .getOrElse(throw new IllegalStateException(
            s"CDC table at $cdcRoot serves no change feed — " +
              "exportMor needs the stamp feed to resolve deletes"))
        val keyCols = conf.keys
        val touched = feed.select(keyCols.map(col): _*).distinct()
        if (touched.isEmpty) { writeState(cur, version - 1); return None }
        val st = replayLog(spark, deltaDir,
          versions(spark, deltaDir))
        val declared = st.schema.getOrElse(
          throw new IllegalStateException(
            s"Delta log at $deltaDir carries no metaData action"))
        val logical = StructType(declared.fields.map(f => f.copy(
          metadata = org.apache.spark.sql.types.Metadata.empty)))
        // current images of the touched keys → ONE new data file set
        val snap = CdcApply.readSnapshot(spark, cdcRoot).getOrElse(
          throw new IllegalArgumentException(
            s"CDC table at $cdcRoot has no readable snapshot"))
        val newRows = snap.join(broadcast(touched), keyCols,
          "left_semi")
        newRows.write.mode("errorifexists").parquet(dataDir.toString)
        // OLD images of touched keys across every live file: one
        // metadata-attached scan, broadcast semi join, O(changed
        // rows) collected (file uri, row index) pairs
        val livePaths = st.files.map(f =>
          IcebergInterop.resolvePath(deltaDir, f.path).toString)
        val images = spark.read.schema(logical)
          .parquet(livePaths: _*)
          .withColumn("_mor_path", col("_metadata.file_path"))
          .withColumn("_mor_idx", col("_metadata.row_index"))
          .join(broadcast(touched), keyCols, "left_semi")
          .select(col("_mor_path"), col("_mor_idx"))
          .collect().map(r => (IcebergInterop.canonUriString(
            r.getString(0)), r.getLong(1)))
        val byFile = images.groupBy(_._1)
          .map { case (p, xs) => p -> xs.map(_._2).toSet }
        val fsq = CdcApply.fsFor(spark, deltaDir)
        val liveByCanon = st.files.map(f =>
          IcebergInterop.canonUriString(fsq.makeQualified(
            IcebergInterop.resolvePath(deltaDir, f.path)).toString)
            -> f).toMap
        val hconf = spark.sparkContext.hadoopConfiguration
        val dvUpdates = byFile.toSeq.sortBy(_._1).map {
          case (canon, deadIdx) =>
            val f = liveByCanon.getOrElse(canon,
              throw new IllegalStateException(
                s"scanned file $canon not in the live set of " +
                  s"$deltaDir — concurrent writer?"))
            val existing = f.dv.map(d => DeletionVectors
              .deletedRows(deltaDir, d, hconf).toSet)
              .getOrElse(Set.empty[Long])
            val merged = (existing ++ deadIdx).toSeq.sorted
            val payload = DeletionVectors.encodePayload(merged)
            val desc =
              if (payload.length <= 512) {
                val padded = java.util.Arrays.copyOf(payload,
                  ((payload.length + 3) / 4) * 4)
                DeletionVectors.DvDescriptor("i",
                  DeletionVectors.z85Encode(padded), None,
                  payload.length, merged.size.toLong)
              } else {
                val uuid = java.util.UUID.nameUUIDFromBytes(
                  s"$version:${f.path}".getBytes("UTF-8"))
                val bb = java.nio.ByteBuffer.allocate(16)
                bb.putLong(uuid.getMostSignificantBits)
                bb.putLong(uuid.getLeastSignificantBits)
                val off = DeletionVectors.writeDvFile(spark,
                  new Path(deltaDir, s"deletion_vector_$uuid.bin"),
                  payload)
                DeletionVectors.DvDescriptor("u",
                  DeletionVectors.z85Encode(bb.array()), Some(off),
                  payload.length, merged.size.toLong)
              }
            (f, desc)
        }
        val removesAndReadds = dvUpdates.flatMap { case (f, desc) =>
          val rm = node()
          val r = rm.putObject("remove")
          r.put("path", f.path)
          r.put("dataChange", true)
          Seq(mapper.writeValueAsString(rm),
            addAction(f.path, Some(desc), f.stats))
        }
        commit(metaAction(snap.schema) +: (removesAndReadds ++
          dataFileAdds(dataDir)))
        writeState(cur, version)
        Some(version)
    }
  }

  /** Write a CLASSIC single-part parquet checkpoint of the log's
    * state at its head version, plus the advisory `_last_checkpoint`
    * pointer — the aging move every real Delta writer makes: without
    * it a continuously-exported table replays O(total commits) of
    * JSON on every read; with it, reads base on the checkpoint and
    * replay only the tail. With `truncate = true` the JSON commits
    * the checkpoint covers are DELETED afterwards (readers refuse a
    * gap only when no covering checkpoint exists, so this is safe by
    * the reader's own contract; time travel BEHIND the checkpoint
    * becomes unreconstructable — same trade as Delta's log
    * retention). The checkpoint rides the reader's own protocol
    * knowledge: protocol row derived from the state's features
    * (deletion vectors → v3 + feature name, column mapping → v2),
    * add rows carry partitionValues, deletionVector descriptors, and
    * stats. Commit = one atomic rename; a concurrent export is safe
    * (the checkpoint describes a committed version; newer commits
    * simply replay on top). Returns the checkpointed version.
    */
  def checkpointLog(spark: SparkSession, table: String,
      truncate: Boolean = false): Long = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val fs = CdcApply.fsFor(spark, table)
    val vs = versions(spark, table)
    require(vs.nonEmpty || latestCheckpoint(spark, table).isDefined,
      s"no Delta log at $table")
    val head = math.max(
      latestCheckpoint(spark, table).map(_.version).getOrElse(-1L),
      vs.lastOption.getOrElse(-1L))
    val st = replayLog(spark, table, vs)
    val declared = st.schema.getOrElse(throw new IllegalStateException(
      s"Delta log at $table carries no metaData action"))
    val anyDv = st.files.exists(_.dv.isDefined)
    val mapped =
      st.config.getOrElse("delta.columnMapping.mode", "none") != "none"
    val (minR, minW, feats) =
      if (anyDv) (3, 7, Seq("deletionVectors") ++
        (if (mapped) Seq("columnMapping") else Nil))
      else if (mapped) (2, 5, Seq.empty[String])
      else (1, 2, Seq.empty[String])
    val dvType = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", LongType),
      StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
    val cpSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration",
          MapType(StringType, StringType))))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues",
          MapType(StringType, StringType, valueContainsNull = true)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("deletionVector", dvType),
        StructField("stats", StringType))))))
    val rows: Seq[Row] = Seq(
      Row(Row(minR, minW, if (feats.isEmpty) null else feats),
        null, null),
      Row(null, Row(java.util.UUID.nameUUIDFromBytes(
        table.getBytes("UTF-8")).toString,
        declared.json, st.partitionColumns,
        st.config), null)) ++
      st.files.map { f =>
        val dv = f.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
          d.offset.map(Long.box).orNull, d.sizeInBytes,
          d.cardinality)).orNull
        Row(null, null, Row(f.path,
          f.partitionValues.map { case (k, v) => k -> v.orNull },
          0L, 0L, false, dv, f.stats.orNull))
      }
    val tmpDir = new Path(logDir(table), s".cptmp-$head")
    if (fs.exists(tmpDir)) fs.delete(tmpDir, true)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), cpSchema)
      .coalesce(1).write.parquet(tmpDir.toString)
    val part = fs.listStatus(tmpDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).getOrElse(
        throw new IllegalStateException("checkpoint write produced " +
          s"no parquet part under $tmpDir"))
    val dest = new Path(logDir(table),
      f"$head%020d.checkpoint.parquet")
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(part, dest))
      throw new IllegalStateException(
        s"checkpoint rename failed for version $head of $table")
    fs.delete(tmpDir, true)
    // advisory pointer (this reader trusts the listing; foreign
    // readers use it to skip the listing)
    IcebergInterop.replaceSmallFile(spark,
      new Path(logDir(table), s"._last_checkpoint-$head"),
      new Path(logDir(table), "_last_checkpoint"),
      s"""{"version":$head,"size":${rows.size}}"""
        .getBytes("UTF-8"))
    if (truncate)
      vs.filter(_ <= head).foreach { v =>
        fs.delete(versionFile(table, v), false)
        val crc = new Path(logDir(table), f".$v%020d.json.crc")
        if (fs.exists(crc)) fs.delete(crc, false)
      }
    head
  }

  def vacuumExport(spark: SparkSession, table: String): Seq[String] = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no Delta log at $table")
    val fs = CdcApply.fsFor(spark, table)
    val live = readLiveFiles(spark, table, vs).toSet
    val head = vs.max
    val dead = scala.collection.mutable.ArrayBuffer[String]()
    // data files live under the exporter's v<N>/ dirs only — never
    // touch _delta_log or foreign layout conventions. Dirs ABOVE the
    // log head are an in-flight export's uncommitted data (written
    // before its log rename): deleting them would let a concurrent
    // export commit a version referencing missing files, so vacuum
    // skips them — they are either about to be committed or will be
    // swept by that version's own clearAborted on the next retry.
    fs.listStatus(new Path(table)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .filter(_.getPath.getName.stripPrefix("v").toLong <= head)
      .foreach { dir =>
        def walk(p: Path): Unit =
          fs.listStatus(p).foreach { st =>
            if (st.isDirectory) walk(st.getPath)
            else if (st.getPath.getName.endsWith(".parquet")) {
              val rel = st.getPath.toString
                .stripPrefix(fs.makeQualified(new Path(table)).toString)
                .stripPrefix("/")
              if (!live.contains(rel)) {
                fs.delete(st.getPath, false)
                dead += rel
              }
            }
          }
        walk(dir.getPath)
      }
    dead.toSeq
  }

  /** Read a Delta table (this exporter's or any protocol-1/2 writer's,
    * plus v3 tables within [[SupportedReaderFeatures]]): replay the
    * log, scan the live files under the declared schema. An empty
    * live set yields an empty frame WITH the schema.
    *
    * PARTITIONED tables (the most common real-world Delta shape): the
    * data files OMIT partition columns — their values are log
    * metadata, each add-action's string-serialized `partitionValues`
    * (PROTOCOL.md "Partition Value Serialization"). The reader groups
    * the live files by partition tuple, reconstructs each group's
    * partition columns as typed literals (cast per the declared
    * schema; JSON null → NULL), and unions the groups. Because each
    * group's partition columns are LITERALS, a filter over them
    * constant-folds per branch and Catalyst prunes non-matching
    * groups to empty relations — hive-style partition pruning for
    * free, no custom pushdown. Timestamp partition values cast under
    * the session timezone (the protocol serializes them without a
    * zone). Under column mapping the `partitionValues` keys are the
    * PHYSICAL column names; the reader resolves physical first, then
    * logical. Binary partition columns refuse (their string
    * serialization is writer-ambiguous — never misread).
    */
  def readDelta(spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None,
      where: Option[String] = None,
      timestampAsOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val vs = versions(spark, table)
    // a fully-checkpointed log may have had ALL its JSON commits
    // cleaned up — the checkpoint alone is a complete table
    require(vs.nonEmpty || latestCheckpoint(spark, table).isDefined,
      s"no Delta log at $table")
    val pinned = timestampAsOf
      .map(resolveTimestamp(spark, table, vs, _)).orElse(versionAsOf)
    val st = replayLog(spark, table, vs, pinned)
    val declared = st.schema.getOrElse(
      throw new IllegalStateException(
        s"Delta log at $table carries no metaData action"))
    val partSet = st.partitionColumns.toSet
    val unknownPart = partSet -- declared.fieldNames.toSet
    require(unknownPart.isEmpty,
      s"Delta table $table declares partition columns " +
        s"${unknownPart.mkString(", ")} absent from its schema")
    val partFields = st.partitionColumns.map(c =>
      declared.fields.find(_.name == c).get)
    partFields.foreach(f =>
      require(f.dataType != org.apache.spark.sql.types.BinaryType,
        s"binary partition column '${f.name}' in $table: its string " +
          "serialization is writer-ambiguous — refusing rather than " +
          "misreading"))
    val dataFields = declared.fields.filterNot(f => partSet(f.name))
    // `where` prunes the FILE LIST at the metadata level before any
    // scan or vector decode: exact on partition values, conservative
    // on add-action stats intervals ([[pruneFiles]]); the same
    // predicate still applies as a row filter below, so pruning can
    // only cut cost, never change results
    val liveFiles: Seq[LiveFile] = where.fold(st.files)(w =>
      pruneFiles(spark, st.files, declared, st.partitionColumns, w))
    // the logical shape callers see: column-mapping bookkeeping is
    // reader-internal, never surfaced
    val logical = StructType(declared.fields.map(f =>
      f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
    if (liveFiles.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logical)
    val mode = st.config.getOrElse("delta.columnMapping.mode", "none")
    if (mode != "none") {
      require(mode == "name" || mode == "id",
        s"unknown delta.columnMapping.mode '$mode' in $table")
      // reader protocol v2/v3 column mapping: files store columns
      // under PHYSICAL names (and, in id mode, parquet field ids) —
      // the rename-without-rewrite move. Top-level primitive columns
      // only; nested mapped fields need per-level resolution this
      // reader does not implement — refuse.
      declared.fields.foreach { f =>
        require(!f.dataType.isInstanceOf[StructType] &&
          !f.dataType.typeName.startsWith("array") &&
          !f.dataType.typeName.startsWith("map"),
          s"column mapping over nested column '${f.name}' " +
            s"(${f.dataType.simpleString}) is not supported — " +
            "top-level primitive columns only")
      }
    }
    // deletion vectors: any live file carrying one makes every scan
    // attach its file/row-index metadata for the anti-join below
    val anyDv = liveFiles.exists(_.dv.isDefined)
    def physicalName(f: StructField): String =
      if (mode == "none") f.name
      else {
        require(f.metadata.contains("delta.columnMapping.physicalName"),
          s"column '${f.name}' lacks delta.columnMapping.physicalName")
        f.metadata.getString("delta.columnMapping.physicalName")
      }
    // partition tuple per live file (string-serialized; column-mapped
    // writers key partitionValues by PHYSICAL name). Computed up
    // front: the branch-vs-join layout decision below also decides
    // whether scans must attach file metadata.
    def tupleOf(f: LiveFile): Seq[Option[String]] =
      partFields.map { pf =>
        f.partitionValues.get(physicalName(pf))
          .orElse(f.partitionValues.get(pf.name)).getOrElse(
            throw new IllegalStateException(
              s"add action for ${f.path} in $table carries no " +
                s"partition value for '${pf.name}' — protocol " +
                "violation"))
      }
    val groups: Seq[(Seq[Option[String]], Seq[LiveFile])] =
      if (st.partitionColumns.isEmpty) Seq.empty
      else liveFiles.map(f => (tupleOf(f), f)).groupBy(_._1)
        .toSeq.sortBy(_._1.toString)
        .map { case (t, m) => (t, m.map(_._2)) }
    // above this bound, one union branch per partition tuple stops
    // being a plan and starts being a plan EXPLOSION (Catalyst pays
    // per branch); the join fallback keeps O(1) plan nodes at any
    // partition count
    val MaxLiteralGroups = 128
    val useJoinFallback = groups.size > MaxLiteralGroups
    val attachMeta = anyDv || useJoinFallback
    val helperCols =
      if (attachMeta) Seq("_dv_path", "_dv_idx") else Seq.empty[String]
    helperCols.foreach(h => require(!declared.fieldNames.contains(h),
      s"column name '$h' is reserved by this reader"))
    def withMeta(df: DataFrame): DataFrame =
      if (attachMeta)
        df.withColumn("_dv_path", col("_metadata.file_path"))
          .withColumn("_dv_idx", col("_metadata.row_index"))
      else df
    // scan one group of data files under LOGICAL names (data columns
    // only — partitioned files omit partition columns entirely)
    def scanGroup(paths: Seq[String]): DataFrame = mode match {
      case "none" =>
        withMeta(spark.read.schema(StructType(dataFields.map(f =>
          f.copy(metadata = org.apache.spark.sql.types.Metadata.empty))))
          .parquet(paths: _*))
      case "id" =>
        // physical resolution by parquet field id — Spark's id-based
        // clipping, the same machinery the Iceberg readers use; the
        // required session conf is SCOPED to the derived field-id
        // session, never set on the caller's
        val idSchema = StructType(dataFields.map { f =>
          require(f.metadata.contains("delta.columnMapping.id"),
            s"column '${f.name}' lacks delta.columnMapping.id")
          StructField(f.name, f.dataType, f.nullable,
            new org.apache.spark.sql.types.MetadataBuilder()
              .putLong("parquet.field.id",
                f.metadata.getLong("delta.columnMapping.id"))
              .build())
        })
        withMeta(IcebergInterop.fieldIdSession(spark).read
          .schema(idSchema).parquet(paths: _*))
      case _ => // name mode: declare the physical names, project back
        val phys = dataFields.map(physicalName)
        val physSchema = StructType(dataFields.zip(phys).map {
          case (f, p) => StructField(p, f.dataType, f.nullable) })
        withMeta(spark.read.schema(physSchema).parquet(paths: _*))
          .select((dataFields.zip(phys).map { case (f, p) =>
            col(p).as(f.name) } ++ helperCols.map(col)).toIndexedSeq: _*)
    }
    def partLit(f: StructField, v: Option[String])
        : org.apache.spark.sql.Column = v match {
      case None => lit(null).cast(f.dataType)
      case Some(s) =>
        if (f.dataType == org.apache.spark.sql.types.StringType) lit(s)
        else lit(s).cast(f.dataType)
    }
    val scanned: DataFrame =
      if (st.partitionColumns.isEmpty)
        scanGroup(liveFiles.map(f =>
          IcebergInterop.resolvePath(table, f.path).toString))
      else if (!useJoinFallback) {
        // group live files by partition tuple; each group scans once
        // and carries its partition columns as TYPED LITERALS —
        // Catalyst constant-folds partition predicates per branch and
        // prunes non-matching groups to empty relations
        val branches = groups.map { case (tuple, members) =>
          val g = scanGroup(members.map(f =>
            IcebergInterop.resolvePath(table, f.path).toString))
          partFields.zip(tuple).foldLeft(g) {
            case (df, (f, v)) => df.withColumn(f.name, partLit(f, v))
          }.select((logical.fieldNames.toSeq ++ helperCols)
            .map(col).toIndexedSeq: _*)
        }
        branches.reduce(_ unionByName _)
      } else {
        // MANY-partition fallback: ONE scan of every live file with
        // its file-path metadata, joined to a broadcastable
        // (file uri -> string partition values) frame built from the
        // log, values cast to the declared types after the join.
        // Plan-time group pruning is traded away (row-group stats
        // still apply); the literal-branch path above keeps it where
        // the plan can afford it.
        val fsq = CdcApply.fsFor(spark, table)
        val rows = liveFiles.map { f =>
          org.apache.spark.sql.Row.fromSeq(
            fsq.makeQualified(IcebergInterop
              .resolvePath(table, f.path)).toString +:
              tupleOf(f).map(_.orNull))
        }
        val pvSchema = StructType(
          StructField("_pv_path",
            org.apache.spark.sql.types.StringType,
            nullable = false) +:
            partFields.map(f => StructField(s"_pv_${f.name}",
              org.apache.spark.sql.types.StringType,
              nullable = true)))
        val pvDf = spark.createDataFrame(
          spark.sparkContext.parallelize(rows,
            math.max(1, math.min(rows.size / 10000 + 1, 64))),
          pvSchema)
        scanGroup(liveFiles.map(f =>
          IcebergInterop.resolvePath(table, f.path).toString))
          .join(org.apache.spark.sql.functions.broadcast(pvDf),
            IcebergInterop.canonUri(col("_dv_path")) ===
              IcebergInterop.canonUri(col("_pv_path")), "inner")
          .select((logical.fields.map { f =>
            if (partFields.exists(_.name == f.name)) {
              val s = col(s"_pv_${f.name}")
              (if (f.dataType ==
                  org.apache.spark.sql.types.StringType) s
               else s.cast(f.dataType)).as(f.name)
            } else col(f.name)
          }.toSeq ++ helperCols.map(col)).toIndexedSeq: _*)
      }

    val resolved =
      if (!anyDv) scanned
      else {
        // DV resolution strategy is picked from Σ descriptor
        // `cardinality` — known BEFORE any decode. Small totals: one
        // broadcast anti-join on (canonical file uri, row index) —
        // exploded deleted rows ship to every executor once, the scan
        // never shuffles. Huge totals (a mass-delete table): exploding
        // the rows would either blow the broadcast or shuffle the
        // FULL scan, so instead broadcast only the O(files)
        // DESCRIPTORS and filter each row against its own file's
        // bitmap, decoded at most once per executor.
        val fsq = CdcApply.fsFor(spark, table)
        val withDv = liveFiles.collect {
          case LiveFile(rel, _, Some(d), _) =>
            (fsq.makeQualified(
              IcebergInterop.resolvePath(table, rel)).toString, d) }
        val totalDeleted = withDv.map(_._2.cardinality).sum
        val threshold = spark.conf
          .get("spark.graft.delta.dvBroadcastRows", "1000000").toLong
        if (totalDeleted <= threshold) {
          // decode each file's vector ON EXECUTORS (a 100 TB table's
          // vectors never funnel through the driver); paths QUALIFY
          // through the table's filesystem so a scheme-less local
          // path matches Spark's file:///-rendered _metadata.file_path
          val dels = deletedRowsDf(spark, table, withDv)
          scanned.join(
            org.apache.spark.sql.functions.broadcast(dels),
            IcebergInterop.canonUri(col("_dv_path")) ===
              IcebergInterop.canonUri(col("_del_path")) &&
              col("_dv_idx") === col("_del_idx"),
            "left_anti")
        } else {
          val descByUri = withDv.map { case (p, d) =>
            IcebergInterop.canonUriString(p) -> d }.toMap
          val props = hadoopConfProps(spark)
          val tableDir = table
          val isDeleted = org.apache.spark.sql.functions.udf {
            (path: String, idx: Long) =>
              descByUri.get(IcebergInterop.canonUriString(path))
                .exists(d =>
                  DvRuntime.contains(tableDir, d, props, idx))
          }
          scanned.filter(!isDeleted(col("_dv_path"), col("_dv_idx")))
        }
      }
    val out = resolved.select(
      logical.fieldNames.map(col).toIndexedSeq: _*)
    // pruning is file-level; the row predicate still applies
    where.fold(out)(w =>
      out.filter(org.apache.spark.sql.functions.expr(w)))
  }

  /** The SESSION's Hadoop configuration (fs implementations,
    * spark.hadoop.* credentials) as a plain property array that ships
    * to executors — a bare `new Configuration()` there would drop
    * those settings and fail or misauthenticate file-backed vectors
    * on s3a/abfs/hdfs.
    */
  private def hadoopConfProps(spark: SparkSession)
      : Array[(String, String)] = {
    val c = spark.sparkContext.hadoopConfiguration
    val it = c.iterator()
    val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (it.hasNext) {
      val e = it.next(); buf += ((e.getKey, e.getValue))
    }
    buf.toArray
  }

  /** (canonical data-file path, deleted row index) rows for every
    * DV-bearing live file: descriptors parallelize, bitmaps decode on
    * executors (one task per slice of files), the result joins
    * against the scan's `_metadata` columns. O(deleted rows) total.
    */
  private def deletedRowsDf(spark: SparkSession, table: String,
      files: Seq[(String, DeletionVectors.DvDescriptor)]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    val schema = StructType(Seq(
      StructField("_del_path", StringType, nullable = false),
      StructField("_del_idx", LongType, nullable = false)))
    val confProps = hadoopConfProps(spark)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 64)))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confProps.foreach { case (k, v) => conf.set(k, v) }
        it.flatMap { case (path, d) =>
          DeletionVectors.deletedRows(table, d, conf)
            .map(i => org.apache.spark.sql.Row(path, i))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  // ---- streaming tail (readStream over a foreign Delta log) ---------------

  /** Schema + streamability gate for `readStream.format("graft-delta")`
    * — the logical schema the stream serves, validated ONCE at stream
    * start. Column-mapped tables refuse (per-batch physical-name
    * resolution under rename-while-streaming is not implemented —
    * never misread).
    */
  private[sources] def streamSchema(spark: SparkSession,
      table: String): StructType = {
    val vs = versions(spark, table)
    require(vs.nonEmpty || latestCheckpoint(spark, table).isDefined,
      s"no Delta log at $table")
    val st = replayLog(spark, table, vs)
    val declared = st.schema.getOrElse(throw new IllegalStateException(
      s"Delta log at $table carries no metaData action"))
    val mode = st.config.getOrElse("delta.columnMapping.mode", "none")
    if (mode != "none")
      throw new UnsupportedOperationException(
        s"readStream over $table: column mapping mode '$mode' is not " +
          "supported for streaming — read by batch (readDelta)")
    StructType(declared.fields.map(f =>
      f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
  }

  /** Current streamable offset of the log: the newest version (JSON
    * head or checkpoint-only head).
    */
  private[sources] def headVersion(spark: SparkSession,
      table: String): Option[Long] = {
    val vs = versions(spark, table)
    val cp = latestCheckpoint(spark, table).map(_.version)
    (vs.lastOption.toSeq ++ cp.toSeq).sorted.lastOption
  }

  /** One streaming micro-batch of a foreign Delta log tail: the ADDS
    * committed in versions (`fromExclusive`, `toInclusive`] — offset =
    * version, so a restarted stream resumes exactly where its
    * checkpoint says. The tail must be APPEND-SHAPED: a commit with a
    * `remove` action, an add carrying a deletion vector, or a
    * mid-stream schema change REFUSES loudly (a rewrite/delete under
    * a running tail has no exactly-once rows semantics; restart with
    * a batch read). Partitioned adds reconstruct their partition
    * columns from `partitionValues` as typed literals, like the batch
    * reader.
    */
  private[sources] def tailAdds(spark: SparkSession, table: String,
      streamSchema: StructType, fromExclusive: Long,
      toInclusive: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.{col, lit}
    val fs = CdcApply.fsFor(spark, table)
    val have = versions(spark, table).toSet
    val want = (fromExclusive + 1) to toInclusive
    val missing = want.filterNot(have)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"streaming tail of $table needs commit JSONs " +
          s"${missing.take(5).mkString(", ")} which were cleaned up " +
          "— the stream cannot resume exactly-once; restart from a " +
          "fresh checkpoint with a batch backfill")
    var partCols: Seq[String] = Seq.empty
    val adds = scala.collection.mutable.ArrayBuffer[LiveFile]()
    want.foreach { v =>
      val in = fs.open(versionFile(table, v))
      val text = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      in.close()
      text.linesIterator.filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("protocol")) {
          val p = n.get("protocol")
          checkProtocol(table, p.get("minReaderVersion").asInt(),
            Option(p.get("readerFeatures"))
              .map(_.elements().asScala.map(_.asText()).toSet)
              .getOrElse(Set.empty[String]))
        }
        if (n.has("metaData")) {
          val md = n.get("metaData")
          val s = DataType.fromJson(md.get("schemaString").asText())
            .asInstanceOf[StructType]
          val logical = StructType(s.fields.map(f => f.copy(
            metadata = org.apache.spark.sql.types.Metadata.empty)))
          if (logical != streamSchema)
            throw new UnsupportedOperationException(
              s"commit $v of $table changes the schema under a " +
                "running stream — restart the stream to pick up " +
                "the evolution")
          partCols = Option(md.get("partitionColumns"))
            .map(_.elements().asScala.map(_.asText()).toSeq)
            .getOrElse(partCols)
        }
        if (n.has("remove"))
          throw new UnsupportedOperationException(
            s"commit $v of $table removes files under a running " +
              "stream — the tail is not append-shaped; this source " +
              "streams appends only (rewrites/deletes need a batch " +
              "re-read)")
        if (n.has("add")) {
          val f = addFromNode(n.get("add"))
          if (f.dv.isDefined)
            throw new UnsupportedOperationException(
              s"commit $v of $table adds a deletion-vector file " +
                "under a running stream — not append-shaped; " +
                "read by batch")
          adds += f
        }
      }
    }
    // partition columns come from the PRE-TAIL state when the tail
    // itself repeats no metaData — derive from the base replay
    if (partCols.isEmpty)
      partCols = replayLog(spark, table, versions(spark, table))
        .partitionColumns
    val partFields = partCols.map(c =>
      streamSchema.fields.find(_.name == c).getOrElse(
        throw new IllegalStateException(
          s"partition column '$c' absent from the stream schema")))
    val dataFields = streamSchema.fields
      .filterNot(f => partCols.contains(f.name))
    val dataSchema = StructType(dataFields.toSeq)
    if (adds.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        streamSchema)
    def scanFiles(fsq: Seq[String]): DataFrame =
      spark.read.schema(dataSchema).parquet(fsq: _*)
    if (partCols.isEmpty)
      scanFiles(adds.map(f =>
        IcebergInterop.resolvePath(table, f.path).toString).toSeq)
        .select(streamSchema.fieldNames.map(col).toIndexedSeq: _*)
    else {
      val groups = adds.toSeq.groupBy(f =>
        partFields.map(pf => f.partitionValues.getOrElse(pf.name,
          throw new IllegalStateException(
            s"add in $table carries no partition value for " +
              s"'${pf.name}'"))))
        .toSeq.sortBy(_._1.toString)
      groups.map { case (tuple, members) =>
        val g = scanFiles(members.map(f =>
          IcebergInterop.resolvePath(table, f.path).toString))
        partFields.zip(tuple).foldLeft(g) { case (df, (f, v)) =>
          df.withColumn(f.name, v match {
            case None => lit(null).cast(f.dataType)
            case Some(s) =>
              if (f.dataType ==
                  org.apache.spark.sql.types.StringType) lit(s)
              else lit(s).cast(f.dataType)
          })
        }.select(streamSchema.fieldNames.map(col).toIndexedSeq: _*)
      }.reduce(_ unionByName _)
    }
  }

  /** Initial streaming batch: the COMPLETE live state as of `version`
    * (real Delta streams serve the start snapshot first, then the
    * tail) — the full batch reader, so checkpoints, partitions, DVs
    * and column... (column mapping already refused at stream start).
    */
  private[sources] def snapshotBatch(spark: SparkSession,
      table: String, version: Long): DataFrame =
    readDelta(spark, table, Some(version))
}

/** Executor-side deletion-vector membership for the LARGE-DV read
  * path: each file's bitmap decodes AT MOST ONCE PER JVM (keyed by
  * descriptor identity), is kept as a sorted index array, and rows
  * test via binary search — O(dv) decode amortized over every task
  * that touches the file, O(log dv) per row, and only the files an
  * executor actually reads are ever decoded (a broadcast of exploded
  * rows would ship EVERY file's deletions to EVERY executor).
  */
private[sources] object DvRuntime {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  def contains(table: String, d: DeletionVectors.DvDescriptor,
      confProps: Array[(String, String)], idx: Long): Boolean = {
    val key = s"$table#${d.storageType}#${d.pathOrInlineDv}#${d.offset}"
    var rows = cache.get(key)
    if (rows == null) {
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confProps.foreach { case (k, v) => conf.set(k, v) }
      rows = DeletionVectors.deletedRows(table, d, conf)
      java.util.Arrays.sort(rows)
      // crude bound: a pathological table with thousands of huge
      // vectors must not pin them all — dropping the cache only costs
      // a re-decode
      if (cache.size > 256) cache.clear()
      cache.put(key, rows)
    }
    java.util.Arrays.binarySearch(rows, idx) >= 0
  }
}
