package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter,
  GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.CdcApply
import IcebergInterop._

/** Iceberg FORMAT-VERSION 2 interop — sequence numbers + delete files
  * (iceberg.apache.org/spec/ — public), the merge-on-read half of the
  * format matrix that [[IcebergInterop]]'s v1 exporter cannot express.
  *
  * Why it exists (reference analog: the Glue external-table contract,
  * `main.tf:303-372`, is format-agnostic catalog-over-files — modern
  * lakehouse tables behind that contract are overwhelmingly v2): the
  * v1 exporter must MATERIALIZE every bucket whose physical identity
  * changed, so a trickle CDC change costs O(bucket) parquet rewrite
  * per sync. v2 lets the engine publish its own tombstones/updates AS
  * DELETE FILES: one sync appends the batch's upserts as a data file
  * and the batch's touched keys as an EQUALITY delete file —
  * **O(batch) data work per sync**, independent of bucket or table
  * size, exactly the cost class of the engine's own MOR apply.
  *
  * Mapping:
  *  - CDC batches since the last sync → one v2 SNAPSHOT with
  *    data-sequence-number = snapshot version + 1,
  *  - the batches' net upserts → a DATA file (content=0) at that seq,
  *  - the batches' touched keys → an EQUALITY DELETE file (content=2,
  *    `equality_ids` = the CDC key columns' field-ids) at the same
  *    seq — by the spec it shadows every key image in files with
  *    STRICTLY LOWER sequence number, which is exactly latest-wins,
  *  - prior manifests carry forward by path (the standard v2 MOR
  *    accumulation; [[compact]] folds them back to one data manifest).
  *
  * [[read]] resolves any v2 tree — ours or a foreign writer's —
  * applying position deletes (content=1, matched on
  * `_metadata.file_path` + `_metadata.row_index`, applied to data at
  * sequence <= delete sequence) and equality deletes (null-safe match
  * on `equality_ids` columns, applied to data at sequence STRICTLY
  * below), per-entry sequence numbers inherited from the manifest
  * list when null. Delete sets aggregate to max-seq per key before
  * the join, so the data side pays one join per delete shape and AQE
  * broadcasts the (O(changes)-sized) delete relation; raw vectors of
  * data never shuffle for resolution.
  *
  * Crash consistency is [[IcebergInterop]]'s: commit = the rename of
  * `v<N>.metadata.json`, pre-commit debris swept on retry, sidecar
  * state replaced ATOMICALLY (one OVERWRITE rename — no
  * delete-then-rename window) and stamped with the committed
  * version; a stale stamp self-heals via a full-rewrite snapshot,
  * and a MISSING sidecar on our own lineage (the deterministic
  * table-uuid proves it) self-heals the same way — only genuinely
  * foreign trees refuse. Single-writer contract as for v1.
  */
object IcebergV2 {

  // ---- Avro schemas (v2 field names + ids per the Iceberg spec) ----------

  private val listSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin)

  private val entrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int","field-id":134},
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104},
      |{"name":"equality_ids","field-id":135,"default":null,"type":["null",
      |{"type":"array","items":"int","element-id":136}]},
      |{"name":"lower_bounds","field-id":125,"default":null,"type":["null",
      |{"type":"array","logicalType":"map","items":{"type":"record","name":"k126_v127","fields":[
      |{"name":"key","type":"int","field-id":126},
      |{"name":"value","type":"bytes","field-id":127}]}}]},
      |{"name":"upper_bounds","field-id":128,"default":null,"type":["null",
      |{"type":"array","logicalType":"map","items":{"type":"record","name":"k129_v130","fields":[
      |{"name":"key","type":"int","field-id":129},
      |{"name":"value","type":"bytes","field-id":130}]}}]}
      |]}}]}""".stripMargin)

  private def dataFileSchema: Schema =
    entrySchema.getField("data_file").schema()

  private def boundsRecords(field: String,
      m: Map[Int, Array[Byte]]): java.util.List[GenericRecord] = {
    val itemSchema = dataFileSchema.getField(field).schema()
      .getTypes.get(1).getElementType
    m.toSeq.sortBy(_._1).map { case (id, bytes) =>
      val rec = new GenericData.Record(itemSchema)
      rec.put("key", id)
      rec.put("value", java.nio.ByteBuffer.wrap(bytes))
      rec: GenericRecord
    }.asJava
  }

  private def manifestPath(table: String, v: Long, kind: String) =
    new Path(metaDir(table), s"manifest-$v-$kind.avro")

  // ---- sidecar state -------------------------------------------------------

  /** One carried manifest: path is TABLE-RELATIVE in the state (the
    * Avro list carries the full URI), `content` is the manifest-level
    * kind (0 data / 1 deletes), `seq` its data sequence number.
    */
  private case class ManRef(path: String, snap: Long, seq: Long,
      content: Int, nFiles: Int, nRows: Long)

  private case class StateV2(version: Long, lastBatch: Long,
      manifests: Seq[ManRef], renames: String = "",
      schemaFp: String = "")

  /** Rename-state fingerprint: a metadata-only rename on the source
    * changes every name the (name-based) v2 reader resolves, so a
    * mismatch forces the next sync through [[fullSnapshot]] — old-name
    * and new-name data files must never mix under one schema.
    */
  private def renameFp(m: CdcApply.Manifest): String =
    m.renames.map { case (st, l) => s"$st>$l" }.mkString(",")

  /** Full stored-schema fingerprint (names + order). Field ids are
    * derived POSITIONALLY at every sync, so any non-append schema
    * change between syncs (drop / reorder) would silently re-map
    * `equality_ids` and bounds ids relative to carried manifests —
    * corrupting delete resolution. A stored fingerprint that is not a
    * PREFIX of the current one forces the next sync through
    * [[fullSnapshot]] (append-only evolution keeps every existing
    * position, so appends stay incremental).
    */
  // the separator must be a character that CANNOT appear in a column
  // name, else distinct schemas collide (["a","b"] vs ["ab"]) or an
  // append test is satisfied by EXTENDING the last column's name
  // ("c" -> "cd") — either would smuggle a non-append evolution past
  // the full-snapshot guard. NUL is rejected by every catalog/parquet
  // name path; Jackson escapes it fine in the JSON state. (A state
  // written under an older separator simply mismatches and forces one
  // full snapshot — conservative, never corrupting.)
  private val FpSep = "\u0000"

  private[sources] def schemaFp(schema: StructType): String =
    schema.fieldNames.mkString(FpSep)

  private[sources] def isAppendEvolution(stored: String,
      current: String): Boolean =
    stored.isEmpty || current == stored ||
      current.startsWith(stored + FpSep)

  private def readState(spark: SparkSession, table: String)
      : Option[StateV2] = {
    val fs = CdcApply.fsFor(spark, table)
    if (!fs.exists(statePath(table))) return None
    val in = fs.open(statePath(table))
    val text = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    val n = mapper.readTree(text)
    if (!Option(n.get("format")).exists(_.asInt() == 2))
      throw new IllegalStateException(
        s"Iceberg table at $table was exported as format v1 — " +
          "continue it with IcebergInterop.exportIncremental (mixing " +
          "writers would corrupt the manifest lineage)")
    val mans = Option(n.get("manifests")).map(
      _.elements().asScala.map { m =>
        ManRef(m.get("path").asText(), m.get("snap").asLong(),
          m.get("seq").asLong(), m.get("content").asInt(),
          m.get("nfiles").asInt(), m.get("nrows").asLong())
      }.toSeq).getOrElse(Seq.empty)
    Some(StateV2(n.get("version").asLong(),
      n.get("lastBatch").asLong(), mans,
      Option(n.get("renames")).map(_.asText()).getOrElse(""),
      Option(n.get("schemaFp")).map(_.asText()).getOrElse("")))
  }

  private def writeState(spark: SparkSession, table: String,
      st: StateV2): Unit = {
    val n = mapper.createObjectNode()
    n.put("format", 2)
    n.put("version", st.version)
    n.put("lastBatch", st.lastBatch)
    n.put("renames", st.renames)
    n.put("schemaFp", st.schemaFp)
    val arr = n.putArray("manifests")
    st.manifests.foreach { m =>
      val o = arr.addObject()
      o.put("path", m.path)
      o.put("snap", m.snap)
      o.put("seq", m.seq)
      o.put("content", m.content)
      o.put("nfiles", m.nFiles)
      o.put("nrows", m.nRows)
    }
    // atomic replace (one OVERWRITE rename): the old delete-then-
    // rename pair could crash between the two, leaving committed
    // metadata with no state — see [[IcebergInterop.replaceSmallFile]]
    replaceSmallFile(spark,
      new Path(table, s"._graft_export_state-${st.version}"),
      statePath(table),
      mapper.writeValueAsString(n).getBytes("UTF-8"))
  }

  // ---- manifest / manifest-list / metadata writing -------------------------

  private def clearAborted(spark: SparkSession, table: String,
      version: Long): Unit = {
    val fs = CdcApply.fsFor(spark, table)
    Seq(new Path(table, s"data/v$version"),
      manifestListFile(table, version),
      manifestPath(table, version, "data"),
      manifestPath(table, version, "del"),
      new Path(metaDir(table), s".tmp-$version")).foreach(p =>
      if (fs.exists(p)) fs.delete(p, true))
  }

  private def listParquet(spark: SparkSession, table: String,
      rel: String): Seq[(String, Long)] = {
    val fs = CdcApply.fsFor(spark, table)
    val dir = new Path(table, rel)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => (s"$rel/${st.getPath.getName}", st.getLen))
  }

  /** Write one manifest (all entries ADDED at `seq`): `fileContent`
    * 0 = data, 2 = equality deletes (with `equalityIds`). Bounds use
    * the TABLE field-ids via `fieldIds`, so a delete file's key
    * bounds are queryable by real readers. Returns the ManRef.
    */
  private def writeManifest(spark: SparkSession, table: String,
      version: Long, kind: String, files: Seq[(String, Long)],
      schema: StructType, fieldIds: Map[String, Int], seq: Long,
      fileContent: Int, equalityIds: Seq[Int]): ManRef = {
    val fs = CdcApply.fsFor(spark, table)
    val path = manifestPath(table, version, kind)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.setMeta("schema", mapper.writeValueAsString(schemaNode(schema)))
    w.setMeta("partition-spec", "[]")
    w.setMeta("partition-spec-id", "0")
    w.setMeta("format-version", "2")
    w.setMeta("content", if (fileContent == 0) "data" else "deletes")
    w.create(entrySchema, fs.create(path, false))
    var rows = 0L
    try files.foreach { case (rel, size) =>
      val (nRows, lo, hi) = footerStats(spark, new Path(table, rel),
        schema, Some(fieldIds))
      rows += nRows
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", fileContent)
      df.put("file_path",
        fs.makeQualified(new Path(table, rel)).toString)
      df.put("file_format", "PARQUET")
      df.put("partition",
        new GenericData.Record(dataFileSchema.getField("partition")
          .schema()))
      df.put("record_count", nRows)
      df.put("file_size_in_bytes", size)
      if (equalityIds.nonEmpty)
        df.put("equality_ids", equalityIds.map(
          java.lang.Integer.valueOf).asJava)
      if (lo.nonEmpty) df.put("lower_bounds", boundsRecords("lower_bounds", lo))
      if (hi.nonEmpty) df.put("upper_bounds", boundsRecords("upper_bounds", hi))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", java.lang.Long.valueOf(version))
      e.put("sequence_number", java.lang.Long.valueOf(seq))
      e.put("file_sequence_number", java.lang.Long.valueOf(seq))
      e.put("data_file", df)
      w.append(e)
    } finally w.close()
    ManRef(s"metadata/${path.getName}",
      version, seq, if (fileContent == 0) 0 else 1, files.size, rows)
  }

  private def writeManifestList(spark: SparkSession, table: String,
      version: Long, manifests: Seq[(ManRef, Boolean)]): Unit = {
    val fs = CdcApply.fsFor(spark, table)
    val path = manifestListFile(table, version)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    w.setMeta("format-version", "2")
    w.setMeta("snapshot-id", version.toString)
    w.create(listSchema, fs.create(path, false))
    try manifests.foreach { case (m, fresh) =>
      val rec = new GenericData.Record(listSchema)
      rec.put("manifest_path",
        fs.makeQualified(new Path(table, m.path)).toString)
      rec.put("manifest_length",
        fs.getFileStatus(new Path(table, m.path)).getLen)
      rec.put("partition_spec_id", 0)
      rec.put("content", m.content)
      rec.put("sequence_number", java.lang.Long.valueOf(m.seq))
      rec.put("min_sequence_number", java.lang.Long.valueOf(m.seq))
      rec.put("added_snapshot_id", java.lang.Long.valueOf(m.snap))
      rec.put("added_files_count",
        java.lang.Integer.valueOf(if (fresh) m.nFiles else 0))
      rec.put("existing_files_count",
        java.lang.Integer.valueOf(if (fresh) 0 else m.nFiles))
      rec.put("deleted_files_count", java.lang.Integer.valueOf(0))
      rec.put("added_rows_count",
        java.lang.Long.valueOf(if (fresh) m.nRows else 0L))
      rec.put("existing_rows_count",
        java.lang.Long.valueOf(if (fresh) 0L else m.nRows))
      rec.put("deleted_rows_count", java.lang.Long.valueOf(0L))
      w.append(rec)
    } finally w.close()
  }

  /** Commit metadata version `version` with sequence `seq`: prior
    * snapshot nodes carried VERBATIM (sequence numbers intact), one
    * new snapshot appended, pointer re-aimed. Commit point = the
    * rename.
    */
  private def commitMetadata(spark: SparkSession, table: String,
      version: Long, seq: Long, schema: StructType,
      priorSnaps: Seq[com.fasterxml.jackson.databind.JsonNode]): Unit = {
    val fs = CdcApply.fsFor(spark, table)
    val meta = mapper.createObjectNode()
    meta.put("format-version", 2)
    meta.put("table-uuid", java.util.UUID
      .nameUUIDFromBytes(table.getBytes("UTF-8")).toString)
    meta.put("location", table)
    meta.put("last-sequence-number", seq)
    meta.put("last-updated-ms", version)
    meta.put("last-column-id", schema.fields.length)
    val schemas = meta.putArray("schemas")
    schemas.add(schemaNode(schema))
    meta.put("current-schema-id", 0)
    val specs = meta.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    spec0.putArray("fields")
    meta.put("default-spec-id", 0)
    meta.put("last-partition-id", 999)
    val orders = meta.putArray("sort-orders")
    val order0 = orders.addObject()
    order0.put("order-id", 0)
    order0.putArray("fields")
    meta.put("default-sort-order-id", 0)
    meta.putObject("properties")
    meta.put("current-snapshot-id", version)
    val snaps = meta.putArray("snapshots")
    priorSnaps.foreach(snaps.add)
    val sn = snaps.addObject()
    sn.put("snapshot-id", version)
    sn.put("sequence-number", seq)
    sn.put("timestamp-ms", version)
    sn.put("schema-id", 0)
    val sum = sn.putObject("summary")
    sum.put("operation", if (version == 0L) "append" else "overwrite")
    sn.put("manifest-list", fs.makeQualified(
      new Path(table, s"metadata/snap-$version.avro")).toString)
    meta.putArray("snapshot-log")
    meta.putArray("metadata-log")
    val tmp = new Path(metaDir(table), s".tmp-$version")
    val out = fs.create(tmp, false)
    out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(meta).getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, metadataFile(table, version)))
      throw new IllegalStateException(
        s"concurrent Iceberg export lost the commit race for " +
          s"version $version of $table")
    replaceSmallFile(spark, new Path(metaDir(table), s".hint-$version"),
      new Path(metaDir(table), "version-hint.text"),
      version.toString.getBytes("UTF-8"))
  }

  private def priorSnapNodes(spark: SparkSession, table: String)
      : Seq[com.fasterxml.jackson.databind.JsonNode] =
    versions(spark, table).lastOption.map { pv =>
      parseMetadata(spark, table, pv).get("snapshots")
        .elements().asScala.toSeq
    }.getOrElse(Seq.empty)

  // ---- export ---------------------------------------------------------------

  /** Full-rewrite snapshot: the CDC table's RESOLVED state as fresh
    * data files under ONE data manifest (no carried manifests, no
    * delete files) — the first export, the stale-stamp self-heal, and
    * [[compact]] all land here. Prior snapshots stay time-travelable
    * until [[IcebergInterop.expireSnapshots]].
    */
  private def fullSnapshot(spark: SparkSession, cdcRoot: String,
      table: String, version: Long, headBatch: Long): Long = {
    clearAborted(spark, table, version)
    val m = CdcApply.currentManifest(spark, cdcRoot).get
    val resolved = CdcApply.applyRenames(CdcApply.stripInternal(
      CdcApply.readBucketsResolved(spark, cdcRoot, m, None).get, m.conf),
      m)
    val schema = resolved.schema
    schema.fields.foreach(f => icebergType(f.dataType)) // refuse early
    val fieldIds = schema.fieldNames.zipWithIndex
      .map { case (n, i) => (n, i + 1) }.toMap
    val rel = s"data/v$version/data"
    resolved.write.mode("errorifexists")
      .parquet(new Path(table, rel).toString)
    val files = listParquet(spark, table, rel)
    val seq = version + 1
    val refs = if (files.isEmpty) Seq.empty[ManRef]
      else Seq(writeManifest(spark, table, version, "data", files,
        schema, fieldIds, seq, fileContent = 0, equalityIds = Seq.empty))
    writeManifestList(spark, table, version, refs.map((_, true)))
    commitMetadata(spark, table, version, seq, schema,
      priorSnapNodes(spark, table))
    writeState(spark, table,
      StateV2(version, headBatch, refs, renameFp(m), schemaFp(schema)))
    version
  }

  /** INCREMENTAL v2 export — sync the CDC table at `cdcRoot` into the
    * Iceberg v2 tree at `tableDir` as ONE new snapshot whose data
    * work is **O(changes since the last sync)**: the net upserts land
    * as a data file, the touched keys as an equality delete file, and
    * every prior manifest carries forward by path. Returns the
    * committed snapshot id, or None when the table hasn't moved.
    *
    * Completeness rides the change feed's tombstone-retention
    * contract ([[CdcApply.changesSince]]): a mirror lagging further
    * than retention must reseed via [[compact]].
    */
  def exportIncremental(spark: SparkSession, cdcRoot: String,
      tableDir: String): Option[Long] = {
    val m = CdcApply.currentManifest(spark, cdcRoot).getOrElse(
      throw new IllegalArgumentException(s"no CDC table at $cdcRoot"))
    val head = CdcApply.currentVersion(spark, cdcRoot).get
    val priorVs = versions(spark, tableDir)
    val state = readState(spark, tableDir)
    if (priorVs.nonEmpty && state.isEmpty) {
      // no sidecar next to committed metadata: a foreign writer's
      // tree (refuse), or our own lineage whose state was lost — the
      // deterministic table-uuid tells them apart; own v2 lineage
      // self-heals with a full rewrite, exactly like a stale stamp
      if (!ownLineage(spark, tableDir, priorVs.last))
        throw new IllegalStateException(
          s"Iceberg table at $tableDir has committed metadata but no " +
            "export state — it was written by a foreign writer; " +
            "incremental export requires its own lineage. Use a fresh " +
            "directory.")
      if (formatVersion(parseMetadata(spark, tableDir,
          priorVs.last)) != 2)
        throw new IllegalStateException(
          s"Iceberg table at $tableDir was exported as format v1 — " +
            "continue it with IcebergInterop.exportIncremental (mixing " +
            "writers would corrupt the manifest lineage)")
      return Some(fullSnapshot(spark, cdcRoot, tableDir,
        priorVs.last + 1L, head))
    }
    if (priorVs.isEmpty)
      return Some(fullSnapshot(spark, cdcRoot, tableDir, 0L, head))
    val st = state.get
    if (st.version != priorVs.last)
      // stale stamp (post-commit crash window): the carried-manifest
      // list can't be trusted — self-heal with a full rewrite
      return Some(fullSnapshot(spark, cdcRoot, tableDir,
        priorVs.last + 1L, head))
    if (st.renames != renameFp(m))
      // a rename landed since the last sync: republish everything
      // under the new names (metadata-only on the source, one full
      // rewrite here — the name-based reader cannot mix name eras)
      return Some(fullSnapshot(spark, cdcRoot, tableDir,
        priorVs.last + 1L, head))
    if (head <= st.lastBatch) return None
    val changes = CdcApply.changesSince(spark, cdcRoot, st.lastBatch)
      .get.cache()
    try {
      if (changes.isEmpty) return None
      val version = st.version + 1
      val seq = version + 1
      clearAborted(spark, tableDir, version)
      val schema = CdcApply.applyRenames(CdcApply.stripInternal(
        CdcApply.readBucketsResolved(spark, cdcRoot, m, None).get,
        m.conf), m).schema
      schema.fields.foreach(f => icebergType(f.dataType))
      if (!isAppendEvolution(st.schemaFp, schemaFp(schema)))
        // non-append schema change (drop / reorder): positional field
        // ids would re-map equality_ids and bounds ids relative to the
        // carried manifests — republish instead of corrupting deletes
        return Some(fullSnapshot(spark, cdcRoot, tableDir,
          version, head))
      val fieldIds = schema.fieldNames.zipWithIndex
        .map { case (n, i) => (n, i + 1) }.toMap
      // upserts (current non-tombstone rows of the touched keys)
      val upserts = m.conf.deletedCol
        .fold(changes)(d => changes.filter(!coalesce(col(d), lit(false))))
        .select(schema.fieldNames.map(col).toSeq: _*)
      val dataRel = s"data/v$version/data"
      upserts.write.mode("errorifexists")
        .parquet(new Path(tableDir, dataRel).toString)
      val dataFiles = listParquet(spark, tableDir, dataRel)
      // equality delete: EVERY touched key (updates shadow their old
      // image, deletes just shadow) — one small file per sync
      val keyCols = m.conf.keys
      val delRel = s"data/v$version/deletes"
      changes.select(keyCols.map(col).toSeq: _*).coalesce(1)
        .write.mode("errorifexists")
        .parquet(new Path(tableDir, delRel).toString)
      val delFiles = listParquet(spark, tableDir, delRel)
      val keySchema = StructType(keyCols.map(schema(_)))
      val fresh =
        (if (dataFiles.isEmpty) Seq.empty[ManRef]
         else Seq(writeManifest(spark, tableDir, version, "data",
           dataFiles, schema, fieldIds, seq, fileContent = 0,
           equalityIds = Seq.empty))) ++
        (if (delFiles.isEmpty) Seq.empty[ManRef]
         else Seq(writeManifest(spark, tableDir, version, "del",
           delFiles, keySchema, fieldIds, seq, fileContent = 2,
           equalityIds = keyCols.map(fieldIds))))
      val listed = st.manifests.map((_, false)) ++ fresh.map((_, true))
      writeManifestList(spark, tableDir, version, listed)
      commitMetadata(spark, tableDir, version, seq, schema,
        priorSnapNodes(spark, tableDir))
      writeState(spark, tableDir,
        StateV2(version, head, st.manifests ++ fresh, st.renames,
          schemaFp(schema)))
      Some(version)
    } finally changes.unpersist()
  }

  /** COMPACTION — fold the accumulated MOR snapshots into one fresh
    * full-rewrite snapshot (no delete files, one data manifest), the
    * v2 maintenance op paired with [[IcebergInterop.expireSnapshots]]
    * (which then sweeps the superseded data/delete files). Returns
    * the committed snapshot id.
    */
  def compact(spark: SparkSession, cdcRoot: String,
      tableDir: String): Long = {
    val head = CdcApply.currentVersion(spark, cdcRoot).getOrElse(
      throw new IllegalArgumentException(s"no CDC table at $cdcRoot"))
    val priorVs = versions(spark, tableDir)
    require(priorVs.nonEmpty, s"no Iceberg metadata at $tableDir")
    // a missing sidecar on our own lineage (deterministic table-uuid)
    // is the state-loss crash window — compact IS the self-heal (a
    // full rewrite needs no carried state), so only foreign trees
    // refuse here
    if (readState(spark, tableDir).isEmpty &&
        !ownLineage(spark, tableDir, priorVs.last))
      throw new IllegalStateException(
        s"compact requires this exporter's lineage at $tableDir")
    fullSnapshot(spark, cdcRoot, tableDir, priorVs.last + 1L, head)
  }

  /** Schedule-driven compaction: fold the MOR tail when the CURRENT
    * snapshot's delete-file rows reach `maxDeleteRatio` of its data
    * rows — the [[CdcApply.compactIfNeeded]] pattern for the export
    * side (manifest-list metadata only to decide; no data read).
    * Returns the committed snapshot id when compaction ran.
    */
  def compactIfNeeded(spark: SparkSession, cdcRoot: String,
      tableDir: String, maxDeleteRatio: Double = 0.2): Option[Long] = {
    require(maxDeleteRatio > 0.0, "maxDeleteRatio must be positive")
    val vs = versions(spark, tableDir)
    if (vs.isEmpty) return None
    val meta = parseMetadata(spark, tableDir, vs.max)
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() ==
        meta.get("current-snapshot-id").asLong()).get
    val listPath = resolvePath(tableDir,
      snap.get("manifest-list").asText())
    val (dataRows, delRows) = readAvro(spark, listPath)
      .foldLeft((0L, 0L)) { case ((d, x), mf) =>
        val rows = longOf(mf, "added_rows_count").getOrElse(0L) +
          longOf(mf, "existing_rows_count").getOrElse(0L)
        if (intOf(mf, "content").contains(1)) (d, x + rows)
        else (d + rows, x)
      }
    if (delRows > 0 && dataRows > 0 &&
        delRows.toDouble / dataRows >= maxDeleteRatio)
      Some(compact(spark, cdcRoot, tableDir))
    else None
  }

  /** CONTINUOUS v2 export — [[IcebergInterop.startContinuousExport]]'s
    * merge-on-read twin: a Structured Streaming query tailing the CDC
    * changelog whose every micro-batch runs one [[exportIncremental]]
    * sync (the changelog is the WAKE SIGNAL; the sync reads the
    * manifest/change feed), so the mirror follows at O(batch) per
    * sync. Requires a changelog-enabled table; caller owns the
    * returned query's lifecycle.
    */
  def startContinuousExport(spark: SparkSession, cdcRoot: String,
      tableDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val feed = CdcApply.readChangesStream(spark, cdcRoot).getOrElse(
      throw new IllegalArgumentException(
        s"continuous export needs a changelog-enabled table at " +
          s"$cdcRoot (applyBatch(changelog = true))"))
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the changelog file lands BEFORE the manifest pointer flips:
        // wait (bounded) until the head covers this micro-batch's
        // newest change batch, then sync off the manifest
        val target = batch
          .agg(max(col(CdcApply.ChangeBatchCol))).head()
        if (!target.isNullAt(0)) {
          val want = target.getLong(0)
          val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
          while (!CdcApply.currentVersion(spark, cdcRoot)
              .exists(_ >= want) && System.nanoTime() < deadline)
            Thread.sleep(25)
        }
        exportIncremental(spark, cdcRoot, tableDir)
        ()
      }
      .start()
  }

  // ---- read ------------------------------------------------------------------

  private[sources] case class FileEntry(path: String, seq: Long, content: Int,
      eqIds: Seq[Int], specId: Int = 0,
      part: Option[GenericRecord] = None,
      lower: Map[Int, Array[Byte]] = Map.empty,
      upper: Map[Int, Array[Byte]] = Map.empty)

  /** Field access tolerant of writer schemas that OMIT optional v2
    * fields entirely (GenericRecord.get throws on unknown names).
    */
  private def fieldOpt(r: GenericRecord, f: String): Option[AnyRef] =
    if (r.getSchema.getField(f) == null) None else Option(r.get(f))

  private def longOf(r: GenericRecord, f: String): Option[Long] =
    fieldOpt(r, f).map(_.asInstanceOf[java.lang.Long].longValue())

  private def intOf(r: GenericRecord, f: String): Option[Int] =
    fieldOpt(r, f).map(_.asInstanceOf[java.lang.Integer].intValue())

  private def canonUri(c: Column): Column = IcebergInterop.canonUri(c)

  private val SeqCol = "_ice_seq"
  private val PathCol = "_ice_path"
  private val PosCol = "_ice_pos"

  /** Resolve a v2 tree at `snapshotId` (default: current): data
    * files grouped by data sequence number, position then equality
    * deletes applied with the spec's sequence-number rules. `where`
    * prunes data files on identity partition values
    * ([[IcebergInterop.partitionPrune]]) and filters the result;
    * delete files are never pruned (a delete for a pruned partition
    * is simply inert). Called by [[IcebergInterop.readIceberg]] — not
    * directly.
    */
  /** Every live (non-DELETED-status) entry of one snapshot: data AND
    * delete files, with inherited sequence numbers, spec ids,
    * partition records and bounds — the listing [[read]] resolves and
    * the streaming tail diffs.
    */
  private[sources] def listEntries(spark: SparkSession, table: String,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapId: Long): Seq[FileEntry] = {
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == snapId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapId not in $table metadata"))
    val listPath = resolvePath(table, snap.get("manifest-list").asText())
    readAvro(spark, listPath).flatMap { mf =>
      val mSeq = longOf(mf, "sequence_number").getOrElse(0L)
      val mPath = mf.get("manifest_path").toString
      val specId = intOf(mf, "partition_spec_id").getOrElse(0)
      readAvro(spark, resolvePath(table, mPath))
        .filter(e => e.get("status").asInstanceOf[Int] != 2)
        .map { e =>
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("parquet"),
            s"unsupported data file format $fmt in $table")
          // v2 inheritance: a null entry sequence number inherits the
          // manifest's (the form v2-native writers emit for ADDED)
          val seq = longOf(e, "sequence_number").getOrElse(mSeq)
          val eqIds = fieldOpt(df, "equality_ids")
            .map(_.asInstanceOf[java.util.List[_]].asScala
              .map(_.asInstanceOf[java.lang.Integer].intValue()).toSeq)
            .getOrElse(Seq.empty)
          val part = fieldOpt(df, "partition")
            .map(_.asInstanceOf[GenericRecord])
          FileEntry(resolvePath(table,
            df.get("file_path").toString).toString,
            seq, intOf(df, "content").getOrElse(0), eqIds, specId, part,
            boundsOf(df, "lower_bounds"), boundsOf(df, "upper_bounds"))
        }
    }
  }

  private[sources] def read(spark: SparkSession, table: String,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapshotId: Option[Long],
      where: Option[String] = None): DataFrame = {
    val schema = schemaOf(meta)
    val byId = schemaFieldsById(meta)
    val snapId = snapshotId.getOrElse(
      meta.get("current-snapshot-id").asLong())
    val entries = listEntries(spark, table, meta, snapId)
    val dataFiles = where.fold(entries.filter(_.content == 0)) { w =>
      val p1 = partitionPrune(spark, meta,
        entries.filter(_.content == 0)
          .map(f => (f, f.specId, f.part)), w)
      boundsPrune(spark, meta,
        p1.map(f => (f, f.lower, f.upper)), w)
    }
    val posDels = entries.filter(_.content == 1)
    val eqDels = entries.filter(_.content == 2)
    if (dataFiles.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val needPos = posDels.nonEmpty
    // data: one declared-schema scan per distinct sequence number
    // (O(snapshots) groups), each stamped with its seq — the stamp is
    // what the delete rules compare against
    // id-matched when the data files carry parquet field ids
    // (foreign Iceberg writers): renamed columns' old files still
    // serve their values; this engine's own (id-less) exports match
    // by name as before. The id/name decision is PER SEQUENCE GROUP
    // (one footer read each), so a tree mixing id-bearing foreign
    // snapshots with this engine's id-less ones resolves both kinds;
    // within one group the first file decides — mixed files inside a
    // single snapshot's adds would need per-file scans and no real
    // writer produces them
    var data = dataFiles.groupBy(_.seq).toSeq.sortBy(_._1)
      .map { case (seq, fs) =>
        val base = scanReader(spark, meta,
          fs.headOption.map(f => new Path(f.path)))
          .parquet(fs.map(_.path): _*)
        val stamped = base.withColumn(SeqCol, lit(seq))
        if (needPos)
          stamped.withColumn(PathCol, col("_metadata.file_path"))
            .withColumn(PosCol, col("_metadata.row_index"))
        else stamped
      }.reduce(_ unionByName _)
    if (needPos) {
      val pdSchema = StructType(Seq(StructField("file_path", StringType),
        StructField("pos", LongType)))
      val pd = posDels.groupBy(_.seq).toSeq
        .map { case (seq, fs) =>
          spark.read.schema(pdSchema).parquet(fs.map(_.path): _*)
            .withColumn("_pd_seq", lit(seq))
        }.reduce(_ unionByName _)
        .groupBy(canonUri(col("file_path")).as("_pd_path"),
          col("pos").as("_pd_pos"))
        .agg(max(col("_pd_seq")).as("_pd_seq"))
      // position deletes apply to data at seq <= delete seq
      data = data.join(pd,
        canonUri(col(PathCol)) === col("_pd_path") &&
          col(PosCol) === col("_pd_pos"), "left")
        .filter(col("_pd_seq").isNull || col("_pd_seq") < col(SeqCol))
        .drop("_pd_path", "_pd_pos", "_pd_seq")
    }
    // equality deletes, one join per distinct equality_ids shape:
    // delete rows aggregate to max-seq per key first (O(changes)
    // relation — AQE broadcasts it), then a null-safe left join;
    // a delete applies to data at seq STRICTLY below its own
    eqDels.groupBy(_.eqIds).toSeq.sortBy(_._1.mkString(","))
      .foreach { case (ids, fs) =>
        require(ids.nonEmpty,
          s"equality delete file without equality_ids in $table")
        val cols = ids.map(id => byId.getOrElse(id,
          throw new IllegalArgumentException(
            s"equality_ids references unknown field id $id in $table")))
        // same id-matching decision per delete-file group: foreign
        // equality delete files carry the equality_ids as parquet
        // field ids, so their columns resolve rename-proof too
        val idMatched = fs.headOption.exists(fe =>
          fileHasFieldIds(spark, new Path(fe.path)))
        val edSchema =
          if (idMatched)
            StructType(ids.zip(cols).map { case (id, f) =>
              f.copy(metadata = new MetadataBuilder()
                .putLong("parquet.field.id", id.toLong).build())
            })
          else StructType(cols)
        // id-matched reads go through the field-id session (the conf
        // is scoped there, never set on the caller's session)
        val edReader =
          if (idMatched) fieldIdSession(spark).read else spark.read
        val ed = fs.groupBy(_.seq).toSeq
          .map { case (seq, group) =>
            edReader.schema(edSchema).parquet(group.map(_.path): _*)
              .withColumn("_ed_seq", lit(seq))
          }.reduce(_ unionByName _)
          .groupBy(cols.map(f => col(f.name)): _*)
          .agg(max(col("_ed_seq")).as("_ed_seq"))
          .select(cols.map(f => col(f.name).as(s"_ed_${f.name}")) :+
            col("_ed_seq"): _*)
        val cond = cols.map(f => data(f.name) <=> ed(s"_ed_${f.name}"))
          .reduce(_ && _)
        data = data.join(ed, cond, "left")
          .filter(col("_ed_seq").isNull || col("_ed_seq") <= col(SeqCol))
          .drop("_ed_seq" +: cols.map(f => s"_ed_${f.name}"): _*)
      }
    val out = data.select(schema.fieldNames.map(col).toSeq: _*)
    // pruning is file-level; the row predicate still applies
    where.fold(out)(w => out.filter(expr(w)))
  }

  /** (delete files, delete rows) referenced by the CURRENT snapshot —
    * the MOR witness a sync's O(batch) claim is checked against.
    */
  def deleteFileStats(spark: SparkSession, table: String): (Int, Long) = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no Iceberg metadata at $table")
    val meta = parseMetadata(spark, table, vs.max)
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() ==
        meta.get("current-snapshot-id").asLong()).get
    val listPath = resolvePath(table, snap.get("manifest-list").asText())
    readAvro(spark, listPath)
      .filter(mf => intOf(mf, "content").contains(1))
      .flatMap(mf => readAvro(spark,
        resolvePath(table, mf.get("manifest_path").toString)))
      .filter(_.get("status").asInstanceOf[Int] != 2)
      .map(_.get("data_file").asInstanceOf[GenericRecord])
      .foldLeft((0, 0L)) { case ((f, r), df) =>
        (f + 1, r + df.get("record_count").asInstanceOf[Long])
      }
  }
}
