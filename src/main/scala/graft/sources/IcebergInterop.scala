package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.streaming.CdcApply

/** Apache Iceberg table-format interop — the second half of the
  * BASELINE's "Delta/Iceberg" format list, the [[DeltaInterop]]
  * pattern pointed at the Iceberg v1 spec (iceberg.apache.org/spec/ —
  * public: a `metadata/` tree of JSON table metadata + Avro manifest
  * lists + Avro manifests naming plain parquet data files; no library
  * required — Avro container files are written/read with the Avro
  * Java API that ships with Spark).
  *
  * Mapping (reference analog: the Glue external-table contract,
  * `main.tf:303-372` — a catalog entry OVER parquet, exactly what an
  * Iceberg metadata tree is):
  *
  *  - CDC table batches  → Iceberg SNAPSHOTS (snapshot-id = export
  *    version; every export appends one snapshot and re-points
  *    `current-snapshot-id`, so history stays time-travelable),
  *  - bucket directories → MANIFESTS (one Avro manifest per bucket
  *    per rewrite; a snapshot's manifest list carries the CURRENT
  *    manifest of every live bucket — unchanged buckets' manifests
  *    are REUSED by path, the O(changed buckets) incremental shape),
  *  - parquet footer stats → Iceberg COLUMN STATS (per-file
  *    record_count, file_size_in_bytes, and lower/upper bounds for
  *    int/long/double columns in the spec's little-endian
  *    single-value binary form — the pruning metadata Iceberg readers
  *    plan against).
  *
  * [[exportIncremental]] publishes/syncs the CDC table at `cdcRoot`
  * into the Iceberg v1 layout at `tableDir`; [[readIceberg]] replays
  * the metadata tree (ours or any v1 writer's) into one
  * schema-declared parquet scan — pruning, pushdown, codegen all
  * ordinary. Format-version 2 trees (sequence numbers + delete
  * files) dispatch to [[IcebergV2]] — read here, written by
  * [[IcebergV2.exportIncremental]]. Versions beyond v2 are REFUSED
  * loudly, never misread; so are column types outside the supported
  * primitive set.
  *
  * Crash consistency mirrors [[DeltaInterop]]: the commit point is
  * the RENAME of `v<N>.metadata.json`; pre-commit debris (data dirs,
  * manifest/tmp files for the failing version) is swept on the next
  * attempt, and a sidecar state file stamped with the committed
  * version detects the post-commit crash window and self-heals with
  * a full rewrite.
  */
object IcebergInterop {

  private[sources] val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private[sources] def metaDir(table: String) = new Path(table, "metadata")
  private[sources] def metadataFile(table: String, v: Long) =
    new Path(metaDir(table), s"v$v.metadata.json")
  private[sources] def manifestListFile(table: String, v: Long) =
    new Path(metaDir(table), s"snap-$v.avro")
  private def manifestFile(table: String, v: Long, bucket: Int) =
    new Path(metaDir(table), s"manifest-$v-b$bucket.avro")

  /** Absolute path or full URI? Hadoop renders local URIs with a
    * SINGLE slash (`file:/tmp/x`), so a bare `://` test misses them.
    */
  private[sources] def isAbsolute(p: String): Boolean =
    p.startsWith("/") || p.matches("[A-Za-z][A-Za-z0-9+.-]*:.*")

  /** Manifest/file path resolved against the table root when
    * relative; absolute URIs (the spec-conformant form) pass through.
    */
  private[sources] def resolvePath(table: String, p: String): Path =
    if (isAbsolute(p)) new Path(p) else new Path(table, p)

  /** A manifest/file path back in table-relative form when it lives
    * under the table root (absolute URIs are what conformant
    * manifests carry; the sweep and state bookkeeping key on the
    * relative form). Foreign-rooted paths pass through unchanged.
    */
  private def relativize(fs: org.apache.hadoop.fs.FileSystem,
      table: String, p: String): String = {
    if (!isAbsolute(p)) return p
    val prefix = fs.makeQualified(new Path(table)).toString
    val q = fs.makeQualified(new Path(p)).toString
    if (q.startsWith(prefix + "/")) q.stripPrefix(prefix + "/") else p
  }

  /** Committed metadata versions, ascending; empty = no table. The
    * listing (not version-hint.text) is the source of truth — the
    * hint is advisory output for HadoopTables-convention readers.
    */
  /** Committed metadata files by version, BOTH public naming
    * conventions: `v<N>.metadata.json` (HadoopTables — what this
    * exporter writes) and `<seq>-<uuid>.metadata.json` (what
    * metastore-catalog writers leave in the tree). When one version
    * carries both names, the v-named file (our own lineage) wins.
    */
  private[sources] def metadataFiles(spark: SparkSession,
      table: String): Seq[(Long, Path)] = {
    val fs = CdcApply.fsFor(spark, table)
    val dir = metaDir(table)
    if (!fs.exists(dir)) return Seq.empty
    val V = "v(\\d+)\\.metadata\\.json".r
    val Seqd = "(\\d+)-[0-9a-fA-F-]+\\.metadata\\.json".r
    fs.listStatus(dir).toSeq.map(_.getPath)
      .flatMap { p =>
        p.getName match {
          case V(v) => Some((v.toLong, p, 0))
          case Seqd(v) => Some((v.toLong, p, 1))
          case _ => None
        }
      }
      .groupBy(_._1).toSeq
      .map { case (v, ps) => (v, ps.minBy(_._3)._2) }
      .sortBy(_._1)
  }

  private[sources] def versions(spark: SparkSession, table: String): Seq[Long] =
    metadataFiles(spark, table).map(_._1)

  // ---- Iceberg schema JSON <-> Spark StructType --------------------------

  private[sources] def icebergType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case StringType => "string"
    case BooleanType => "boolean"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case t: DecimalType => s"decimal(${t.precision}, ${t.scale})"
    case other => throw new UnsupportedOperationException(
      s"Iceberg export supports primitive columns only; got $other " +
        "(nested types need field-id assignment this exporter does " +
        "not implement — refusing rather than writing unreadable " +
        "metadata)")
  }

  private[sources] def sparkType(t: String): DataType = {
    val Dec = "decimal\\((\\d+),\\s*(\\d+)\\)".r
    t match {
      case "long" => LongType
      case "int" => IntegerType
      case "double" => DoubleType
      case "float" => FloatType
      case "string" => StringType
      case "boolean" => BooleanType
      case "binary" => BinaryType
      case "date" => DateType
      case "timestamptz" => TimestampType
      case Dec(p, s) => DecimalType(p.toInt, s.toInt)
      case other => throw new UnsupportedOperationException(
        s"Iceberg reader: unsupported column type '$other'")
    }
  }

  private[sources] def schemaNode(schema: StructType)
      : com.fasterxml.jackson.databind.node.ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "struct")
    n.put("schema-id", 0)
    val fields = n.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = fields.addObject()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", !f.nullable)
      fn.put("type", icebergType(f.dataType))
    }
    n
  }

  // ---- Avro schemas (field-ids per the Iceberg spec) ----------------------

  private val manifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503},
      |{"name":"added_data_files_count","type":["null","int"],"default":null,"field-id":504},
      |{"name":"existing_data_files_count","type":["null","int"],"default":null,"field-id":505},
      |{"name":"deleted_data_files_count","type":["null","int"],"default":null,"field-id":506},
      |{"name":"added_rows_count","type":["null","long"],"default":null,"field-id":512},
      |{"name":"existing_rows_count","type":["null","long"],"default":null,"field-id":513},
      |{"name":"deleted_rows_count","type":["null","long"],"default":null,"field-id":514}
      |]}""".stripMargin)

  private val manifestEntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104},
      |{"name":"block_size_in_bytes","type":"long","field-id":105},
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
    manifestEntrySchema.getField("data_file").schema()
  private def boundsArraySchema(field: String): Schema =
    dataFileSchema.getField(field).schema().getTypes.get(1)

  // ---- column stats from parquet footers ----------------------------------

  /** Iceberg single-value binary serialization (spec Appendix D):
    * little-endian fixed width for the numeric types we emit bounds
    * for.
    */
  private[sources] def serialize(dt: DataType, v: Any): Option[Array[Byte]] = {
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (dt, v) match {
      case (LongType, x: java.lang.Long) =>
        Some(bb.putLong(x).array())
      case (IntegerType, x: java.lang.Integer) =>
        Some(java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(x).array())
      case (DoubleType, x: java.lang.Double) =>
        Some(bb.putDouble(x).array())
      case _ => None
    }
  }

  /** One data file's manifest stats, read from its parquet FOOTER —
    * metadata-only (no row scan): exact row count, and per-column
    * lower/upper bounds for the int/long/double columns whose chunk
    * statistics are present in every block.
    */
  private[sources] def footerStats(spark: SparkSession, file: Path,
      schema: StructType, fieldIds: Option[Map[String, Int]] = None)
      : (Long, Map[Int, Array[Byte]], Map[Int, Array[Byte]]) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(file, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val byId = schema.fields.zipWithIndex.map { case (f, i) =>
        (f.name, (fieldIds.fold(i + 1)(_(f.name)), f.dataType))
      }.toMap
      val lower = scala.collection.mutable.Map[Int, Any]()
      val upper = scala.collection.mutable.Map[Int, Any]()
      val incomplete = scala.collection.mutable.Set[Int]()
      blocks.foreach(_.getColumns.asScala.foreach { c =>
        byId.get(c.getPath.toDotString).foreach { case (id, dt) =>
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue) incomplete += id
          else {
            val mn = st.genericGetMin.asInstanceOf[Comparable[Any]]
            val mx = st.genericGetMax.asInstanceOf[Comparable[Any]]
            lower.updateWith(id)(cur => Some(cur.fold(mn: Any)(c0 =>
              if (mn.compareTo(c0) < 0) mn else c0)))
            upper.updateWith(id)(cur => Some(cur.fold(mx: Any)(c0 =>
              if (mx.compareTo(c0) > 0) mx else c0)))
          }
        }
      })
      def ser(m: scala.collection.Map[Int, Any]): Map[Int, Array[Byte]] =
        m.toMap.collect {
          case (id, v) if !incomplete(id) =>
            val dt = byId.values.find(_._1 == id).get._2
            serialize(dt, v).map(id -> _)
        }.flatten.toMap
      (rows, ser(lower), ser(upper))
    } finally r.close()
  }

  // ---- manifest / manifest-list writing -----------------------------------

  private def boundsMap(field: String,
      m: Map[Int, Array[Byte]]): java.util.List[GenericRecord] = {
    val itemSchema = boundsArraySchema(field).getElementType
    m.toSeq.sortBy(_._1).map { case (id, bytes) =>
      val rec = new GenericData.Record(itemSchema)
      rec.put("key", id)
      rec.put("value", java.nio.ByteBuffer.wrap(bytes))
      rec: GenericRecord
    }.asJava
  }

  /** Write one bucket's manifest: every file an ADDED entry stamped
    * with this snapshot. Returns (path, nFiles, nRows).
    */
  private def writeManifest(spark: SparkSession, table: String,
      version: Long, bucket: Int, files: Seq[(String, Long)],
      schema: StructType): (String, Int, Long) = {
    val fs = CdcApply.fsFor(spark, table)
    val path = manifestFile(table, version, bucket)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestEntrySchema))
    w.setMeta("schema", mapper.writeValueAsString(schemaNode(schema)))
    w.setMeta("partition-spec", "[]")
    w.setMeta("partition-spec-id", "0")
    w.setMeta("format-version", "1")
    w.setMeta("content", "data")
    w.create(manifestEntrySchema, fs.create(path, false))
    var rows = 0L
    try files.foreach { case (rel, size) =>
      val (nRows, lo, hi) =
        footerStats(spark, new Path(table, rel), schema)
      rows += nRows
      val df = new GenericData.Record(dataFileSchema)
      // spec: file_path is a full URI (readIceberg keeps a relative
      // fallback for trees written by pre-conformance exports)
      df.put("file_path",
        fs.makeQualified(new Path(table, rel)).toString)
      df.put("file_format", "PARQUET")
      df.put("partition",
        new GenericData.Record(dataFileSchema.getField("partition")
          .schema()))
      df.put("record_count", nRows)
      df.put("file_size_in_bytes", size)
      // v1-required (deprecated in v2); the conventional default
      df.put("block_size_in_bytes", 67108864L)
      if (lo.nonEmpty) df.put("lower_bounds", boundsMap("lower_bounds", lo))
      if (hi.nonEmpty) df.put("upper_bounds", boundsMap("upper_bounds", hi))
      val e = new GenericData.Record(manifestEntrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", java.lang.Long.valueOf(version))
      e.put("data_file", df)
      w.append(e)
    } finally w.close()
    (s"metadata/${path.getName}", files.size, rows)
  }

  /** Per-manifest bookkeeping the sidecar state carries so unchanged
    * manifests can be re-listed with correct counts.
    */
  private case class ManifestRef(path: String, snap: Long, nFiles: Int,
      nRows: Long)

  private def writeManifestList(spark: SparkSession, table: String,
      version: Long, manifests: Seq[(ManifestRef, Boolean)]): Unit = {
    val fs = CdcApply.fsFor(spark, table)
    val path = manifestListFile(table, version)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestListSchema))
    w.setMeta("format-version", "1")
    w.setMeta("snapshot-id", version.toString)
    w.create(manifestListSchema, fs.create(path, false))
    try manifests.foreach { case (m, fresh) =>
      val rec = new GenericData.Record(manifestListSchema)
      // spec: manifest_path is a full URI (state sidecar keeps the
      // table-relative form; readers fall back on relative too)
      rec.put("manifest_path",
        fs.makeQualified(new Path(table, m.path)).toString)
      rec.put("manifest_length",
        fs.getFileStatus(new Path(table, m.path)).getLen)
      rec.put("partition_spec_id", 0)
      rec.put("added_snapshot_id", java.lang.Long.valueOf(m.snap))
      rec.put("added_data_files_count",
        java.lang.Integer.valueOf(if (fresh) m.nFiles else 0))
      rec.put("existing_data_files_count",
        java.lang.Integer.valueOf(if (fresh) 0 else m.nFiles))
      rec.put("deleted_data_files_count", java.lang.Integer.valueOf(0))
      rec.put("added_rows_count",
        java.lang.Long.valueOf(if (fresh) m.nRows else 0L))
      rec.put("existing_rows_count",
        java.lang.Long.valueOf(if (fresh) 0L else m.nRows))
      rec.put("deleted_rows_count", java.lang.Long.valueOf(0L))
      w.append(rec)
    } finally w.close()
  }

  // ---- export --------------------------------------------------------------

  private[sources] def statePath(table: String) =
    new Path(table, "_graft_export_state.json")

  private def readState(spark: SparkSession, table: String)
      : Option[(Long, Map[Int, (String, ManifestRef)])] = {
    val fs = CdcApply.fsFor(spark, table)
    if (!fs.exists(statePath(table))) return None
    val in = fs.open(statePath(table))
    val text = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    val n = mapper.readTree(text)
    if (Option(n.get("format")).exists(_.asInt() == 2))
      throw new IllegalStateException(
        s"Iceberg table at $table was exported as format v2 — " +
          "continue it with IcebergV2.exportIncremental (mixing " +
          "writers would corrupt the sequence-number lineage)")
    val v = Option(n.get("version")).map(_.asLong(-1L)).getOrElse(-1L)
    val buckets = Option(n.get("buckets")).map(
      _.properties().asScala.map { e =>
        val b = e.getValue
        e.getKey.toInt -> (b.get("identity").asText(),
          ManifestRef(b.get("manifest").asText(),
            b.get("snap").asLong(), b.get("nfiles").asInt(),
            b.get("nrows").asLong()))
      }.toMap).getOrElse(Map.empty[Int, (String, ManifestRef)])
    Some((v, buckets))
  }

  /** Sweep the pre-commit debris a crashed export of `version` can
    * leave (data dir, manifests, manifest list, metadata tmp) — none
    * can be referenced by a committed metadata file, by construction.
    */
  private def clearAborted(spark: SparkSession, table: String,
      version: Long): Unit = {
    val fs = CdcApply.fsFor(spark, table)
    Seq(new Path(table, s"data/v$version"),
      manifestListFile(table, version),
      new Path(metaDir(table), s".tmp-$version")).foreach(p =>
      if (fs.exists(p)) fs.delete(p, true))
    if (fs.exists(metaDir(table)))
      fs.listStatus(metaDir(table)).toSeq
        .filter(_.getPath.getName.matches(s"manifest-$version-b\\d+\\.avro"))
        .foreach(st => fs.delete(st.getPath, false))
  }

  /** INCREMENTAL Iceberg export — sync the CDC table's current state
    * at `cdcRoot` into the Iceberg v1 table at `tableDir` as ONE new
    * snapshot, rewriting ONLY the buckets whose physical identity
    * changed since the last sync (first call exports everything).
    * Returns the committed snapshot id, or None when nothing changed
    * (no empty snapshots). O(changed buckets) data work + one
    * footer read per written file — the [[DeltaInterop]] cost class.
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
      tableDir: String): Option[Long] = {
    val m = CdcApply.currentManifest(spark, cdcRoot).getOrElse(
      throw new IllegalArgumentException(s"no CDC table at $cdcRoot"))
    val fs = CdcApply.fsFor(spark, tableDir)
    val priorVs = versions(spark, tableDir)
    val rawState = readState(spark, tableDir)
    if (priorVs.nonEmpty && rawState.isEmpty) {
      // no sidecar next to committed metadata: a foreign writer's tree
      // (refuse), or our own lineage whose state was lost — the
      // deterministic table-uuid tells them apart; own lineage
      // self-heals below exactly like a stale stamp (full rewrite)
      if (!ownLineage(spark, tableDir, priorVs.last))
        throw new IllegalStateException(
          s"Iceberg table at $tableDir has committed metadata but no " +
            "export state — it was written by a foreign writer; " +
            "incremental export requires its own lineage. Use a fresh " +
            "directory.")
      if (formatVersion(parseMetadata(spark, tableDir, priorVs.last)) != 1)
        throw new IllegalStateException(
          s"Iceberg table at $tableDir was exported as format v2 — " +
            "continue it with IcebergV2.exportIncremental (mixing " +
            "writers would corrupt the sequence-number lineage)")
    }
    val stateConsistent =
      rawState.exists(_._1 == priorVs.lastOption.getOrElse(-1L))
    val prior: Map[Int, (String, ManifestRef)] =
      if (stateConsistent) rawState.get._2
      else Map.empty // stale stamp: self-heal with a full rewrite
    val current: Map[Int, String] =
      bucketIdentity(m)
    val changed = current.filter { case (id, ident) =>
      !prior.get(id).exists(_._1 == ident) }.keys.toSeq.sorted
    val dropped = (prior.keySet -- current.keySet).toSeq.sorted
    if (changed.isEmpty && dropped.isEmpty && priorVs.nonEmpty)
      return None
    val version = priorVs.lastOption.map(_ + 1L).getOrElse(0L)
    clearAborted(spark, tableDir, version)
    val schema = CdcApply.applyRenames(CdcApply.stripInternal(
      CdcApply.readBucketsResolved(spark, cdcRoot, m, None).get, m.conf),
      m).schema
    schema.fields.foreach(f => icebergType(f.dataType)) // refuse early
    // rewrite each changed bucket's RESOLVED logical rows, then one
    // manifest per rewritten bucket (footer stats included)
    val written: Map[Int, ManifestRef] = changed.map { id =>
      val rel = s"data/v$version/b$id"
      CdcApply.applyRenames(CdcApply.stripInternal(
        CdcApply.readBucketsResolved(spark, cdcRoot, m, Some(Seq(id)))
          .getOrElse(throw new IllegalStateException(
            s"bucket $id vanished during export of $cdcRoot")),
        m.conf), m)
        .write.mode("errorifexists")
        .parquet(new Path(tableDir, rel).toString)
      val files = fs.listStatus(new Path(tableDir, rel)).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => (s"$rel/${st.getPath.getName}", st.getLen))
      val (mp, nf, nr) =
        writeManifest(spark, tableDir, version, id, files, schema)
      id -> ManifestRef(mp, version, nf, nr)
    }.toMap
    // manifest list: fresh manifests for changed buckets, carried
    // manifests for unchanged ones (dropped buckets simply vanish)
    val listed: Seq[(ManifestRef, Boolean)] =
      current.keys.toSeq.sorted.map { id =>
        written.get(id).map((_, true))
          .getOrElse((prior(id)._2, false))
      }
    writeManifestList(spark, tableDir, version, listed)
    // table metadata: prior snapshots carried forward (time travel),
    // current re-pointed; commit = the metadata rename
    val meta = mapper.createObjectNode()
    meta.put("format-version", 1)
    meta.put("table-uuid", java.util.UUID
      .nameUUIDFromBytes(tableDir.getBytes("UTF-8")).toString)
    meta.put("location", tableDir)
    meta.put("last-updated-ms", version)
    meta.put("last-column-id", schema.fields.length)
    meta.set[com.fasterxml.jackson.databind.node.ObjectNode](
      "schema", schemaNode(schema))
    val schemas = meta.putArray("schemas")
    schemas.add(schemaNode(schema))
    meta.put("current-schema-id", 0)
    meta.putArray("partition-spec")
    val specs = meta.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    spec0.putArray("fields")
    meta.put("default-spec-id", 0)
    meta.put("last-partition-id", 999)
    meta.putObject("properties")
    meta.put("current-snapshot-id", version)
    val snaps = meta.putArray("snapshots")
    // the RETAINED snapshot list carries forward from the prior
    // metadata (never re-derived from version filenames — after an
    // [[expireSnapshots]] the two diverge, and resurrecting expired
    // ids would point readers at deleted manifest lists)
    val priorSnapIds: Seq[Long] = priorVs.lastOption.map { pv =>
      parseMetadata(spark, tableDir, pv).get("snapshots")
        .elements().asScala.map(_.get("snapshot-id").asLong()).toSeq
    }.getOrElse(Seq.empty)
    (priorSnapIds :+ version).foreach { v =>
      val sn = snaps.addObject()
      sn.put("snapshot-id", v)
      sn.put("timestamp-ms", v)
      sn.put("schema-id", 0)
      val sum = sn.putObject("summary")
      sum.put("operation", if (v == 0L) "append" else "overwrite")
      sn.put("manifest-list", fs.makeQualified(
        new Path(tableDir, s"metadata/snap-$v.avro")).toString)
    }
    meta.putArray("snapshot-log")
    meta.putArray("metadata-log")
    val tmp = new Path(metaDir(tableDir), s".tmp-$version")
    val out = fs.create(tmp, false)
    out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(meta).getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, metadataFile(tableDir, version)))
      throw new IllegalStateException(
        s"concurrent Iceberg export lost the commit race for " +
          s"version $version of $tableDir")
    // advisory version hint for HadoopTables-convention readers
    replaceSmallFile(spark, new Path(metaDir(tableDir), s".hint-$version"),
      new Path(metaDir(tableDir), "version-hint.text"),
      version.toString.getBytes("UTF-8"))
    // sidecar state, stamped with the committed version
    val newState = mapper.createObjectNode()
    newState.put("version", version)
    val bn = newState.putObject("buckets")
    current.toSeq.sortBy(_._1).foreach { case (id, ident) =>
      val r = written.getOrElse(id, prior(id)._2)
      val b = bn.putObject(id.toString)
      b.put("identity", ident)
      b.put("manifest", r.path)
      b.put("snap", r.snap)
      b.put("nfiles", r.nFiles)
      b.put("nrows", r.nRows)
    }
    replaceSmallFile(spark,
      new Path(tableDir, s"._graft_export_state-$version"),
      statePath(tableDir),
      mapper.writeValueAsString(newState).getBytes("UTF-8"))
    Some(version)
  }

  /** EXPIRE SNAPSHOTS — Iceberg's maintenance op: commit a new
    * metadata version retaining ONLY the current snapshot, then
    * delete every data file, manifest, and manifest list no other
    * retained snapshot references. Time travel to expired ids stops
    * resolving (by design — that is what expiry means); the current
    * read is bit-identical before and after. Returns the deleted
    * paths (table-relative). Driver-side metadata work + one delete
    * per dead file; the sidecar state is re-stamped so the next
    * incremental export syncs normally instead of self-healing.
    */
  def expireSnapshots(spark: SparkSession, table: String): Seq[String] = {
    val fs = CdcApply.fsFor(spark, table)
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no Iceberg metadata at $table")
    val meta = parseMetadata(spark, table, vs.max)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val cur = meta.get("current-snapshot-id").asLong()
    val retainedIds = meta.get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong()).toSeq
    val version = vs.max + 1
    val committed = retainedIds != Seq(cur)
    if (committed) {
      // single-writer contract (as for export): the sweep below and
      // this debris clear assume no concurrent export is mid-flight
      clearAborted(spark, table, version)
      // rewrite the snapshot list to [current]; everything else
      // (schema, spec, pointer) carries over verbatim
      val keep = meta.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() == cur).get
      val snaps = meta.putArray("snapshots")
      snaps.add(keep)
      meta.put("last-updated-ms", version)
      val tmp = new Path(metaDir(table), s".tmp-$version")
      val out = fs.create(tmp, false)
      out.write(mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsString(meta).getBytes("UTF-8"))
      out.close()
      if (!fs.rename(tmp, metadataFile(table, version)))
        throw new IllegalStateException(
          s"concurrent commit lost the expire race for $table")
      // re-stamp the sidecar so the next export sees a consistent
      // lineage (content unchanged — expiry moves no buckets for v1,
      // no manifests for v2; only the committed-version stamp moves)
      if (fs.exists(statePath(table))) {
        val in = fs.open(statePath(table))
        val text = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        in.close()
        val n = mapper.readTree(text)
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        n.put("version", version)
        replaceSmallFile(spark,
          new Path(table, s"._graft_export_state-$version"),
          statePath(table),
          mapper.writeValueAsString(n).getBytes("UTF-8"))
      }
    }
    // sweep: live set = the current snapshot's files + manifests +
    // its manifest list; everything else under data/v*/ and the
    // metadata manifest/list namespace is dead. Dirs at or above the
    // expiry's own metadata version are an in-flight export's —
    // skipped, exactly like Delta vacuum.
    val newMeta = parseMetadata(spark, table,
      if (committed) version else vs.max)
    val liveData = liveFiles(spark, table, newMeta, cur)
      .map(relativize(fs, table, _)).toSet
    val liveManifests = {
      val snap = newMeta.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() == cur).get
      readAvro(spark, new Path(snap.get("manifest-list").asText))
        .map(r => relativize(fs, table, r.get("manifest_path").toString))
        .toSet
    }
    val dead = scala.collection.mutable.ArrayBuffer[String]()
    val dataRoot = new Path(table, "data")
    if (fs.exists(dataRoot))
      fs.listStatus(dataRoot).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.matches("v\\d+") &&
          st.getPath.getName.stripPrefix("v").toLong < version)
        .foreach { dir =>
          def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
            if (st.isDirectory) walk(st.getPath)
            else if (st.getPath.getName.endsWith(".parquet")) {
              val rel = st.getPath.toString
                .stripPrefix(fs.makeQualified(new Path(table)).toString)
                .stripPrefix("/")
              if (!liveData.contains(rel)) {
                fs.delete(st.getPath, false); dead += rel
              }
            }
          }
          walk(dir.getPath)
        }
    // metadata sweep gets the SAME in-flight carve-out as the data
    // walk above: manifests / manifest lists stamped with a version
    // at or above this expiry's own metadata version belong to a
    // concurrent export that has not committed yet — deleting them
    // would let that export commit metadata pointing at nothing
    val ManifestName = "manifest-(\\d+)-(?:b\\d+|data|del)\\.avro".r
    val ListName = "snap-(\\d+)\\.avro".r
    fs.listStatus(metaDir(table)).toSeq.foreach { st =>
      val n = st.getPath.getName
      val rel = s"metadata/$n"
      val isDeadManifest = n match {
        case ManifestName(v) =>
          v.toLong < version && !liveManifests.contains(rel)
        case _ => false
      }
      val isDeadList = n match {
        case ListName(v) => v.toLong < version && v.toLong != cur
        case _ => false
      }
      if (isDeadManifest || isDeadList) {
        fs.delete(st.getPath, false); dead += rel
      }
    }
    dead.toSeq
  }

  /** CONTINUOUS export — [[DeltaInterop.startContinuousExport]]'s
    * Iceberg twin: a Structured Streaming query tailing the CDC
    * changelog whose every micro-batch runs one [[exportIncremental]]
    * sync. The changelog events are the WAKE SIGNAL only (the sync
    * reads the manifest), so the Iceberg mirror follows the table at
    * O(changed buckets) per sync. Requires a changelog-enabled table;
    * caller owns the returned query's lifecycle.
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
        exportIncremental(spark, cdcRoot, tableDir)
        ()
      }
      .start()
  }

  // ---- read ----------------------------------------------------------------

  private[sources] def readAvro(spark: SparkSession, path: Path)
      : Seq[GenericRecord] = {
    val fs = CdcApply.fsFor(spark, path.toString)
    val in = new DataFileStream[GenericRecord](fs.open(path),
      new GenericDatumReader[GenericRecord]())
    try {
      val buf = scala.collection.mutable.ArrayBuffer[GenericRecord]()
      while (in.hasNext) buf += in.next()
      buf.toSeq
    } finally in.close()
  }

  private[sources] def parseMetadata(spark: SparkSession, table: String,
      v: Long): com.fasterxml.jackson.databind.JsonNode = {
    val fs = CdcApply.fsFor(spark, table)
    // resolve through the listing so foreign `<seq>-<uuid>` metadata
    // names open too; our own v-named files resolve without it
    val path =
      if (fs.exists(metadataFile(table, v))) metadataFile(table, v)
      else metadataFiles(spark, table).find(_._1 == v).map(_._2)
        .getOrElse(metadataFile(table, v))
    val in = fs.open(path)
    val text = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    val n = mapper.readTree(text)
    val fv = formatVersion(n)
    if (fv != 1 && fv != 2) throw new UnsupportedOperationException(
      s"Iceberg table $table declares format-version $fv; this engine " +
        "implements v1 and v2 (row-lineage and later are v3)")
    n
  }

  private[sources] def formatVersion(
      meta: com.fasterxml.jackson.databind.JsonNode): Int =
    Option(meta.get("format-version")).map(_.asInt()).getOrElse(-1)

  /** The current schema node: the deprecated single `schema` field
    * when present, else `schemas[current-schema-id]` (the only form
    * v2-native writers emit).
    */
  private[sources] def schemaJson(
      meta: com.fasterxml.jackson.databind.JsonNode)
      : com.fasterxml.jackson.databind.JsonNode =
    Option(meta.get("schema")).getOrElse {
      val cur = Option(meta.get("current-schema-id")).map(_.asInt())
        .getOrElse(0)
      meta.get("schemas").elements().asScala
        .find(s => Option(s.get("schema-id")).exists(_.asInt() == cur))
        .getOrElse(throw new IllegalArgumentException(
          s"metadata has no schema with schema-id $cur"))
    }

  private[sources] def schemaOf(meta: com.fasterxml.jackson.databind.JsonNode)
      : StructType = {
    val fields = schemaJson(meta).get("fields").elements().asScala
      .map { f =>
        StructField(f.get("name").asText(),
          sparkType(f.get("type").asText()),
          nullable = !f.get("required").asBoolean())
      }.toSeq
    StructType(fields)
  }

  /** Field-id → StructField for the current schema — what equality
    * delete files' `equality_ids` resolve against.
    */
  private[sources] def schemaFieldsById(
      meta: com.fasterxml.jackson.databind.JsonNode)
      : Map[Int, StructField] =
    schemaJson(meta).get("fields").elements().asScala.map { f =>
      f.get("id").asInt() -> StructField(f.get("name").asText(),
        sparkType(f.get("type").asText()),
        nullable = !f.get("required").asBoolean())
    }.toMap

  /** The schema with each field's Iceberg id attached as
    * `parquet.field.id` metadata — when the data files carry parquet
    * field ids (every real Iceberg writer's do), Spark's id-based
    * clipping resolves columns by ID instead of name, so a foreign
    * table whose CURRENT schema renamed a column still reads the old
    * files' values (name matching would surface NULLs).
    */
  private[sources] def schemaWithFieldIds(
      meta: com.fasterxml.jackson.databind.JsonNode): StructType =
    StructType(schemaJson(meta).get("fields").elements().asScala.map {
      f =>
        StructField(f.get("name").asText(),
          sparkType(f.get("type").asText()),
          nullable = !f.get("required").asBoolean(),
          metadata = new MetadataBuilder()
            .putLong("parquet.field.id", f.get("id").asLong())
            .build())
    }.toSeq)

  /** Do this parquet file's columns carry field ids? One footer read;
    * decides whether the scan matches by id (foreign Iceberg writers)
    * or by name (this engine's own exports — Spark writes no ids by
    * default, and id-matching against id-less files reads nothing).
    */
  private[sources] def fileHasFieldIds(spark: SparkSession,
      file: Path): Boolean = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(file, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val fields = r.getFooter.getFileMetaData.getSchema.getFields
      !fields.isEmpty && fields.asScala.forall(_.getId != null)
    } finally r.close()
  }

  /** Sessions derived per parent session with
    * `spark.sql.parquet.fieldId.read.enabled=true` — the flag an
    * id-matched scan needs. Scoping it to a derived session (the scan
    * relation captures its own session, so execution reads the child's
    * conf however the frame is later composed) means an interop read
    * never mutates the caller's session conf. Weak keys: a dropped
    * parent session releases its child.
    */
  private val fieldIdSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SparkSession]())

  private[sources] def fieldIdSession(spark: SparkSession): SparkSession =
    fieldIdSessions.synchronized {
      Option(fieldIdSessions.get(spark)).getOrElse {
        val ns = spark.newSession()
        // carry the caller's runtime SQL conf (shuffle partitions,
        // AQE, ...); static/immutable entries just refuse — skip them
        spark.conf.getAll.foreach { case (k, v) =>
          scala.util.Try(ns.conf.set(k, v)) }
        ns.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        fieldIdSessions.put(spark, ns)
        ns
      }
    }

  /** Atomic small-file replace: write a temp, then ONE
    * OVERWRITE-rename onto `dest`. The prior delete-then-rename pair
    * had a crash window that left committed metadata with no state
    * sidecar — which the foreign-writer guard then read as "not our
    * lineage", permanently wedging the export until manual repair.
    */
  private[sources] def replaceSmallFile(spark: SparkSession, tmp: Path,
      dest: Path, bytes: Array[Byte]): Unit = {
    val fs = CdcApply.fsFor(spark, dest.toString)
    val out = fs.create(tmp, true)
    out.write(bytes)
    out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dest.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Is the committed metadata at `table` this exporter's own lineage?
    * The exporter stamps a DETERMINISTIC table-uuid
    * (`nameUUIDFromBytes(tableDir)`), so a missing state sidecar (the
    * old delete-then-rename crash window, or a hand-deleted file) is
    * distinguishable from a foreign writer's tree: own lineage
    * self-heals with a full-rewrite snapshot, foreign trees still
    * refuse loudly. Callers must pass the same table-dir string the
    * exports used (a different spelling of the path reads as foreign —
    * which only refuses, never misreads).
    */
  private[sources] def ownLineage(spark: SparkSession, table: String,
      version: Long): Boolean =
    Option(parseMetadata(spark, table, version).get("table-uuid"))
      .exists(_.asText() == java.util.UUID
        .nameUUIDFromBytes(table.getBytes("UTF-8")).toString)

  /** Pick the scan reader for a set of Iceberg data files: id-matched
    * through [[fieldIdSession]] when the files carry field ids, plain
    * name-matched on the caller's session otherwise.
    */
  private[sources] def scanReader(spark: SparkSession,
      meta: com.fasterxml.jackson.databind.JsonNode,
      firstFile: Option[Path]): org.apache.spark.sql.DataFrameReader =
    if (firstFile.exists(fileHasFieldIds(spark, _)))
      fieldIdSession(spark).read.schema(schemaWithFieldIds(meta))
    else spark.read.schema(schemaOf(meta))

  /** One live data file with its pruning context: the manifest's
    * partition-spec-id, the entry's raw `partition` record, and the
    * column bounds (field-id → single-value-serialized bytes).
    */
  private[sources] case class LiveDataFile(path: String, specId: Int,
      partition: Option[GenericRecord],
      lower: Map[Int, Array[Byte]], upper: Map[Int, Array[Byte]])

  /** Bounds map from a data_file record's `lower_bounds` /
    * `upper_bounds` — tolerant of both the spec's array-of-(key,
    * value) form (what this engine and real writers emit) and a plain
    * Avro map with stringified keys.
    */
  private[sources] def boundsOf(df: GenericRecord,
      field: String): Map[Int, Array[Byte]] = {
    def bytes(v: Any): Array[Byte] = v match {
      case bb: java.nio.ByteBuffer =>
        val d = bb.duplicate()
        val a = new Array[Byte](d.remaining())
        d.get(a)
        a
      case a: Array[Byte] => a
      case other => other.toString.getBytes("UTF-8")
    }
    if (df.getSchema.getField(field) == null) Map.empty
    else Option(df.get(field)).map {
      case l: java.util.List[_] =>
        l.asScala.flatMap { r0 =>
          val r = r0.asInstanceOf[GenericRecord]
          scala.util.Try(
            r.get("key").asInstanceOf[Number].intValue() ->
              bytes(r.get("value"))).toOption
        }.toMap
      case m: java.util.Map[_, _] =>
        m.asScala.flatMap { case (k, v) =>
          scala.util.Try(k.toString.toInt -> bytes(v)).toOption
        }.toMap
      case _ => Map.empty[Int, Array[Byte]]
    }.getOrElse(Map.empty)
  }

  /** The live data files of one snapshot with their pruning context.
    * Spec ids default to 0 when the list schema omits them (this
    * engine's own exports).
    */
  private[sources] def liveEntries(spark: SparkSession, table: String,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapshotId: Long): Seq[LiveDataFile] = {
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapshotId not in $table metadata"))
    val listPath = new Path(snap.get("manifest-list").asText())
    readAvro(spark, listPath).flatMap { mf =>
      val mPath = mf.get("manifest_path").toString
      val specId =
        if (mf.getSchema.getField("partition_spec_id") == null) 0
        else Option(mf.get("partition_spec_id"))
          .map(_.asInstanceOf[java.lang.Integer].intValue()).getOrElse(0)
      readAvro(spark, resolvePath(table, mPath))
        .filter(_.get("status").asInstanceOf[Int] != 2)
        .map { e =>
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("parquet"),
            s"unsupported data file format $fmt in $table")
          val part =
            if (df.getSchema.getField("partition") == null) None
            else Option(df.get("partition"))
              .map(_.asInstanceOf[GenericRecord])
          LiveDataFile(df.get("file_path").toString, specId, part,
            boundsOf(df, "lower_bounds"), boundsOf(df, "upper_bounds"))
        }
    }
  }

  /** The live data files of one snapshot: its manifest list, then
    * every non-deleted entry of every listed manifest.
    */
  private[sources] def liveFiles(spark: SparkSession, table: String,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapshotId: Long): Seq[String] =
    liveEntries(spark, table, meta, snapshotId).map(_.path)

  /** Prune data files on their manifest COLUMN BOUNDS under `where`
    * ([[MetaPrune]] satisfiability over lower/upper single-value
    * bounds) — the file-skipping a real Iceberg reader performs
    * beyond partition pruning. Conservative: missing bounds,
    * unsupported conjunct shapes, or incomparable types keep.
    */
  private[sources] def boundsPrune[T](spark: SparkSession,
      meta: com.fasterxml.jackson.databind.JsonNode,
      entries: Seq[(T, Map[Int, Array[Byte]], Map[Int, Array[Byte]])],
      whereSql: String): Seq[T] = {
    import MetaPrune.{Cmp, NullTest}
    val tests = MetaPrune.conjunctTests(spark, whereSql)
    if (tests.isEmpty) return entries.map(_._1)
    val idByName: Map[String, (Int, StructField)] =
      schemaJson(meta).get("fields").elements().asScala.map { f =>
        f.get("name").asText() ->
          ((f.get("id").asInt(), StructField(f.get("name").asText(),
            sparkType(f.get("type").asText()))))
      }.toMap
    entries.filter { case (_, lo, hi) =>
      tests.forall {
        case Cmp(n, op, l) =>
          idByName.get(n).fold(true) { case (id, fld) =>
            MetaPrune.litKey(fld.dataType, l).fold(true) { k =>
              MetaPrune.satisfiable(op,
                lo.get(id).flatMap(
                  MetaPrune.icebergBound(fld.dataType, _))
                  .flatMap(MetaPrune.boundKey(fld.dataType, _)),
                hi.get(id).flatMap(
                  MetaPrune.icebergBound(fld.dataType, _))
                  .flatMap(MetaPrune.boundKey(fld.dataType, _)), k)
            }
          }
        case MetaPrune.InList(n, ls) =>
          idByName.get(n).fold(true) { case (id, fld) =>
            MetaPrune.anySatisfiable(fld.dataType, ls,
              lo.get(id).flatMap(
                MetaPrune.icebergBound(fld.dataType, _))
                .flatMap(MetaPrune.boundKey(fld.dataType, _)),
              hi.get(id).flatMap(
                MetaPrune.icebergBound(fld.dataType, _))
                .flatMap(MetaPrune.boundKey(fld.dataType, _)))
          }
        case NullTest(_, _) => true // null counts not consulted
      }
    }.map(_._1)
  }

  /** Canonical URI form for file-path matching: Hadoop and Spark's
    * `_metadata.file_path` render the local scheme with one and three
    * slashes respectively, and Spark's rendering is URL-ENCODED
    * (space → %20) while writers' metadata carries raw location
    * strings — so a percent-escaped rendering decodes before the
    * match. A literal `+` is a path character, not a form-encoded
    * space, hence the pre-escape. Shared by the Iceberg v2
    * position-delete join and the Delta deletion-vector join.
    */
  private[sources] def canonUri(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val norm = regexp_replace(c, "^file:/+", "file:///")
    when(norm.rlike("%[0-9A-Fa-f]{2}"),
      url_decode(regexp_replace(norm, "\\+", "%2B")))
      .otherwise(norm)
  }

  // ---- streaming tail (readStream over a foreign Iceberg tree) ------------

  /** Streaming state at one METADATA version: (current snapshot id,
    * absolute live DATA-file paths, any live DELETE files). Offsets
    * for the streaming source are metadata versions — each commit
    * writes a new metadata file, and [[versions]] orders them.
    */
  private[sources] def streamState(spark: SparkSession, table: String,
      metaVersion: Long): (Long, Set[String], Boolean) = {
    val meta = parseMetadata(spark, table, metaVersion)
    val snap = meta.get("current-snapshot-id").asLong()
    if (formatVersion(meta) == 2) {
      val entries = IcebergV2.listEntries(spark, table, meta, snap)
      (snap, entries.filter(_.content == 0).map(_.path).toSet,
        entries.exists(_.content != 0))
    } else
      (snap, liveFiles(spark, table, meta, snap)
        .map(p => resolvePath(table, p).toString).toSet, false)
  }

  /** Schema + streamability gate for
    * `readStream.format("graft-iceberg")` — validated once at stream
    * start (unsupported column types refuse inside [[schemaOf]]).
    */
  private[sources] def streamSchema(spark: SparkSession,
      table: String): StructType = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no Iceberg metadata at $table")
    schemaOf(parseMetadata(spark, table, vs.max))
  }

  /** One streaming micro-batch of an Iceberg tree: the DATA files
    * added between metadata versions `fromV` and `toV` — the tail
    * must be APPEND-SHAPED (no file removed, no live delete files,
    * no schema change) or it refuses loudly; Iceberg data files carry
    * every column, so no partition reconstruction is needed.
    */
  private[sources] def tailAdds(spark: SparkSession, table: String,
      declared: StructType, fromV: Long, toV: Long): DataFrame = {
    val have = versions(spark, table).toSet
    val missing = ((fromV + 1) to toV).filterNot(have) ++
      (if (have(fromV)) Nil else Seq(fromV))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"streaming tail of $table needs metadata versions " +
          s"${missing.take(5).mkString(", ")} which were cleaned up " +
          "— the stream cannot resume exactly-once; restart from a " +
          "fresh checkpoint with a batch backfill")
    val curMeta = parseMetadata(spark, table, toV)
    if (schemaOf(curMeta) != declared)
      throw new UnsupportedOperationException(
        s"metadata version $toV of $table changes the schema under " +
          "a running stream — restart the stream to pick up the " +
          "evolution")
    val (_, prevFiles, prevDel) = streamState(spark, table, fromV)
    val (_, curFiles, curDel) = streamState(spark, table, toV)
    if (curDel && !prevDel)
      throw new UnsupportedOperationException(
        s"metadata version $toV of $table adds DELETE files under a " +
          "running stream — not append-shaped; read by batch")
    val removed = prevFiles -- curFiles
    if (removed.nonEmpty)
      throw new UnsupportedOperationException(
        s"metadata version $toV of $table removes data files under " +
          s"a running stream (${removed.take(3).mkString(", ")}" +
          (if (removed.size > 3) ", ..." else "") +
          ") — not append-shaped; rewrites/deletes need a batch " +
          "re-read")
    val added = (curFiles -- prevFiles).toSeq.sorted
    if (added.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        declared)
    else
      scanReader(spark, curMeta, added.headOption.map(new Path(_)))
        .parquet(added: _*)
        .select(declared.fieldNames.map(
          org.apache.spark.sql.functions.col).toIndexedSeq: _*)
  }

  /** Iceberg TIMESTAMP AS OF: the latest snapshot whose
    * `timestamp-ms` is at-or-before `ts`. Refuses when any retained
    * snapshot LACKS a timestamp (ordering would be a guess) or when
    * `ts` predates the first retained snapshot (earlier ones were
    * expired — their instants are unrecoverable).
    */
  private[sources] def resolveSnapshotAt(table: String,
      meta: com.fasterxml.jackson.databind.JsonNode, ts: Long): Long = {
    val snaps = meta.get("snapshots").elements().asScala.map { s =>
      (s.get("snapshot-id").asLong(),
        Option(s.get("timestamp-ms")).filterNot(_.isNull)
          .map(_.asLong()))
    }.toSeq
    require(snaps.nonEmpty, s"Iceberg table at $table has no snapshots")
    require(snaps.forall(_._2.isDefined),
      s"snapshots of the Iceberg table at $table lack timestamp-ms — " +
        "cannot order them by time; address by snapshotId instead")
    val at = snaps.collect { case (id, Some(t)) if t <= ts => (t, id) }
    require(at.nonEmpty,
      s"timestamp $ts is before the first retained snapshot of the " +
        s"Iceberg table at $table (earliest is " +
        s"${snaps.flatMap(_._2).min}; earlier snapshots, if any, " +
        "were expired) — refusing rather than guessing")
    at.max._2
  }

  /** Public timestamp→snapshot resolution over the CURRENT metadata —
    * the `iceberg_scan_ts` SQL surface pins through this.
    */
  def snapshotAt(spark: SparkSession, table: String, ts: Long): Long = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no Iceberg metadata at $table")
    resolveSnapshotAt(table, parseMetadata(spark, table, vs.max), ts)
  }

  /** Scala twin of [[canonUri]] for executor-side string matching —
    * MUST stay behaviorally identical (url_decode is JDK URLDecoder
    * semantics).
    */
  private[sources] def canonUriString(s: String): String = {
    val norm = s.replaceFirst("^file:/+", "file:///")
    if (java.util.regex.Pattern.compile("%[0-9A-Fa-f]{2}")
        .matcher(norm).find())
      java.net.URLDecoder.decode(norm.replace("+", "%2B"), "UTF-8")
    else norm
  }

  // ---- partition pruning on identity transforms ------------------------

  /** IDENTITY-transform partition fields per spec-id: (spec field
    * name → the source column's StructField). Non-identity transforms
    * (bucket, truncate, days, ...) are not prunable by a column
    * predicate and are skipped. Reads `partition-specs`; falls back to
    * the deprecated v1 top-level `partition-spec`.
    */
  private[sources] def identitySpecs(
      meta: com.fasterxml.jackson.databind.JsonNode)
      : Map[Int, Seq[(String, StructField)]] = {
    val byId = schemaFieldsById(meta)
    def fieldsOf(arr: com.fasterxml.jackson.databind.JsonNode)
        : Seq[(String, StructField)] =
      arr.elements().asScala.toSeq.flatMap { f =>
        if (f.get("transform").asText() == "identity")
          byId.get(f.get("source-id").asInt())
            .map(sf => (f.get("name").asText(), sf))
        else None
      }
    val specs = Option(meta.get("partition-specs"))
      .map(_.elements().asScala.toSeq.map(s =>
        s.get("spec-id").asInt() ->
          Option(s.get("fields")).map(fieldsOf).getOrElse(Seq.empty))
        .toMap)
      .getOrElse(Map.empty[Int, Seq[(String, StructField)]])
    if (specs.nonEmpty) specs
    else Option(meta.get("partition-spec")).filter(_.isArray)
      .map(arr => Map(0 -> fieldsOf(arr)))
      .getOrElse(Map.empty)
  }

  /** Avro partition value → the Spark value of the SOURCE column's
    * type. Throws on shapes it cannot convert — callers treat that as
    * "not prunable" and keep the file.
    */
  private def avroPartitionValue(v: AnyRef, dt: DataType): Any =
    v match {
      case null => null
      case u: org.apache.avro.util.Utf8 => u.toString
      case s: java.lang.String => s
      case i: java.lang.Integer => dt match {
        case DateType => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(i.longValue()))
        case LongType => i.longValue()
        case IntegerType => i.intValue()
        case _ => throw new IllegalArgumentException(s"int vs $dt")
      }
      case l: java.lang.Long => dt match {
        case TimestampType =>
          val ts = new java.sql.Timestamp(
            Math.floorDiv(l.longValue(), 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(l.longValue(), 1000000L) * 1000L)
            .toInt)
          ts
        case LongType => l.longValue()
        case _ => throw new IllegalArgumentException(s"long vs $dt")
      }
      case d: java.lang.Double => d.doubleValue()
      case f: java.lang.Float => f.floatValue()
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"unsupported partition value ${other.getClass}")
    }

  private def conjunctsOf(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjunctsOf(l) ++ conjunctsOf(r)
      case other => Seq(other)
    }

  /** Prune `entries` ((payload, spec-id, raw partition record)) to
    * the files a `where` predicate can match, using identity-transform
    * partition values — the manifest-level scan-cost cut a real
    * Iceberg reader performs on a partitioned tree. EXACT for
    * top-level conjuncts whose references are all identity partition
    * columns of the file's spec (identity means every row in the file
    * carries exactly the tuple's values, so predicate-on-tuple ≡
    * predicate-on-rows); other conjuncts, non-identity transforms,
    * unconvertible values, or parse failures prune nothing — the
    * returned set is always a superset of the matching files, and the
    * caller applies the row filter regardless. Driver-side over
    * O(files) tuples, the same metadata class as the manifest read.
    */
  private[sources] def partitionPrune[T](spark: SparkSession,
      meta: com.fasterxml.jackson.databind.JsonNode,
      entries: Seq[(T, Int, Option[GenericRecord])],
      whereSql: String): Seq[T] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val afterIdentity: Seq[(T, Int, Option[GenericRecord])] = {
      val specs = identitySpecs(meta)
      if (specs.forall(_._2.isEmpty)) entries
      else {
        val parsed = scala.util.Try(
          spark.sessionState.sqlParser.parseExpression(whereSql))
        if (parsed.isFailure) entries
        else {
          val cs = conjunctsOf(parsed.get).map { c =>
            (c, c.collect {
              case a: UnresolvedAttribute => a.name }.toSet)
          }
          entries.groupBy(_._2).toSeq.flatMap { case (specId, group) =>
            val fields = specs.getOrElse(specId, Seq.empty)
            val names = fields.map(_._2.name).toSet
            val usable = cs.filter { case (_, r) =>
              r.nonEmpty && r.subsetOf(names) }
            if (fields.isEmpty || usable.isEmpty) group
            else scala.util.Try {
              val schema = StructType(fields.map { case (_, sf) =>
                StructField(sf.name, sf.dataType, nullable = true) })
                .add("__graft_part_idx",
                  org.apache.spark.sql.types.LongType,
                  nullable = false)
              val rows = group.zipWithIndex.map { case ((_, _, rec), i) =>
                val r = rec.getOrElse(
                  throw new IllegalArgumentException(
                    "entry without partition record"))
                org.apache.spark.sql.Row.fromSeq(fields.map {
                  case (specName, sf) =>
                    val fld = r.getSchema.getField(specName)
                    if (fld == null)
                      throw new IllegalArgumentException(
                        s"partition record lacks field $specName")
                    avroPartitionValue(r.get(specName), sf.dataType)
                } :+ i.toLong)
              }
              var df = spark.createDataFrame(rows.asJava, schema)
              usable.foreach { case (c, _) => df = df.filter(c.sql) }
              val kept = df.select("__graft_part_idx").collect()
                .map(_.getLong(0)).toSet
              group.zipWithIndex.collect {
                case (e, i) if kept(i.toLong) => e }
            }.getOrElse(group) // not prunable → keep (never drop)
          }
        }
      }
    }
    transformPrune(spark, meta, afterIdentity, whereSql).map(_._1)
  }

  /** NON-IDENTITY transform fields per spec-id: (spec field name,
    * transform string e.g. "bucket[16]", source StructField).
    */
  private[sources] def transformSpecs(
      meta: com.fasterxml.jackson.databind.JsonNode)
      : Map[Int, Seq[(String, String, StructField)]] = {
    val byId = schemaFieldsById(meta)
    def fieldsOf(arr: com.fasterxml.jackson.databind.JsonNode)
        : Seq[(String, String, StructField)] =
      arr.elements().asScala.toSeq.flatMap { f =>
        val t = f.get("transform").asText()
        if (t != "identity" && t != "void")
          byId.get(f.get("source-id").asInt())
            .map(sf => (f.get("name").asText(), t, sf))
        else None
      }
    val specs = Option(meta.get("partition-specs"))
      .map(_.elements().asScala.toSeq.map(s =>
        s.get("spec-id").asInt() ->
          Option(s.get("fields")).map(fieldsOf).getOrElse(Seq.empty))
        .toMap)
      .getOrElse(Map.empty[Int, Seq[(String, String, StructField)]])
    if (specs.nonEmpty) specs
    else Option(meta.get("partition-spec")).filter(_.isArray)
      .map(arr => Map(0 -> fieldsOf(arr)))
      .getOrElse(Map.empty)
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Prune on NON-IDENTITY transform partition values (bucket /
    * truncate / year / month / day / hour —
    * [[IcebergTransforms]]): a file is dropped only when some
    * supported conjunct is PROVABLY unsatisfiable on its transform
    * value. Range predicates over bucketed fields, unsupported
    * shapes, type mismatches, or decode failures keep the file —
    * conservative superset, row filter re-applied by the caller.
    * Timestamp literals prune only under a UTC session (the literal's
    * micros must mean the same instant the writer's transform saw).
    */
  private def transformPrune[T](spark: SparkSession,
      meta: com.fasterxml.jackson.databind.JsonNode,
      entries: Seq[(T, Int, Option[GenericRecord])],
      whereSql: String): Seq[(T, Int, Option[GenericRecord])] = {
    import IcebergTransforms._
    import MetaPrune.{Cmp, NullTest}
    val specs = transformSpecs(meta)
    if (specs.forall(_._2.isEmpty)) return entries
    val tests = MetaPrune.conjunctTests(spark, whereSql)
    if (tests.isEmpty) return entries
    val utc = spark.sessionState.conf.sessionLocalTimeZone == "UTC"
    def partValue(rec: GenericRecord, name: String): Option[AnyRef] = {
      if (rec.getSchema.getField(name) == null) None
      else Some(rec.get(name))
    }
    // one (transform field, test) pair's satisfiability; anything
    // not understood answers true
    def satisfiable(transform: String, source: StructField,
        raw: AnyRef, t: MetaPrune.Test): Boolean = t match {
      case NullTest(_, isNull) =>
        // null source rows produce null transform values, so the
        // file's single tuple value decides exactly
        if (isNull) raw == null else raw != null
      case MetaPrune.InList(n, ls) =>
        // a disjunction of equalities: keep iff ANY member could
        if (raw == null) false
        else ls.exists(l =>
          satisfiable(transform, source, raw, Cmp(n, "=", l)))
      case Cmp(_, op, lit) =>
        if (raw == null) false // all-null source: no row passes a Cmp
        else if (source.dataType == TimestampType && !utc) true
        else transform match {
          case BucketRe(n) =>
            if (op != "=") true
            else bucketOfLiteral(source.dataType, lit, n.toInt) match {
              case Some(b) => raw match {
                case i: java.lang.Integer => i.intValue() == b
                case _ => true
              }
              case None => true
            }
          case TruncateRe(w) => (source.dataType, raw) match {
            case (IntegerType | LongType | ShortType | ByteType,
                n: java.lang.Number) =>
              (lit.dataType match {
                case IntegerType | LongType | ShortType | ByteType =>
                  Some(lit.value.asInstanceOf[Number].longValue())
                case _ => None
              }).forall { lv =>
                monotonicSatisfiable(op, n.longValue(),
                  truncLong(lv, w.toInt))
              }
            case (StringType, s: AnyRef)
                if lit.dataType == StringType =>
              val part = s.toString
              val tl = truncString(lit.value.toString, w.toInt)
              MetaPrune.strCmp(part, tl) match {
                case None => true
                case Some(c) => op match {
                  case "=" => c == 0
                  case "<" | "<=" => c <= 0
                  case ">" | ">=" => c >= 0
                  case _ => true
                }
              }
            case _ => true
          }
          case tr @ ("year" | "month" | "day" | "hour") => raw match {
            case n: java.lang.Number =>
              temporalOrdinal(tr, source.dataType, lit)
                .forall(monotonicSatisfiable(op, n.longValue(), _))
            case _ => true
          }
          case _ => true // unknown transform: not prunable
        }
    }
    entries.filter { case (_, specId, rec) =>
      val fields = specs.getOrElse(specId, Seq.empty)
      if (fields.isEmpty || rec.isEmpty) true
      else tests.forall { t =>
        val col = t match {
          case Cmp(n, _, _) => n
          case NullTest(n, _) => n
          case MetaPrune.InList(n, _) => n
        }
        fields.filter(_._3.name == col).forall {
          case (specName, transform, source) =>
            scala.util.Try {
              partValue(rec.get, specName) match {
                case None => true // spec field absent from the record
                case Some(raw) => satisfiable(transform, source, raw, t)
              }
            }.getOrElse(true)
        }
      }
    }
  }

  /** Read an Iceberg v1 table (this exporter's or any v1 writer's
    * whose columns are in the supported primitive set): current
    * snapshot by default, any retained snapshot via `snapshotId` —
    * `VERSION AS OF` for the open format. Metadata is O(manifests)
    * small driver-side reads; the data scan is one ordinary
    * schema-declared multi-path parquet read.
    *
    * `where` (a SQL predicate string) filters the result AND prunes
    * the file list at the MANIFEST level on identity-transform
    * partition values ([[partitionPrune]]) — on a partitioned foreign
    * tree the scan never lists or opens non-matching partitions'
    * files, the cost cut a real Iceberg reader gets from its
    * manifests. Without it, a partitioned tree still reads correctly
    * (Iceberg data files carry all data columns) but scans every
    * live file.
    */
  def readIceberg(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None,
      where: Option[String] = None,
      asOfTimestampMs: Option[Long] = None): DataFrame = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no Iceberg metadata at $table")
    val meta = parseMetadata(spark, table, vs.max)
    require(snapshotId.isEmpty || asOfTimestampMs.isEmpty,
      "snapshotId and asOfTimestampMs are mutually exclusive")
    val pinned = asOfTimestampMs
      .map(resolveSnapshotAt(table, meta, _)).orElse(snapshotId)
    if (formatVersion(meta) == 2)
      return IcebergV2.read(spark, table, meta, pinned, where)
    val plain = schemaOf(meta) // validates column types up front
    val snap = pinned.getOrElse(
      meta.get("current-snapshot-id").asLong())
    val entries = liveEntries(spark, table, meta, snap)
    val files = where.fold(entries.map(_.path)) { w =>
      // identity-partition pruning first, then column-bounds
      // file skipping — both conservative supersets
      val p1 = partitionPrune(spark, meta,
        entries.map(e => (e, e.specId, e.partition)), w)
      boundsPrune(spark, meta,
        p1.map(e => (e.path, e.lower, e.upper)), w)
    }.map(rel => resolvePath(table, rel).toString)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], plain)
      else
        // id-matched when the files carry field ids (foreign
        // writers): a renamed column's old files still serve values
        scanReader(spark, meta, files.headOption.map(new Path(_)))
          .parquet(files: _*)
    // pruning is file-level; the row predicate still applies
    where.fold(base)(w =>
      base.filter(org.apache.spark.sql.functions.expr(w)))
  }

  /** Snapshot ids this table retains, ascending — the time-travel
    * surface ([[readIceberg]]'s `snapshotId` accepts any of them).
    */
  def snapshots(spark: SparkSession, table: String): Seq[Long] = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no Iceberg metadata at $table")
    parseMetadata(spark, table, vs.max).get("snapshots")
      .elements().asScala.map(_.get("snapshot-id").asLong()).toSeq.sorted
  }
}
