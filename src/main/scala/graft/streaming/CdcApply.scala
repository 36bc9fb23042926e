package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Upsert

/** Continuous CDC apply: a stream of keyed, versioned change rows is
  * merged into a parquet snapshot, micro-batch by micro-batch, via
  * `foreachBatch` + [[graft.operators.Upsert.latestWins]] — the
  * streaming MERGE a lake runs when no transactional table format is
  * available.
  *
  * Snapshot layout: every applied batch writes a COMPLETE new snapshot
  * under `root/v<batchId>/` and then atomically updates the `CURRENT`
  * pointer file. Readers resolve the pointer and always see one whole,
  * immutable snapshot — never a directory mid-rewrite (object stores
  * cannot atomically swap directories, so pointer indirection is the
  * safe primitive; it is the same move table formats make with their
  * metadata pointer). All filesystem access goes through the Hadoop
  * `FileSystem`/`FileContext` APIs, so `root` may be a local path, HDFS,
  * or an object store; the pointer flip uses `FileContext.rename(
  * OVERWRITE)` — atomic on HDFS and the local FS, a single small-object
  * swap elsewhere. Old snapshot dirs remain until a retention sweep
  * deletes them, which also gives readers-in-flight time to finish.
  *
  * Scale shape: each apply is one key-shuffle (the merge window) over
  * snapshot ∪ batch. For very large snapshots with small batches the
  * rewrite cost is dominated by the snapshot rewrite itself — the
  * standard copy-on-write tradeoff; partitioning the snapshot and
  * merging only affected partitions is the refinement, orthogonal to
  * this operator's contract.
  *
  * Exactly-once, in three layers:
  *  - a REPLAYED batch (crash after the pointer flip, before the
  *    stream checkpoint commit) is detected by `CURRENT >= v<batchId>`
  *    and skipped outright — re-merging would read and overwrite the
  *    same directory. Corollary: one snapshot root belongs to ONE
  *    streaming-checkpoint lineage. Restarting with a FRESH stream
  *    checkpoint against an existing root resets batch ids to 0 and
  *    the guard would drop them — point the new query at a new root
  *    (or seed it from the old snapshot), exactly as a table format
  *    ties commits to an application id;
  *  - exact duplicate rows WITHIN a batch (at-least-once sources
  *    replay) collapse via `dropDuplicates()` over all columns before
  *    the merge — deterministic, since the copies are identical;
  *  - rows re-delivered in a LATER batch are dropped by (key, version)
  *    anti-join against the snapshot. Two rows sharing (key, version)
  *    but DIFFERING in payload still fail loudly in `latestWins` —
  *    that is corrupt input, not re-delivery.
  * The snapshot persists `versionCol`, so ordering is true cross-batch
  * latest-wins: a late, lower-versioned update loses whichever
  * micro-batch carried it. (One documented artifact of tombstones
  * removing rows entirely: a late update older than an applied delete
  * re-inserts the key — retaining tombstone rows with a retention
  * window is the refinement.)
  */
object CdcApply {

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Resolve the current snapshot path, or None before the first apply. */
  def currentSnapshot(spark: SparkSession, root: String): Option[String] = {
    val fs = fsFor(spark, root)
    val ptr = new Path(root, "CURRENT")
    if (!fs.exists(ptr)) None
    else {
      // open ONCE and read to EOF: a stat-then-read pair could tear
      // across a concurrent pointer flip (old length, new content) and
      // resolve a truncated snapshot name
      val out = new java.io.ByteArrayOutputStream()
      val in = fs.open(ptr)
      try {
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      Some(new Path(root,
        out.toString(StandardCharsets.UTF_8.name).trim).toString)
    }
  }

  /** The batch id `CURRENT` points at, or None before the first apply. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    currentSnapshot(spark, root)
      .map(p => new Path(p).getName.stripPrefix("v").toLong)

  /** Read the current snapshot as a DataFrame (defined only after at
    * least one apply).
    */
  def readSnapshot(spark: SparkSession, root: String): Option[DataFrame] =
    currentSnapshot(spark, root).map(spark.read.parquet(_))

  /** Time travel: read a specific retained snapshot version — every
    * applied batch IS a full immutable snapshot, so any version the
    * retention sweep has not removed is readable as of that batch.
    */
  def readSnapshotAt(spark: SparkSession, root: String,
      batchId: Long): Option[DataFrame] = {
    val dir = new Path(root, s"v$batchId")
    if (fsFor(spark, root).exists(dir))
      Some(spark.read.parquet(dir.toString))
    else None
  }

  /** Retention sweep: delete all snapshot directories except the
    * `keep` most recent (and never the one `CURRENT` points to). Run
    * out-of-band on a schedule; `keep >= 2` leaves in-flight readers of
    * the previous snapshot unbroken — the same contract as a table
    * format's vacuum with a retention window.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2)
      : Seq[String] = {
    require(keep >= 1, "must keep at least the current snapshot")
    val fs = fsFor(spark, root)
    // a sweep scheduled before the first apply (or against a mistyped
    // root) is a harmless no-op, not a crash
    if (!fs.exists(new Path(root))) return Seq.empty
    val cur = currentSnapshot(spark, root).map(new Path(_).getName)
    val snaps = fs.listStatus(new Path(root))
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .sortBy(_.getPath.getName.drop(1).toLong)
    val doomed = snaps.dropRight(keep)
      .filterNot(s => cur.contains(s.getPath.getName))
    doomed.foreach(s => fs.delete(s.getPath, true))
    doomed.map(_.getPath.getName).toSeq
  }

  /** Apply one change batch to the snapshot — the body `start` runs per
    * micro-batch, public so the replay/idempotency contract is directly
    * testable. Returns false when the batch was skipped by the replay
    * guard (the pointer already covers `batchId`).
    */
  def applyBatch(rawBatch: DataFrame, batchId: Long, root: String,
      keys: Seq[String], versionCol: String,
      deletedCol: Option[String]): Boolean = {
    import org.apache.spark.sql.functions.lit
    val spark = rawBatch.sparkSession
    val fs = fsFor(spark, root)
    fs.mkdirs(new Path(root))
    // replay guard: if the pointer already covers this batch, the
    // apply committed before the crash — re-merging would read and
    // overwrite v<batchId> itself
    if (currentVersion(spark, root).exists(_ >= batchId)) false
    else {
      // exact duplicate rows within the batch collapse
      // deterministically; rows with one (key, version) that differ in
      // an ORDERABLE column still raise in latestWins. Non-orderable
      // columns (maps) cannot join a dropDuplicates grouping, so rows
      // differing only there collapse arbitrarily-but-to-one.
      val orderable = rawBatch.schema.fields.collect {
        case f if org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType) => f.name
      }
      val batch = rawBatch.dropDuplicates(orderable.toIndexedSeq)
      val merged = readSnapshot(spark, root) match {
        case Some(base) =>
          // rows re-delivered from an ALREADY-APPLIED batch
          val fresh = batch.join(
            base.select((keys :+ versionCol)
              .map(org.apache.spark.sql.functions.col): _*),
            keys :+ versionCol, "left_anti")
          // the snapshot never stores tombstones (deletes remove rows)
          val withD = deletedCol.fold(base)(c =>
            base.withColumn(c, lit(false)))
          Upsert.latestWins(withD, fresh, keys, versionCol, deletedCol)
        case None =>
          Upsert.latestWins(batch.limit(0), batch, keys, versionCol,
            deletedCol)
      }
      val dest = s"v$batchId"
      merged.write.mode("overwrite")
        .parquet(new Path(root, dest).toString)
      // atomic pointer flip: write-temp + rename(OVERWRITE), so a
      // concurrent reader sees the old or the new pointer, never a
      // torn write
      val tmp = new Path(root, s".CURRENT.$batchId.tmp")
      val out = fs.create(tmp, true)
      try out.write(dest.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val fc = FileContext.getFileContext(new Path(root).toUri,
        spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, new Path(root, "CURRENT"),
        Options.Rename.OVERWRITE)
      true
    }
  }

  /** Start applying `updates` (a streaming DataFrame with `keys`,
    * `versionCol`, and optionally `deletedCol`) to the snapshot under
    * `root`.
    */
  def start(updates: DataFrame, root: String, keys: Seq[String],
      versionCol: String, deletedCol: Option[String] = None,
      queryName: String = "cdc_apply"): StreamingQuery =
    updates.writeStream
      .queryName(queryName)
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        applyBatch(rawBatch, batchId, root, keys, versionCol, deletedCol)
        ()
      }
      .start()
}
