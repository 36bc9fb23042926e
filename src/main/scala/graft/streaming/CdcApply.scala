package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
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
  * metadata pointer). Old snapshot dirs remain until a retention sweep
  * deletes them, which also gives readers-in-flight time to finish.
  *
  * Scale shape: each apply is one key-shuffle (the merge window) over
  * snapshot ∪ batch. For very large snapshots with small batches the
  * rewrite cost is dominated by the snapshot rewrite itself — the
  * standard copy-on-write tradeoff; partitioning the snapshot and
  * merging only affected partitions is the refinement, orthogonal to
  * this operator's contract.
  *
  * Exactly-once: `foreachBatch` can re-run a batch after failure;
  * writing to the batch-id-keyed directory makes the apply idempotent
  * (a re-run overwrites the same `v<batchId>` and re-points to it), and
  * rows re-delivered in a LATER batch are dropped by (key, version)
  * anti-join against the snapshot before merging — the version is
  * authoritative for a row's identity. The snapshot persists
  * `versionCol`, so ordering is true cross-batch latest-wins: a late,
  * lower-versioned update arriving after a higher one loses, whichever
  * micro-batch carried it. (One documented artifact of tombstones
  * removing rows entirely: a late update older than an applied delete
  * re-inserts the key — retaining tombstone rows with a retention
  * window is the refinement.)
  */
object CdcApply {

  /** Resolve the current snapshot, or None before the first apply. */
  def currentSnapshot(root: String): Option[String] = {
    val ptr = Paths.get(root, "CURRENT")
    if (Files.exists(ptr))
      Some(Paths.get(root, Files.readString(ptr).trim).toString)
    else None
  }

  /** Read the current snapshot as a DataFrame (empty-schema-safe only
    * after at least one apply).
    */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
      root: String): Option[DataFrame] =
    currentSnapshot(root).map(spark.read.parquet(_))

  /** Time travel: read a specific retained snapshot version — every
    * applied batch IS a full immutable snapshot, so any version the
    * retention sweep has not removed is readable as of that batch.
    */
  def readSnapshotAt(spark: org.apache.spark.sql.SparkSession,
      root: String, batchId: Long): Option[DataFrame] = {
    val dir = Paths.get(root, s"v$batchId")
    if (Files.exists(dir)) Some(spark.read.parquet(dir.toString))
    else None
  }

  /** Retention sweep: delete all snapshot directories except the
    * `keep` most recent (and never the one `CURRENT` points to). Run
    * out-of-band on a schedule; `keep >= 2` leaves in-flight readers of
    * the previous snapshot unbroken — the same contract as a table
    * format's vacuum with a retention window.
    */
  def vacuum(root: String, keep: Int = 2): Seq[String] = {
    require(keep >= 1, "must keep at least the current snapshot")
    val cur = currentSnapshot(root).map(Paths.get(_).getFileName.toString)
    val snaps = Option(new java.io.File(root).listFiles).getOrElse(Array())
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .sortBy(f => f.getName.drop(1).toLong)
    val doomed = snaps.dropRight(keep)
      .filterNot(f => cur.contains(f.getName))
    doomed.foreach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array()).foreach(rm)
        f.delete(); ()
      }
      rm(d)
    }
    doomed.map(_.getName).toSeq
  }

  /** Start applying `updates` (a streaming DataFrame with `keys`,
    * `versionCol`, and optionally `deletedCol`) to the snapshot under
    * `root`.
    */
  def start(updates: DataFrame, root: String, keys: Seq[String],
      versionCol: String, deletedCol: Option[String] = None,
      queryName: String = "cdc_apply"): StreamingQuery = {
    Files.createDirectories(Paths.get(root))
    updates.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.lit
        val spark = batch.sparkSession
        val merged = readSnapshot(spark, root) match {
          case Some(base) =>
            // re-delivered rows (same key+version as an applied row) are
            // dropped, not errors: at-least-once sources replay
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
          .parquet(Paths.get(root, dest).toString)
        // atomic pointer flip: write-temp + move, so a concurrent reader
        // sees either the old or the new pointer, never a torn write
        val tmp = Paths.get(root, s".CURRENT.$batchId.tmp")
        Files.writeString(tmp, dest)
        Files.move(tmp, Paths.get(root, "CURRENT"),
          StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        ()
      }
      .start()
  }
}
