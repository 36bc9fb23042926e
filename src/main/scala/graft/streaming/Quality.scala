package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Write-time data-quality gate for CDC tables: named row-level
  * expectations evaluated AT APPLY TIME, with violating rows either
  * diverted to a quarantine table (itself a full [[CdcApply]] table —
  * time travel, change feed, mirroring all compose) or failing the
  * batch loudly. The governed lake's posture applied to data quality
  * (reference analog: the fail-closed grant checks of
  * /root/reference/main.tf:460-487 — bad input is refused or
  * quarantined at the boundary, never silently admitted): a malformed
  * row must not reach the snapshot, and its rejection must leave an
  * auditable record.
  *
  * Scale shape: the gate is ONE map-side expression chain (a
  * `concat_ws` of codegen'd `when`s) over the arriving batch — no
  * extra shuffle, no extra scan of the table. The split into admitted
  * and quarantined rows is two filters over one persisted marked
  * frame, and the violation counts ride a single map-side aggregate of
  * the same frame. At 100 TB the gate's cost is the batch's size, not
  * the table's.
  *
  * Semantics:
  *  - An expectation passes when its predicate is TRUE; NULL counts as
  *    a violation (fail-closed — an unevaluable check must not admit
  *    the row).
  *  - DELETES BYPASS THE GATE: a tombstone row carries only
  *    key + version semantics, so whole-row quality checks do not
  *    apply. Without the bypass a delete whose payload columns are
  *    NULL would quarantine instead of deleting — the key would
  *    survive its own death. Spec-pinned.
  *  - The table's content under a gate is "the latest ADMITTED version
  *    per key": a quarantined version never enters the merge, so the
  *    snapshot keeps serving the prior clean version until a later
  *    clean one arrives.
  *  - Quarantined rows land with a [[ViolatedCol]] string column — the
  *    comma-joined, name-sorted list of failed expectations — keyed
  *    and versioned like the source, so the quarantine's own snapshot
  *    is "the latest REJECTED version per key" and its change feed is
  *    the rejection audit trail.
  *
  * Exactly-once: both sides apply under the SAME batch id against
  * their own replay guards, quarantine FIRST — a crash between the two
  * commits can leave the quarantine ahead of the main table (a retry
  * re-lands the main side and the quarantine's guard drops the
  * duplicate), never an admitted batch whose rejects were lost.
  */
object Quality {

  /** A named row-level expectation. `name` is stored in quarantine
    * rows (comma-joined with the other failed names), so it must be
    * non-empty and comma-free.
    */
  final case class Expectation(name: String, predicate: Column)

  /** Quarantine-row column: comma-joined name-sorted failed
    * expectations. Reserved on gated batches.
    */
  val ViolatedCol = "_violated"

  /** Per-batch gate outcome: row counts by fate plus per-expectation
    * violation counts (a row failing two expectations counts once in
    * `quarantined` and once under EACH name). `appliedMain` /
    * `appliedQuarantine` report whether each side committed —
    * false when that side's slice was empty or its replay guard
    * recognized a re-delivery.
    */
  final case class GateReport(batchId: Long, admitted: Long,
      deletes: Long, quarantined: Long, byExpectation: Map[String, Long],
      appliedMain: Boolean, appliedQuarantine: Boolean)

  private def checkExpectations(es: Seq[Expectation]): Seq[Expectation] = {
    require(es.nonEmpty, "at least one expectation is required")
    es.foreach(e => require(
      e.name.nonEmpty && !e.name.contains(",") && !e.name.exists(_.isWhitespace),
      s"expectation name '${e.name}' must be non-empty with no commas " +
        "or whitespace (names are comma-joined into " + ViolatedCol + ")"))
    require(es.map(_.name).distinct.size == es.size,
      s"duplicate expectation names: ${es.map(_.name).mkString(",")}")
    es.sortBy(_.name)
  }

  /** True when the row VIOLATES `e` (fail-closed: NULL fails). */
  private def violates(e: Expectation): Column =
    !coalesce(e.predicate, lit(false))

  /** Mark a batch: adds [[ViolatedCol]] — "" for rows that pass every
    * expectation (or are deletes, which bypass the gate), else the
    * comma-joined name-sorted failed expectations. Exposed for
    * pipelines that want the marking without the apply (e.g. a
    * quality-score report over a candidate corpus).
    */
  def mark(batch: DataFrame, expectations: Seq[Expectation],
      deletedCol: Option[String] = None): DataFrame = {
    val es = checkExpectations(expectations)
    require(!batch.columns.contains(ViolatedCol),
      s"reserved column name in use: $ViolatedCol")
    val isDelete = deletedCol.fold(lit(false))(d =>
      coalesce(col(d), lit(false)))
    // concat_ws skips NULLs, so the chain emits exactly the failed
    // names in sorted order — one codegen'd projection, no UDF
    val joined = concat_ws(",",
      es.map(e => when(violates(e), lit(e.name))): _*)
    batch.withColumn(ViolatedCol, when(isDelete, lit("")).otherwise(joined))
  }

  /** Gate one change batch and apply both sides: rows passing every
    * expectation (plus all deletes) merge into the CDC table at
    * `root`; violating rows land in the quarantine CDC table at
    * `quarantineRoot` with [[ViolatedCol]] attached, stamped with the
    * SAME batch id. When `failOnViolation` is set, ANY violation
    * aborts the whole batch loudly (with per-expectation counts)
    * before either side writes — the mode for pipelines where a bad
    * row means upstream corruption rather than expected noise.
    *
    * The remaining parameters are [[CdcApply.applyBatch]]'s, applied
    * to both tables (the quarantine inherits keys / version / layout,
    * but never models deletes — rejections are facts; its history is
    * managed by retention/vacuum like any CDC table).
    */
  def applyChecked(rawBatch: DataFrame, batchId: Long, root: String,
      quarantineRoot: String, keys: Seq[String], versionCol: String,
      deletedCol: Option[String],
      expectations: Seq[Expectation],
      failOnViolation: Boolean = false,
      numBuckets: Int = 16,
      tombstoneRetention: Int = CdcApply.DefaultTombstoneRetention,
      commitTs: Option[Long] = None,
      maxDeltas: Int = 0,
      bucketCols: Option[Seq[String]] = None): GateReport = {
    val es = checkExpectations(expectations)
    require(root != quarantineRoot,
      "quarantineRoot must differ from the table root")
    val isDelete = deletedCol.fold(lit(false))(d =>
      coalesce(col(d), lit(false)))
    val marked = mark(rawBatch, es, deletedCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one map-side pass for the whole report: fates + per-name
      // counts (deletes counted separately — they bypassed the gate)
      val tail: Seq[Column] =
        Seq(sum(when(isDelete, 1L).otherwise(0L)).as("del"),
          sum(when(col(ViolatedCol) =!= "", 1L).otherwise(0L)).as("bad")) ++
          es.map(e => sum(when(violates(e) && !isDelete, 1L)
            .otherwise(0L)).as(e.name))
      val cnt = marked.agg(
        sum(when(col(ViolatedCol) === "" && !isDelete, 1L)
          .otherwise(0L)).as("ok"), tail: _*).head()
      def n(i: Int): Long = if (cnt.isNullAt(i)) 0L else cnt.getLong(i)
      val (ok, del, bad) = (n(0), n(1), n(2))
      val byName = es.indices.map(i => es(i).name -> n(3 + i)).toMap
      if (failOnViolation && bad > 0)
        throw new IllegalStateException(
          s"batch $batchId failed the quality gate: $bad row(s) " +
            "violate " + byName.filter(_._2 > 0).toSeq.sorted
              .map { case (k, v) => s"$k=$v" }.mkString("[", ",", "]") +
            " — nothing was written")
      // quarantine FIRST: a crash window can strand rejects without
      // their admitted batch (retry completes it), never the reverse
      val appliedQ = bad > 0 && CdcApply.applyBatch(
        marked.filter(col(ViolatedCol) =!= ""),
        batchId, quarantineRoot, keys, versionCol, deletedCol = None,
        numBuckets = numBuckets,
        tombstoneRetention = tombstoneRetention, commitTs = commitTs,
        maxDeltas = maxDeltas, bucketCols = bucketCols)
      val appliedM = (ok + del) > 0 && CdcApply.applyBatch(
        marked.filter(col(ViolatedCol) === "").drop(ViolatedCol),
        batchId, root, keys, versionCol, deletedCol,
        numBuckets = numBuckets,
        tombstoneRetention = tombstoneRetention, commitTs = commitTs,
        maxDeltas = maxDeltas, bucketCols = bucketCols)
      GateReport(batchId, ok, del, bad, byName, appliedM, appliedQ)
    } finally marked.unpersist()
  }

  /** Streaming form: [[CdcApply.start]] with the gate in the loop —
    * every micro-batch routes through [[applyChecked]] under its
    * stream batch id, so the exactly-once story is unchanged (both
    * tables' replay guards drop restart re-deliveries). `clock`
    * (evaluated once per batch) pins commit timestamps for
    * deterministic as-of reads, as in [[CdcApply.startMirror]]. A
    * `failOnViolation` trip surfaces as the STREAM's failure.
    */
  def startChecked(updates: DataFrame, root: String,
      quarantineRoot: String, keys: Seq[String], versionCol: String,
      deletedCol: Option[String],
      expectations: Seq[Expectation],
      failOnViolation: Boolean = false,
      queryName: String = "cdc_gated",
      numBuckets: Int = 16,
      tombstoneRetention: Int = CdcApply.DefaultTombstoneRetention,
      maxDeltas: Int = 0,
      bucketCols: Option[Seq[String]] = None,
      clock: Option[() => Long] = None): StreamingQuery =
    updates.writeStream
      .queryName(queryName)
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        applyChecked(rawBatch, batchId, root, quarantineRoot, keys,
          versionCol, deletedCol, expectations, failOnViolation,
          numBuckets, tombstoneRetention,
          commitTs = clock.map(_.apply()), maxDeltas = maxDeltas,
          bucketCols = bucketCols)
        ()
      }
      .start()
}
