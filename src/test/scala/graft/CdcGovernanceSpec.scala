package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.governance._
import graft.streaming.CdcApply

/** Composition of the two flagship subsystems: row/column security over a
  * continuously-merged CDC snapshot. The snapshot root is registered as a
  * governed LOCATION (`GovernanceCatalog.registerLocation` — the same
  * prefix-matched registry that governs any raw parquet path), so every
  * bucket-directory read [[CdcApply.readSnapshot]] issues falls under the
  * principal's data-cells filter with zero CDC-specific wiring — and the
  * write half denies non-admin writes anywhere under the root.
  */
class CdcGovernanceSpec extends AnyFunSuite with SparkTestBase {

  private val db = "cdc_db"
  private val tbl = "cdc_sales"

  private def buildSnapshot(): String = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("cdc_gov").toFile.getAbsolutePath
    val b0 = Seq(
      (1L, 1L, "APAC", 10.0, "s1", false),
      (2L, 1L, "EMEA", 20.0, "s2", false),
      (3L, 1L, "APAC", 30.0, "s3", false))
      .toDF("k", "version", "region", "amount", "secret", "deleted")
    // logical commit clock so the timestamp-addressed reads below
    // (changesSinceTs) resolve deterministically
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), commitTs = Some(1000L)))
    // update k=1, tombstone k=3 — both APAC, so the analyst's view of
    // "current" vs "as of batch 0" must differ in exactly these keys
    val b1 = Seq(
      (1L, 2L, "APAC", 11.0, "s1", false),
      (3L, 2L, "APAC", 30.0, "s3", true))
      .toDF("k", "version", "region", "amount", "secret", "deleted")
    assert(CdcApply.applyBatch(b1, 1L, root, Seq("k"), "version",
      Some("deleted"), commitTs = Some(2000L)))
    root
  }

  private def register(root: String): Unit = {
    GovernanceCatalog.registerLocation(root, db, tbl)
    // the allowlist must include the table's deleted column: tombstone
    // filtering happens ABOVE the governed projection on the read path
    // (readSnapshot strips internals after governance injects the
    // allowlist). `secret` is deliberately NOT granted.
    GovernanceCatalog.register(Analyst, db, DataCellsFilter(
      "analyst-cdc", tbl, "region = 'APAC'",
      Seq("k", "version", "region", "amount", "deleted")))
  }

  test("governed CDC snapshot: analyst reads are row-filtered and " +
    "column-pruned; admin sees all; anonymous sees nothing") {
    val root = buildSnapshot()
    register(root)

    val analyst = Governance.withPrincipal(spark, Analyst) {
      CdcApply.readSnapshot(spark, root).get.collect()
    }
    // k=2 is EMEA (row-filtered), k=3 is dead (tombstone), k=1 is the
    // batch-1 version — and `secret` must not even resolve as a column
    assert(analyst.map(_.schema.fieldNames.toSeq).distinct.toSeq ==
      Seq(Seq("k", "version", "region", "amount")), analyst.toSeq.toString)
    assert(analyst.map(r => (r.getAs[Long]("k"),
      r.getAs[Double]("amount"))).toSet == Set(1L -> 11.0))

    val admin = Governance.withPrincipal(spark, DataAdmin) {
      CdcApply.readSnapshot(spark, root).get.collect()
    }
    assert(admin.map(_.getAs[Long]("k")).toSet == Set(1L, 2L))
    assert(admin.head.schema.fieldNames.contains("secret"),
      "admin read must keep ungoverned columns")

    // unset principal = Anonymous = default-deny: zero rows through the
    // tightest registered allowlist
    val anon = CdcApply.readSnapshot(spark, root).get.collect()
    assert(anon.isEmpty, s"anonymous must see nothing: ${anon.toSeq}")
  }

  test("governance composes with a metadata-only rename: allowlists " +
    "keep operating on STORED names (the scan the rule rewrites), " +
    "and granted columns surface under their LOGICAL names") {
    val root = buildSnapshot()
    register(root)
    assert(CdcApply.renameColumn(spark, root, "amount", "amt"))
    // the Analyst's allowlist grants the STORED name `amount`; the
    // read projects it to the logical `amt` ABOVE the governed scan
    val analyst = Governance.withPrincipal(spark, Analyst) {
      CdcApply.readSnapshot(spark, root).get.collect()
    }
    assert(analyst.map(_.schema.fieldNames.toSeq).distinct.toSeq ==
      Seq(Seq("k", "version", "region", "amt")), analyst.toSeq.toString)
    assert(analyst.map(r => (r.getAs[Long]("k"),
      r.getAs[Double]("amt"))).toSet == Set(1L -> 11.0))
    // admin: full schema, logical names, ungoverned column intact
    val admin = Governance.withPrincipal(spark, DataAdmin) {
      CdcApply.readSnapshot(spark, root).get.collect()
    }
    assert(admin.head.schema.fieldNames.contains("amt") &&
      !admin.head.schema.fieldNames.contains("amount") &&
      admin.head.schema.fieldNames.contains("secret"))
    // time travel to batch 0 predates the rename: committed-era name
    // under the same grant
    val asOf = Governance.withPrincipal(spark, Analyst) {
      CdcApply.readSnapshotAt(spark, root, 0L).get.collect()
    }
    assert(asOf.head.schema.fieldNames.contains("amount") &&
      !asOf.head.schema.fieldNames.contains("amt"))
  }

  test("governance composes with time travel: the batch-0 snapshot is " +
    "filtered by the same grant") {
    val root = buildSnapshot()
    register(root)
    val asOf = Governance.withPrincipal(spark, Analyst) {
      CdcApply.readSnapshotAt(spark, root, 0L).get.collect()
    }
    // batch-0 state: k=1 at version 1, k=3 alive; k=2 still EMEA-filtered
    assert(asOf.map(r => (r.getAs[Long]("k"),
      r.getAs[Double]("amount"))).toSet == Set(1L -> 10.0, 3L -> 30.0))
    assert(!asOf.head.schema.fieldNames.contains("secret"))
  }

  test("writes under a governed CDC root are denied for non-admin " +
    "principals") {
    import spark.implicits._
    val root = buildSnapshot()
    register(root)
    val evil = Seq((9L, 9L)).toDF("k", "version")
    val e = intercept[AccessDeniedException] {
      Governance.withPrincipal(spark, Analyst) {
        evil.write.mode("overwrite").parquet(s"$root/data/v99")
      }
    }
    assert(e.getMessage.contains(s"$db.$tbl"), e.getMessage)
    // the format("cdc") append routes through applyBatch, whose file
    // write hits the same fence — denied before any commit
    intercept[AccessDeniedException] {
      Governance.withPrincipal(spark, Analyst) {
        Seq((9L, 9L, 9.0, false, "x"))
          .toDF("k", "version", "amount", "deleted", "secret")
          .write.format("cdc").mode("append")
          .option("path", root).option("keys", "k")
          .option("versionCol", "version")
          .option("deletedCol", "deleted")
          .option("batchId", "99").save()
      }
    }
    assert(CdcApply.currentVersion(spark, root).contains(1L),
      "denied format(\"cdc\") append must not commit a batch")
    // DataAdmin retains write access (the maintenance path keeps working)
    Governance.withPrincipal(spark, DataAdmin) {
      CdcApply.vacuum(spark, root, keep = 2)
    }
  }

  test("governance composes with the change feed: the stamp column " +
    "must be granted (like deleted), and the feed is then filtered") {
    val root = buildSnapshot()
    GovernanceCatalog.registerLocation(root, db, tbl)
    // grant WITHOUT the stamp column: the analyzer's missing-reference
    // rescue would evaluate the stamp filter but project the stamp
    // away — a feed with no batch attribution — so changesSince
    // refuses loudly instead of returning silently degraded
    GovernanceCatalog.register(Analyst, db, DataCellsFilter(
      "analyst-cdc", tbl, "region = 'APAC'",
      Seq("k", "version", "region", "amount", "deleted")))
    val e = intercept[IllegalStateException] {
      Governance.withPrincipal(spark, Analyst) {
        CdcApply.changesSince(spark, root, 0L).get.collect()
      }
    }
    assert(e.getMessage.contains(CdcApply.AppliedBatchCol))
    // the CAUGHT-UP poll (zero-filesystem empty feed) refuses
    // identically — a governed consumer must see the same loud
    // failure whether it polls behind or at the head
    val eCaughtUp = intercept[IllegalStateException] {
      Governance.withPrincipal(spark, Analyst) {
        CdcApply.changesSince(spark, root, 1L)
      }
    }
    assert(eCaughtUp.getMessage.contains(CdcApply.AppliedBatchCol))
    // grant including the stamp: the analyst's feed carries exactly the
    // APAC changes of batch 1 — the k=1 update AND the k=3 tombstone
    // (a sync consumer must see deletes), never the EMEA row
    GovernanceCatalog.register(Analyst, db, DataCellsFilter(
      "analyst-cdc", tbl, "region = 'APAC'",
      Seq("k", "version", "region", "amount", "deleted",
        CdcApply.AppliedBatchCol)))
    val feed = Governance.withPrincipal(spark, Analyst) {
      CdcApply.changesSince(spark, root, 0L).get.collect()
    }
    assert(feed.map(r => (r.getAs[Long]("k"),
      r.getAs[Boolean]("deleted"),
      r.getAs[Long]("_change_batch"))).toSet ==
      Set((1L, false, 1L), (3L, true, 1L)), feed.toSeq.toString)
    assert(!feed.head.schema.fieldNames.contains("secret"))
  }

  test("the SQL-name surface is governed identically: an Analyst " +
    "spark.sql over a registered CDC name is row-filtered and " +
    "column-pruned, Anonymous denied, writes refused") {
    val root = buildSnapshot()
    register(root)
    graft.streaming.CdcSql.registerTable(spark, root, "gov_sql_t")
    try {
      // the name expands to a governed parquet scan: the Analyst's SQL
      // sees exactly what the Scala readSnapshot path serves — the row
      // filter beneath, the allowlist projected, `secret` unresolvable
      val analyst = Governance.withPrincipal(spark, Analyst) {
        spark.sql("SELECT * FROM gov_sql_t").collect()
      }
      assert(analyst.map(_.schema.fieldNames.toSeq).distinct.toSeq ==
        Seq(Seq("k", "version", "region", "amount")),
        analyst.toSeq.toString)
      assert(analyst.map(r => (r.getAs[Long]("k"),
        r.getAs[Double]("amount"))).toSet == Set(1L -> 11.0))
      // selecting an ungranted column by name fails analysis
      val denied = intercept[Exception] {
        Governance.withPrincipal(spark, Analyst) {
          spark.sql("SELECT secret FROM gov_sql_t").collect()
        }
      }
      assert(denied.getMessage.contains("secret"), denied.getMessage)
      val admin = Governance.withPrincipal(spark, DataAdmin) {
        spark.sql("SELECT * FROM gov_sql_t").collect()
      }
      assert(admin.map(_.getAs[Long]("k")).toSet == Set(1L, 2L))
      assert(admin.head.schema.fieldNames.contains("secret"))
      val anon = spark.sql("SELECT * FROM gov_sql_t").collect()
      assert(anon.isEmpty, anon.toSeq.toString)
      // SQL DML stays refused regardless of principal
      val w = intercept[UnsupportedOperationException] {
        Governance.withPrincipal(spark, DataAdmin) {
          spark.sql("DELETE FROM gov_sql_t WHERE k = 1")
        }
      }
      assert(w.getMessage.contains("applyBatch"), w.getMessage)
      // the LIVE feed table function is governed identically: the
      // stamp column must be granted (the changesSince contract), and
      // the feed is then row-filtered + pruned for the Analyst
      GovernanceCatalog.register(Analyst, db, DataCellsFilter(
        "analyst-cdc", tbl, "region = 'APAC'",
        Seq("k", "version", "region", "amount", "deleted",
          CdcApply.AppliedBatchCol)))
      val feed = Governance.withPrincipal(spark, Analyst) {
        spark.sql(
          "SELECT * FROM cdc_changes('gov_sql_t', 0)").collect()
      }
      assert(feed.map(r => (r.getAs[Long]("k"),
        r.getAs[Boolean]("deleted"))).toSet ==
        Set(1L -> false, 3L -> true), feed.toSeq.toString)
      assert(!feed.head.schema.fieldNames.contains("secret"))
    } finally graft.streaming.CdcSql.unregisterTable("gov_sql_t")
  }

  test("governance composes with point lookup and the timestamp change " +
    "feed: out-of-grant keys read back empty, in-grant keys filtered") {
    val root = buildSnapshot()
    register(root)
    // analyst looks up k=2 (EMEA — outside the row filter): the
    // single-bucket read is governed like any other and comes back
    // EMPTY, never the row
    val miss = Governance.withPrincipal(spark, Analyst) {
      CdcApply.lookup(spark, root, Seq(2L)).get.collect()
    }
    assert(miss.isEmpty, miss.toSeq.toString)
    // in-grant key: current version, allowlisted columns only
    val hit = Governance.withPrincipal(spark, Analyst) {
      CdcApply.lookup(spark, root, Seq(1L)).get.collect()
    }
    assert(hit.map(r => (r.getAs[Long]("k"),
      r.getAs[Double]("amount"))).toSeq == Seq(1L -> 11.0))
    assert(!hit.head.schema.fieldNames.contains("secret"))
    // admin keeps the full view through the same path
    val adm = Governance.withPrincipal(spark, DataAdmin) {
      CdcApply.lookup(spark, root, Seq(2L)).get.collect()
    }
    assert(adm.map(_.getAs[Long]("k")).toSeq == Seq(2L))
    assert(adm.head.schema.fieldNames.contains("secret"))
    // absent-BUCKET lookup: the zero-filesystem empty frame applies
    // the SAME allowlist — no ungranted column names leak, and the
    // shape stays union-compatible with a present-bucket hit
    def bucketOf(k: Long): Int = {
      import spark.implicits._
      import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
      Seq(k).toDF("k")
        .select(pmod(xxhash64($"k"), lit(16L)).cast("int"))
        .head().getInt(0)
    }
    val live = Seq(1L, 2L, 3L).map(bucketOf).toSet
    val absentKey = (4L to 400L).find(k => !live.contains(bucketOf(k))).get
    val absent = Governance.withPrincipal(spark, Analyst) {
      CdcApply.lookup(spark, root, Seq(absentKey)).get
    }
    assert(absent.columns.toSeq == Seq("k", "version", "region", "amount"),
      absent.columns.mkString(","))
    assert(absent.count() == 0L)
    // and the ungoverned default still serves the full visible shape
    val absentAdmin = Governance.withPrincipal(spark, DataAdmin) {
      CdcApply.lookup(spark, root, Seq(absentKey)).get
    }
    assert(absentAdmin.columns.contains("secret"))
    // timestamp-addressed feed: t=1500 resolves to batch 0, and under a
    // stamp-granted allowlist the analyst gets exactly the APAC changes
    // of batch 1 — the k=1 update and the k=3 tombstone, never EMEA
    GovernanceCatalog.register(Analyst, db, DataCellsFilter(
      "analyst-cdc", tbl, "region = 'APAC'",
      Seq("k", "version", "region", "amount", "deleted",
        CdcApply.AppliedBatchCol)))
    val feed = Governance.withPrincipal(spark, Analyst) {
      CdcApply.changesSinceTs(spark, root, 1500L).get.collect()
    }
    assert(feed.map(r => (r.getAs[Long]("k"),
      r.getAs[Boolean]("deleted"))).toSet ==
      Set(1L -> false, 3L -> true), feed.toSeq.toString)
    assert(!feed.head.schema.fieldNames.contains("secret"))
  }

  test("governance composes with bucket-pruned value scans and gates " +
      "the administrative predicate writes") {
    val root = buildSnapshot()
    register(root)
    // analyst probes k=1 (APAC, in-grant) and k=2 (EMEA, filtered):
    // the pruned scan returns only the granted row, allowlisted shape
    val got = Governance.withPrincipal(spark, Analyst) {
      CdcApply.scanByBucketValues(spark, root, Seq(Seq(1L), Seq(2L)))
        .get.collect()
    }
    assert(got.map(r => (r.getAs[Long]("k"),
      r.getAs[Double]("amount"))).toSeq == Seq(1L -> 11.0),
      got.toSeq.toString)
    assert(!got.head.schema.fieldNames.contains("secret"))
    // deleteWhere under a non-admin principal is a WRITE: denied
    // before anything commits, and the state is untouched
    intercept[AccessDeniedException] {
      Governance.withPrincipal(spark, Analyst) {
        CdcApply.deleteWhere(spark, root,
          org.apache.spark.sql.functions.col("k") === 1L)
      }
    }
    val after = Governance.withPrincipal(spark, DataAdmin) {
      CdcApply.lookup(spark, root, Seq(1L)).get.collect()
    }
    assert(after.length == 1, "denied delete must not remove the row")
    assert(CdcApply.currentVersion(spark, root).contains(1L),
      "denied delete must not commit a batch")
    // restore is gated up front like its DML siblings: the denial
    // fires BEFORE any snapshot read, so a non-admin never computes
    // a restore diff from a masked view only to be fenced at commit
    intercept[AccessDeniedException] {
      Governance.withPrincipal(spark, Analyst) {
        CdcApply.restore(spark, root, 0L)
      }
    }
    assert(CdcApply.currentVersion(spark, root).contains(1L),
      "denied restore must not commit a batch")
  }

  test("the streaming cdc sink composes with the write fence: an " +
    "analyst's stream fails at the apply with nothing committed, and " +
    "the same checkpoint restarted as admin applies the batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = buildSnapshot()
    register(root)
    val v0 = CdcApply.currentVersion(spark, root)
    val ckpt = java.nio.file.Files
      .createTempDirectory("cdc_gov_sink").toFile.getAbsolutePath
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, Double, String, Boolean)]
    stream.addData((9L, 3L, "APAC", 9.0, "s9", false))
    def start() = stream.toDF()
      .toDF("k", "version", "region", "amount", "secret", "deleted")
      .writeStream.format("cdc")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      // above the table's committed history — replay-guard-clean ids
      .option("baseBatchId", "100")
      .start()
    val ex = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
      Governance.withPrincipal(spark, Analyst) {
        val q = start()
        try q.processAllAvailable() finally q.stop()
      }
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(ex).exists(c =>
      c.isInstanceOf[AccessDeniedException] ||
        String.valueOf(c.getMessage).contains("denied")),
      s"not a governance denial: $ex")
    assert(CdcApply.currentVersion(spark, root) == v0,
      "denied stream must not commit a batch")
    // same checkpoint, admin principal: the engine re-runs the epoch
    // and the apply lands
    Governance.withPrincipal(spark, DataAdmin) {
      val q = start()
      try q.processAllAvailable() finally q.stop()
      assert(CdcApply.lookup(spark, root, Seq(9L)).get
        .collect().length == 1, "admin restart must apply the batch")
    }
  }
}
