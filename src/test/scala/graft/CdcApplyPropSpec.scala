package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck differential for the partition-scoped CDC apply: an
  * ARBITRARY change history (random keys, globally unique versions in
  * random delivery order, random deletes) split into random micro-
  * batches — applied through the full bucketed snapshot machinery —
  * must land on the same final state as a trivial in-memory
  * latest-wins-by-version reference. This exercises exactly the cases
  * enumerated specs can miss: late lower-versioned updates after
  * deletes, keys churning across batches, cross-batch re-delivery,
  * batches touching disjoint or overlapping bucket sets, and empty
  * splits.
  */
class CdcApplyPropSpec extends AnyFunSuite with SparkTestBase {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  // a change history: row i carries version perm(i) — unique globally
  // (the operator's documented precondition) but delivered in an order
  // unrelated to version order, so later batches routinely carry OLDER
  // versions
  private val historyGen: Gen[List[(Long, Long, Long, Boolean)]] = for {
    n <- Gen.chooseNum(6, 18)
    keys <- Gen.listOfN(n, Gen.chooseNum(0L, 5L))
    payloads <- Gen.listOfN(n, Gen.chooseNum(0L, 999L))
    deleted <- Gen.listOfN(n, Gen.prob(0.25))
    perm <- Gen.const(scala.util.Random.javaRandomToRandom(
      new java.util.Random(n * 7919L)).shuffle((1L to n.toLong).toList))
  } yield keys.lazyZip(perm).lazyZip(payloads).lazyZip(deleted).toList
    .map { case (k, v, pay, d) => (k, v, pay, d) }

  // historyGen with each key's versions REASSIGNED into delivery order
  // (still globally unique): no late lower-versioned events. The mirror
  // sync theorem is exact only for late events WITHIN the source's
  // tombstone retention — a later event older than an EXPIRED tombstone
  // is outside the source's own latest-wins contract (the source
  // admits it once its tombstone ages; the mirror, whose replicated
  // tombstone clock is its sync batch, may still hold the delete — the
  // documented conservative divergence in the syncMirror scaladoc). The
  // small retentions the mirror property needs to exercise the refusal
  // path would otherwise make such out-of-contract lates routine; late
  // events under a retention nothing ages out of are covered by the
  // apply/maintenance properties above.
  private val orderedHistoryGen: Gen[List[(Long, Long, Long, Boolean)]] =
    historyGen.map { h =>
      val versionAt: Map[Int, Long] = h.zipWithIndex
        .groupBy(_._1._1).valuesIterator.flatMap { rows =>
          rows.map(_._2).zip(rows.map(_._1._2).sorted)
        }.toMap
      h.zipWithIndex.map { case ((k, _, pay, d), i) =>
        (k, versionAt(i), pay, d)
      }
    }

  test("property: batched bucketed apply equals global latest-wins, " +
      "copy-on-write and merge-on-read alike") {
    import spark.implicits._
    val p = Prop.forAll(historyGen, Gen.chooseNum(1, 4),
      Gen.prob(0.5), Gen.oneOf(0, 1, 2),
      Gen.prob(0.5)) { (history, nBatches, redeliver, maxDeltas,
        doCompact) =>
      val root = java.nio.file.Files
        .createTempDirectory("cdc_prop").toFile.getAbsolutePath
      // split the history into nBatches contiguous chunks (some may be
      // empty); optionally re-deliver batch 0's first row in the last
      // batch verbatim — it must be dropped by the (key, version)
      // anti-join (copy-on-write) or resolved to the first-applied row
      // (merge-on-read), not merged twice or flagged ambiguous
      val size = math.max(1, history.size / nBatches)
      val batches0 = history.grouped(size).toList.padTo(nBatches, Nil)
      val batches =
        if (redeliver && batches0.head.nonEmpty)
          batches0.init :+ (batches0.last :+ batches0.head.head)
        else batches0
      batches.zipWithIndex.foreach { case (rows, id) =>
        graft.streaming.CdcApply.applyBatch(
          rows.toDF("k", "version", "payload", "deleted"),
          id.toLong, root, Seq("k"), "version", Some("deleted"),
          numBuckets = 4, tombstoneRetention = 100,
          maxDeltas = maxDeltas)
      }
      // a maintenance compaction is content-neutral by contract
      if (doCompact) graft.streaming.CdcApply.compactBuckets(spark, root)
      val got = graft.streaming.CdcApply.readSnapshot(spark, root)
        .map(_.collect()
          .map(r => r.getAs[Long]("k") -> r.getAs[Long]("payload")).toMap)
        .getOrElse(Map.empty)
      val expect = history.groupBy(_._1).flatMap { case (k, rows) =>
        val winner = rows.maxBy(_._2)
        if (winner._4) None else Some(k -> winner._3)
      }
      val ok = got == expect
      if (!ok) println(s"[cdc-prop] history=$history batches=$batches " +
        s"maxDeltas=$maxDeltas got=$got expect=$expect")
      ok
    }
    check(p)
  }

  test("property: additive evolution mid-stream still equals global " +
      "latest-wins, with NULLs exactly on pre-evolution winners — " +
      "copy-on-write and merge-on-read alike") {
    import spark.implicits._
    val p = Prop.forAll(historyGen, Gen.chooseNum(1, 4),
      Gen.chooseNum(0, 5), Gen.oneOf(0, 2)) {
      (history, nBatches, evolveAt, maxDeltas) =>
      val root = java.nio.file.Files
        .createTempDirectory("cdc_prop_ev").toFile.getAbsolutePath
      val size = math.max(1, history.size / nBatches)
      val batches = history.grouped(size).toList
      batches.zipWithIndex.foreach { case (rows, id) =>
        // batches from `evolveAt` on deliver an extra column (a pure
        // function of the payload, so the expectation is closed-form)
        val df =
          if (id >= evolveAt)
            rows.map(r => (r._1, r._2, r._3, r._4, r._3 * 2))
              .toDF("k", "version", "payload", "deleted", "extra")
          else rows.toDF("k", "version", "payload", "deleted")
        graft.streaming.CdcApply.applyBatch(df, id.toLong, root,
          Seq("k"), "version", Some("deleted"),
          numBuckets = 4, tombstoneRetention = 100,
          maxDeltas = maxDeltas)
      }
      val snap = graft.streaming.CdcApply.readSnapshot(spark, root)
      val hasExtra = snap.exists(_.columns.contains("extra"))
      val got = snap.map(_.collect().map(r =>
        r.getAs[Long]("k") -> ((r.getAs[Long]("payload"),
          if (hasExtra) Option(r.getAs[Any]("extra")) else None)))
        .toMap).getOrElse(Map.empty)
      // reference: winner by version; its EXTRA is set iff the winning
      // delivery arrived in an evolved batch
      val expect = history.zipWithIndex.groupBy(_._1._1).flatMap {
        case (k, rows) =>
          val (winner, idx) = rows.maxBy(_._1._2)
          if (winner._4) None
          else Some(k -> ((winner._3,
            if (idx / size >= evolveAt) Some(winner._3 * 2) else None)))
      }
      // the column itself exists iff any applied (non-empty) batch was
      // evolved
      val expectExtra = batches.zipWithIndex
        .exists { case (rows, id) => id >= evolveAt && rows.nonEmpty }
      val ok = got == expect && hasExtra == expectExtra
      if (!ok) println(s"[cdc-prop-ev] history=$history " +
        s"evolveAt=$evolveAt maxDeltas=$maxDeltas got=$got " +
        s"expect=$expect hasExtra=$hasExtra expectExtra=$expectExtra")
      ok
    }
    check(p)
  }

  test("property: changelog replay — the emitted event stream alone " +
      "reconstructs the table's final state") {
    import spark.implicits._
    val C = graft.streaming.CdcApply
    val p = Prop.forAll(historyGen, Gen.chooseNum(1, 4)) {
      (history, nBatches) =>
        val root = java.nio.file.Files
          .createTempDirectory("cdc_prop_log").toFile.getAbsolutePath
        val size = math.max(1, history.size / nBatches)
        history.grouped(size).toList.zipWithIndex.foreach {
          case (rows, id) =>
            C.applyBatch(
              rows.toDF("k", "version", "payload", "deleted"),
              id.toLong, root, Seq("k"), "version", Some("deleted"),
              numBuckets = 4, changelog = true)
        }
        // a consumer that saw ONLY the events (no snapshot access) and
        // applies latest-wins lands on the table's state
        val events = spark.read
          .parquet(s"$root/changelog/b*")
          .select("k", "version", "payload", "deleted")
          .as[(Long, Long, Long, Boolean)].collect()
        val replayed = events.groupBy(_._1).flatMap { case (k, es) =>
          val w = es.maxBy(_._2)
          if (w._4) None else Some(k -> w._3)
        }
        val table = C.readSnapshot(spark, root)
          .map(_.collect().map(r =>
            r.getAs[Long]("k") -> r.getAs[Long]("payload")).toMap)
          .getOrElse(Map.empty)
        val ok = replayed == table
        if (!ok) println(s"[cdc-prop-log] history=$history " +
          s"replayed=$replayed table=$table")
        ok
    }
    check(p)
  }

  test("property: sync theorem — mirror at any batch + changesSince " +
      "reproduces the current snapshot, rebucket and merge-on-read " +
      "included") {
    import spark.implicits._
    val C = graft.streaming.CdcApply
    val p = Prop.forAll(historyGen, Gen.chooseNum(2, 4),
      Gen.prob(0.5), Gen.oneOf(0, 2)) {
      (history, nBatches, doRebucket, maxDeltas) =>
      val root = java.nio.file.Files
        .createTempDirectory("cdc_prop_sync").toFile.getAbsolutePath
      val size = math.max(1, history.size / nBatches)
      val applied = history.grouped(size).toList.zipWithIndex.filter {
        case (rows, id) =>
          C.applyBatch(rows.toDF("k", "version", "payload", "deleted"),
            id.toLong, root, Seq("k"), "version", Some("deleted"),
            numBuckets = 4, tombstoneRetention = 100,
            maxDeltas = maxDeltas)
      }.map(_._2)
      // a layout rewrite must carry every stamp forward verbatim
      if (doRebucket && applied.nonEmpty) C.rebucket(spark, root, 7)
      def live(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.collect()
          .map(r => r.getAs[Long]("k") -> r.getAs[Long]("payload")).toMap
      val current = C.readSnapshot(spark, root)
        .map(live).getOrElse(Map.empty)
      // the theorem, for EVERY retained batch: a consumer that mirrored
      // the live state as of batch k and then applies the feed (upserts
      // replace, deletes remove) lands exactly on the current state
      val ok = applied.forall { k =>
        val mirror = C.readSnapshotAt(spark, root, k.toLong)
          .map(live).getOrElse(Map.empty)
        val synced = C.changesSince(spark, root, k.toLong).get
          .collect().foldLeft(mirror) { (m, r) =>
            if (r.getAs[Boolean]("deleted")) m - r.getAs[Long]("k")
            else m + (r.getAs[Long]("k") -> r.getAs[Long]("payload"))
          }
        val pass = synced == current
        if (!pass) println(s"[cdc-prop-sync] k=$k history=$history " +
          s"rebucket=$doRebucket mirror=$mirror synced=$synced " +
          s"current=$current")
        pass
      }
      ok
    }
    check(p)
  }

  test("property: metadata-driven maintenance polls under any cadence " +
      "are content-neutral and keep trickle replication exact") {
    import spark.implicits._
    val C = graft.streaming.CdcApply
    // maint step per batch: 0 = none, 1 = compactIfNeeded with a
    // 1-byte delta bound (folds every delta-bearing bucket), 2 =
    // rebucketIfNeeded with a 1-byte size cap and a huge target (always
    // over the cap, grows the layout by exactly one bucket) — the polls
    // interleave with applies and mirror syncs in random order, and
    // none of it may change content or break replication
    val p = Prop.forAll(historyGen, Gen.chooseNum(2, 4),
      Gen.oneOf(0, 2), Gen.listOfN(4, Gen.chooseNum(0, 2))) {
      (history, nBatches, maxDeltas, maint) =>
      val root = java.nio.file.Files
        .createTempDirectory("cdc_prop_mnt_src").toFile.getAbsolutePath
      val mroot = java.nio.file.Files
        .createTempDirectory("cdc_prop_mnt_dst").toFile.getAbsolutePath
      val size = math.max(1, history.size / nBatches)
      history.grouped(size).toList.zipWithIndex.foreach {
        case (rows, id) =>
          if (C.applyBatch(
              rows.toDF("k", "version", "payload", "deleted"),
              id.toLong, root, Seq("k"), "version", Some("deleted"),
              numBuckets = 4, tombstoneRetention = 100,
              maxDeltas = maxDeltas)) {
            maint(id % maint.size) match {
              case 1 => C.compactIfNeeded(spark, root, maxDeltaBytes = 1L)
              case 2 => C.rebucketIfNeeded(spark, root,
                maxBucketBytes = 1L, targetBucketBytes = Long.MaxValue)
              case _ => ()
            }
            C.syncMirror(spark, root, mroot, numBuckets = 4)
          }
      }
      def live(r: String): Map[Long, Long] =
        C.readSnapshot(spark, r).map(_.collect()
          .map(x => x.getAs[Long]("k") -> x.getAs[Long]("payload"))
          .toMap).getOrElse(Map.empty)
      val expect = history.groupBy(_._1).flatMap { case (k, rows) =>
        val w = rows.maxBy(_._2)
        if (w._4) None else Some(k -> w._3)
      }
      val (src, mir) = (live(root), live(mroot))
      val ok = src == expect && mir == expect
      if (!ok) println(s"[cdc-prop-maint] history=$history " +
        s"maint=$maint maxDeltas=$maxDeltas src=$src mir=$mir " +
        s"expect=$expect")
      ok
    }
    check(p)
  }

  test("property: trickle mirror straddling the retention bound — " +
      "every sync replicates exactly or refuses loudly; reseed " +
      "recovers and the final states agree") {
    import spark.implicits._
    val C = graft.streaming.CdcApply
    // small retentions (0..2) so histories routinely age tombstones
    // out of the feed: retention 0 refuses on EVERY lagging sync (its
    // delete events never survive into the feed), larger retentions
    // mix the trickle path and the refusal path across generated runs.
    // orderedHistoryGen (no late lower-versioned events): under these
    // retentions a beyond-retention late event is out of the exactness
    // contract — see the generator comment
    val p = Prop.forAll(orderedHistoryGen, Gen.chooseNum(2, 4),
      Gen.chooseNum(0, 2), Gen.chooseNum(1, 2), Gen.oneOf(0, 2)) {
      (history, nBatches, retention, syncEvery, maxDeltas) =>
      val root = java.nio.file.Files
        .createTempDirectory("cdc_prop_mir_src").toFile.getAbsolutePath
      val mroot = java.nio.file.Files
        .createTempDirectory("cdc_prop_mir_dst").toFile.getAbsolutePath
      val size = math.max(1, history.size / nBatches)
      val chunks = history.grouped(size).toList
      chunks.zipWithIndex.foreach {
        case (rows, id) =>
          if (C.applyBatch(
              rows.toDF("k", "version", "payload", "deleted"),
              id.toLong, root, Seq("k"), "version", Some("deleted"),
              numBuckets = 4, tombstoneRetention = retention,
              maxDeltas = maxDeltas)) {
            // syncEvery=2 makes the mirror routinely lag TWO batches:
            // with retention 0-1 that crosses the bound (refusal +
            // reseed), with retention 2 it trickles — both paths must
            // land the mirror back in lockstep
            if (id % syncEvery == 0 || id == chunks.size - 1) {
              try C.syncMirror(spark, root, mroot, numBuckets = 4)
              catch {
                // ONLY the documented retention refusal may trigger a
                // reseed — any other IllegalStateException must fail
                // the property, not be silently converted into a pass
                case e: IllegalStateException
                    if e.getMessage.contains("re-seed") =>
                  C.reseedMirror(spark, root, mroot, numBuckets = 4)
              }
            }
          }
      }
      def live(r: String): Map[Long, Long] =
        C.readSnapshot(spark, r).map(_.collect()
          .map(x => x.getAs[Long]("k") -> x.getAs[Long]("payload"))
          .toMap).getOrElse(Map.empty)
      val (src, mir) = (live(root), live(mroot))
      val wmOk = C.currentVersion(spark, mroot) ==
        C.currentVersion(spark, root)
      val ok = src == mir && wmOk
      if (!ok) println(s"[cdc-prop-mirror] retention=$retention " +
        s"history=$history src=$src mir=$mir wmOk=$wmOk")
      ok
    }
    check(p)
  }

  test("property: restore to any retained batch reproduces that " +
      "batch's snapshot, advances the head, feeds exactly the diff, " +
      "and preserves time travel") {
    import spark.implicits._
    val C = graft.streaming.CdcApply
    val p = Prop.forAll(historyGen, Gen.chooseNum(2, 4),
      Gen.oneOf(0, 2), Gen.chooseNum(0, 10)) {
      (history, nBatches, maxDeltas, pick) =>
        val root = java.nio.file.Files
          .createTempDirectory("cdc_restore_prop").toFile.getAbsolutePath
        val size = math.max(1, history.size / nBatches)
        val batches = history.grouped(size).toList.padTo(nBatches, Nil)
        batches.zipWithIndex.foreach { case (rows, id) =>
          C.applyBatch(rows.toDF("k", "version", "payload", "deleted"),
            id.toLong, root, Seq("k"), "version", Some("deleted"),
            numBuckets = 4, tombstoneRetention = 100,
            commitTs = Some(1000L * (id + 1)), maxDeltas = maxDeltas)
        }
        // rows keyed (version, payload): restore must reproduce BOTH
        def live(df: Option[org.apache.spark.sql.DataFrame])
            : Map[Long, (Long, Long)] =
          df.map(_.collect().map(r => r.getAs[Long]("k") ->
            ((r.getAs[Long]("version"), r.getAs[Long]("payload"))))
            .toMap).getOrElse(Map.empty)
        val retained = C.history(spark, root).collect()
          .map(_.getAs[Long]("batch_id")).distinct.sorted
        val head = C.currentVersion(spark, root).get
        val target = retained(pick % retained.length)
        val travelsBefore = retained
          .map(b => b -> live(C.readSnapshotAt(spark, root, b))).toMap
        val before = travelsBefore(target)
        val atHead = live(C.readSnapshot(spark, root))
        val res = C.restore(spark, root, target,
          commitTs = Some(77777L))
        val after = live(C.readSnapshot(spark, root))
        val stateOk = after == before
        val ok = res match {
          case None =>
            // no-op must mean the states really were identical, and
            // the head must not have moved
            stateOk && before == atHead &&
              C.currentVersion(spark, root).contains(head)
          case Some(nb) =>
            val headOk = nb == head + 1 &&
              C.currentVersion(spark, root).contains(nb)
            // every pre-restore batch must time-travel unchanged
            val travelOk = retained.forall(b =>
              live(C.readSnapshotAt(spark, root, b)) == travelsBefore(b))
            val headTravelOk =
              live(C.readSnapshotAt(spark, root, head)) == atHead
            // the feed past the old head is EXACTLY the logical diff
            val feed = C.changesSince(spark, root, head).get.collect()
              .map(r => (r.getAs[Long]("k"),
                Option(r.getAs[java.lang.Long]("payload"))
                  .map(_.longValue),
                r.getAs[Boolean]("deleted"))).toSet
            val expectUpserts = before.collect {
              case (k, (v, pay)) if !atHead.get(k).contains((v, pay)) =>
                (k, Some(pay), false)
            }.toSet
            val expectDeletes = (atHead.keySet -- before.keySet)
              .map(k => (k, Some(atHead(k)._2), true))
            val feedOk = feed == expectUpserts ++ expectDeletes
            // a repeat restore to the same target is a no-op
            val idemOk = C.restore(spark, root, target).isEmpty
            stateOk && headOk && travelOk && headTravelOk && feedOk &&
              idemOk
        }
        if (!ok) println(s"[restore-prop] history=$history " +
          s"target=$target maxDeltas=$maxDeltas res=$res " +
          s"before=$before atHead=$atHead after=$after")
        ok
    }
    check(p)
  }

  test("property: a tag pins any batch through vacuum under any " +
      "history; untagging releases exactly that pin") {
    import spark.implicits._
    val C = graft.streaming.CdcApply
    val p = Prop.forAll(historyGen, Gen.chooseNum(3, 4),
      Gen.chooseNum(0, 10)) { (history, nBatches, pick) =>
      val root = java.nio.file.Files
        .createTempDirectory("cdc_tag_prop").toFile.getAbsolutePath
      val size = math.max(1, history.size / nBatches)
      val batches = history.grouped(size).toList.padTo(nBatches, Nil)
      batches.zipWithIndex.foreach { case (rows, id) =>
        C.applyBatch(rows.toDF("k", "version", "payload", "deleted"),
          id.toLong, root, Seq("k"), "version", Some("deleted"),
          numBuckets = 4, tombstoneRetention = 100,
          commitTs = Some(1000L * (id + 1)))
      }
      val retained = C.history(spark, root).collect()
        .map(_.getAs[Long]("batch_id")).distinct.sorted
      val head = retained.last
      val target = retained(pick % retained.length)
      def snap(b: Long): Option[Map[Long, Long]] =
        C.readSnapshotAt(spark, root, b).map(_.collect()
          .map(r => r.getAs[Long]("k") -> r.getAs[Long]("version"))
          .toMap)
      val before = snap(target)
      C.tag(spark, root, "pin", target)
      C.vacuum(spark, root, keep = 1, expireTombstones = false)
      // the pinned batch reads identically after a keep=1 sweep
      val pinnedOk = snap(target) == before &&
        C.currentVersion(spark, root).contains(head)
      // every untagged non-head batch is gone
      val sweptOk = retained.filterNot(b => b == head || b == target)
        .forall(b => snap(b).isEmpty)
      assert(C.untag(spark, root, "pin"))
      C.vacuum(spark, root, keep = 1, expireTombstones = false)
      // released: only the head remains readable
      val releasedOk = (target == head) || snap(target).isEmpty
      assert(pinnedOk && sweptOk && releasedOk,
        s"target=$target head=$head retained=${retained.toSeq} " +
          s"pinned=$pinnedOk swept=$sweptOk released=$releasedOk")
      true
    }
    check(p)
  }
}
