package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.connector.catalog.{Table, TableCapability}
import org.apache.spark.sql.types.StructType

import graft.governance.{GovernanceCatalog, GovernanceWriteCheck}

/** Structural (non-toString) recovery of streaming file-sink paths, and
  * the fail-closed contract when recovery is impossible. Stubs stand in
  * for sink shapes: a `path`-field carrier named like the real
  * FileStreamSink, a same-named sink with NO recoverable path (the
  * "Spark upgrade moved the field" scenario), and a non-file sink.
  */
object FakeSinks {
  abstract class TableStub extends Table {
    override def name(): String = "stub"
    override def schema(): StructType = new StructType()
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.Collections.emptySet()
  }
  /** Recognizable as a file sink by debug form only — path recovered
    * from toString when no field exists (a relocated class whose debug
    * form survived).
    */
  final class RenamedSink(p: String) extends TableStub {
    override def toString: String = s"FileSink[$p]"
  }
  /** A non-file sink (memory, kafka, foreach): never a location target. */
  final class MemorySink extends TableStub {
    override def toString: String = "MemorySink"
  }
}

/** Top-level so the binary name ends in `.FileStreamSink` exactly like
  * the real sink's — recognizably file-flavored by NAME, but with no
  * path field and an opaque toString: extraction must fail and the
  * check must deny.
  */
class FileStreamSink extends FakeSinks.TableStub {
  override def toString: String = "opaque"
}

class GovernanceSinkSpec extends AnyFunSuite with SparkTestBase {

  private lazy val check = GovernanceWriteCheck(spark)

  test("file-sink path is recovered structurally and matched against " +
    "governed locations") {
    val loc = java.nio.file.Files
      .createTempDirectory("sinkgov").toFile.getAbsolutePath
    GovernanceCatalog.registerLocation(loc, "sink_db", "sink_tbl")
    val governed = new FileStreamSink {
      // no path field: falls back to debug form pointing at the location
      override def toString: String = s"FileSink[$loc/part]"
    }
    assert(check.streamingSinkTarget(governed, None, None)
      .contains(("sink_db", "sink_tbl")))
    // an ungoverned path resolves to NO target — the check over-denies
    // nothing when extraction succeeds
    val free = new FakeSinks.RenamedSink("/tmp/ungoverned_anywhere")
    assert(check.streamingSinkTarget(free, None, None).isEmpty)
    // non-file sinks are never location targets
    assert(check.streamingSinkTarget(new FakeSinks.MemorySink, None, None)
      .isEmpty)
  }

  test("a file sink with an unrecoverable path fails CLOSED") {
    val opaque = new FileStreamSink
    assert(opaque.getClass.getName.endsWith(".FileStreamSink"),
      opaque.getClass.getName)
    val target = check.streamingSinkTarget(opaque, None, None)
    assert(target.isDefined, "unextractable file-sink path must DENY")
    assert(target.get._1 == "(unresolved file-sink path)", target.toString)
  }

  test("the real FileStreamSink still yields its path reflectively") {
    // construct the genuine sink and confirm the reflective read works
    // on this Spark version (the spec that breaks loudly on upgrade,
    // instead of the enforcement failing open)
    val dir = java.nio.file.Files
      .createTempDirectory("realsink").toFile.getAbsolutePath
    val real = new org.apache.spark.sql.execution.streaming.sinks
      .FileStreamSink(spark, dir,
        new org.apache.spark.sql.execution.datasources.parquet
          .ParquetFileFormat,
        Nil, Map.empty)
    assert(check.isFileSink(real))
    assert(check.fileSinkPath(real).contains(dir))
  }
}
