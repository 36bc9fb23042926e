package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Pure-function regressions for the interop internals (no Spark
  * session): schema-fingerprint separator collisions and
  * metadata-pruning string order for supplementary characters.
  */
class InteropUnitSpec extends AnyFunSuite {

  // ---- IcebergV2 schema fingerprint ---------------------------------------

  private def st(names: String*): StructType =
    StructType(names.map(n => StructField(n, StringType)))

  test("schemaFp: distinct schemas never fingerprint identically " +
      "([a,b] vs [ab]) and extending the last column's name is NOT " +
      "append-only evolution") {
    assert(IcebergV2.schemaFp(st("a", "b")) != IcebergV2.schemaFp(st("ab")))
    // genuine append keeps every existing position
    assert(IcebergV2.isAppendEvolution(
      IcebergV2.schemaFp(st("a", "b")), IcebergV2.schemaFp(st("a", "b", "c"))))
    assert(IcebergV2.isAppendEvolution(
      IcebergV2.schemaFp(st("c")), IcebergV2.schemaFp(st("c"))))
    // renaming/extending the LAST column must force a full snapshot
    assert(!IcebergV2.isAppendEvolution(
      IcebergV2.schemaFp(st("c")), IcebergV2.schemaFp(st("cd"))))
    assert(!IcebergV2.isAppendEvolution(
      IcebergV2.schemaFp(st("a", "b")), IcebergV2.schemaFp(st("a", "bc"))))
    // drop / reorder are not append evolution either
    assert(!IcebergV2.isAppendEvolution(
      IcebergV2.schemaFp(st("a", "b")), IcebergV2.schemaFp(st("b", "a"))))
    assert(!IcebergV2.isAppendEvolution(
      IcebergV2.schemaFp(st("a", "b")), IcebergV2.schemaFp(st("a"))))
    // empty stored fp (fresh state) accepts anything
    assert(IcebergV2.isAppendEvolution("", IcebergV2.schemaFp(st("x"))))
  }

  // ---- MetaPrune string order (UTF-8 bytes, not UTF-16 units) -------------

  private val Emoji = "😀" // U+1F600, a surrogate pair

  test("string bounds compare in CODE-POINT order: a supplementary " +
      "character sorts ABOVE U+FFFF even though its UTF-16 units sort " +
      "below, so files that match are kept") {
    // file interval [emoji, emoji]; predicate col > U+FFFF
    // code points: U+1F600 > U+FFFF -> the row matches -> must keep.
    // UTF-16 units would say 0xD83D < 0xFFFF and wrongly prune.
    assert(MetaPrune.satisfiable(">", None, Some(Right(Emoji)),
      Right("\uffff")))
    // and the converse direction stays prunable: col < U+FFFF
    // cannot match a file whose MIN is the emoji
    assert(!MetaPrune.satisfiable("<", Some(Right(Emoji)), None,
      Right("\uffff")))
    // equality against an interval that cannot contain the literal
    assert(!MetaPrune.satisfiable("=", Some(Right(Emoji)),
      Some(Right(Emoji)), Right("\uffff")))
    // plain ASCII ordering is unchanged
    assert(MetaPrune.satisfiable("=", Some(Right("apple")),
      Some(Right("pear")), Right("mango")))
    assert(!MetaPrune.satisfiable("=", Some(Right("apple")),
      Some(Right("pear")), Right("zebra")))
  }

  test("canonUriString (executor-side) renders exactly like the " +
      "canonUri column for every path shape the DV join compares") {
    val paths = Seq(
      "file:/tmp/a/b.parquet",
      "file:///tmp/a/b.parquet",
      "file:/tmp/with space/f.parquet",
      "file:///tmp/with%20space/f.parquet",
      "file:/tmp/plus+sign/f.parquet",
      "file:///tmp/plus+sign%2Bmore/f.parquet",
      "hdfs://nn:8020/data/f.parquet",
      "s3a://bucket/key%2Fdeep/f.parquet",
      "/bare/local/path.parquet")
    // the column twin needs a session; use the shared test one (a
    // fresh getOrCreate here could become the JVM's session and
    // poison later suites' config)
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val viaColumn = paths.toDF("p")
      .select(IcebergInterop.canonUri(col("p")))
      .collect().map(_.getString(0)).toSeq
    val viaScala = paths.map(IcebergInterop.canonUriString)
    assert(viaColumn == viaScala,
      viaColumn.zip(viaScala).filter(t => t._1 != t._2).toString)
  }

  test("bounds carrying UNPAIRED surrogates are incomparable: the " +
      "file is kept (conservative superset), never pruned") {
    val lone = "\ud83d" // high surrogate with no low surrogate
    assert(MetaPrune.satisfiable("<", Some(Right(lone)), None,
      Right("a")))
    assert(MetaPrune.satisfiable(">", None, Some(Right(lone)),
      Right("z")))
    assert(MetaPrune.satisfiable("=", Some(Right("a")),
      Some(Right(lone)), Right("zz")))
  }
}
