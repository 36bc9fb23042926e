package graft

import org.apache.spark.sql.SparkSession

/** One shared SparkSession for the whole test JVM (suites run
  * sequentially), configured identically to the Verify/Bench sessions:
  * governance extension installed, audit listener registered, UTC, NTZ
  * parquet handling.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      // cost-based planning posture: stats recorded by ANALYZE feed
      // Catalyst (join reorder needs row counts on every side)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.planStats.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.extensions", "graft.governance.GraftExtensions")
      // per-JVM warehouse: test suites run in several concurrently
      // forked JVMs (build.sbt testGrouping); a shared warehouse would
      // let one JVM's catalog DDL delete files another JVM reads
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/spark-warehouse-test-" +
          ProcessHandle.current().pid()).getAbsolutePath)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.listenerManager.register(new graft.governance.AuditListener)
    s
  }

  /** sf0.001 testdata — smallest scale, enough for behavioral asserts. */
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestSession.spark
  def sfDir: String = SparkTestSession.sfDir
}
