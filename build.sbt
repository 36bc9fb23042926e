ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tfawslakeformationgoverneddatalakedemospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// ---- test wall clock: suites run in N concurrently-forked JVMs ----
// Each group is its OWN JVM (own SparkSession, own warehouse dir), so
// suites keep the sequential shared-session semantics WITHIN a group
// while the wall clock divides by ~N. Cross-JVM shared state is only
// target/graft-data artifacts — committed via one-winner atomic
// renames (Artifacts.commitOnce / the fixture's _SUCCESS check) — and
// the sales-fixture suites, pinned into one group below.
val testJvmGroups = 4
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  def groupOf(shortName: String, idx: Int): Int =
    if (shortName.startsWith("Governance")) 0
    else idx % testJvmGroups
  tests.sortBy(_.name).zipWithIndex
    .groupBy { case (t, i) =>
      groupOf(t.name.stripPrefix("graft."), i) }
    .toSeq.sortBy(_._1)
    .map { case (g, ts) =>
      Tests.Group(s"g$g", ts.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testJvmGroups),
  Tags.limitAll(32))
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
