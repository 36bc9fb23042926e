package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.governance._

/** ScalaCheck invariants for the governance layer (SURVEY §5): mask
  * idempotence and completeness over arbitrary inputs, and the
  * Analyst-⊆-Admin containment on the live data. Properties run through
  * the engine (a one-column DataFrame per batch), so they exercise the
  * actual Catalyst expressions, not a Scala reimplementation.
  */
class GovernancePropSpec extends AnyFunSuite with SparkTestBase {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  /** Apply a Column->Column mask to a batch of strings via the engine. */
  private def applyMask(f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column, inputs: Seq[String]): Seq[String] = {
    import spark.implicits._
    inputs.toDF("s").select(f($"s").as("m")).collect().map(_.getString(0))
  }

  // local part non-empty: the reference's anchored pattern
  // `^([^@]{1,3}).*@` (outputs.tf:48) requires at least one local char —
  // a pathological "@domain.com" passes through unmasked there too.
  private val emailGen: Gen[String] = for {
    head <- Gen.alphaNumChar
    rest <- Gen.alphaNumStr.map(_.take(11))
    domain <- Gen.alphaLowerStr.map(_.take(10))
  } yield s"$head$rest@$domain.com"

  private val ssnGen: Gen[String] = for {
    a <- Gen.chooseNum(0, 999)
    b <- Gen.chooseNum(0, 99)
    c <- Gen.chooseNum(0, 9999)
  } yield f"$a%03d-$b%02d-$c%04d"

  test("ssn mask leaves no digit, for arbitrary SSNs") {
    check(Prop.forAll(Gen.listOfN(20, ssnGen)) { ssns =>
      applyMask(Governance.maskSsn, ssns)
        .forall(m => !m.exists(_.isDigit))
    })
  }

  test("ssn mask is idempotent") {
    check(Prop.forAll(Gen.listOfN(20, ssnGen)) { ssns =>
      val once = applyMask(Governance.maskSsn, ssns)
      applyMask(Governance.maskSsn, once) == once
    })
  }

  test("email mask is idempotent and hides the local part") {
    check(Prop.forAll(Gen.listOfN(20, emailGen)) { emails =>
      val once = applyMask(Governance.maskEmail, emails)
      applyMask(Governance.maskEmail, once) == once &&
        once.forall(_.startsWith("***@")) &&
        emails.zip(once).forall { case (orig, masked) =>
          val local = orig.takeWhile(_ != '@')
          local.length <= 3 || !masked.contains(local)
        }
    })
  }

  // path segments with URI-legal and URI-ILLEGAL (space) characters —
  // the two arrival forms the location registry must reconcile
  private val segGen: Gen[String] = for {
    head <- Gen.alphaNumChar
    tail <- Gen.listOfN(6,
      Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const(' '),
        1 -> Gen.oneOf('-', '_', '.'))).map(_.mkString)
  } yield (head + tail).trim

  test("registration key always matches the read side's encoded URI form") {
    check(Prop.forAll(Gen.listOfN(3, segGen).suchThat(_.forall(_.nonEmpty))) {
      segs =>
        val raw = "/govprop-root/" + segs.mkString("/")
        // read side: HadoopFsRelation rootPaths arrive as Hadoop Path
        // URIs (percent-encoded); registration gets the raw string
        val hadoopForm =
          new org.apache.hadoop.fs.Path(raw).toUri.toString
        GovernanceCatalog.registerLocation(raw, "govpropdb", "t")
        GovernanceCatalog.tableForLocation(hadoopForm)
          .contains(("govpropdb", "t")) &&
          GovernanceCatalog
            .tableForLocation(hadoopForm + "/part-0.parquet")
            .contains(("govpropdb", "t"))
    })
  }

  test("scheme aliases and case cannot smuggle a read past the registry") {
    check(Prop.forAll(Gen.listOfN(2, segGen).suchThat(_.forall(_.nonEmpty)),
      Gen.oneOf("s3", "s3a", "s3n"), Gen.oneOf("s3", "s3a", "s3n")) {
      (segs, regScheme, readScheme) =>
        val tail = segs.map(_.replace(" ", "")).filter(_.nonEmpty)
        val rel = if (tail.isEmpty) "d" else tail.mkString("/")
        GovernanceCatalog.registerLocation(s"$regScheme://bkt-alias/$rel",
          "aliaspropdb", "t")
        // any aliased scheme, any authority case: same storage, governed
        GovernanceCatalog.tableForLocation(s"$readScheme://BKT-ALIAS/$rel")
          .contains(("aliaspropdb", "t"))
    })
  }

  test("analyst rows are a subset of admin rows (on allowlist columns)") {
    val cols = GovernanceCatalog.analystApacFilter.allowedColumns
    val admin = Governance.secureRead(spark, DataAdmin)
      .select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq).toSet
    val analyst = Governance.secureRead(spark, Analyst)
      .collect().map(_.toSeq).toSet
    assert(analyst.subsetOf(admin))
    assert(analyst.nonEmpty)
  }

  test("no analyst-visible column is PII-tagged") {
    val visible = GovernanceCatalog.visibleColumns(Analyst, "sales_db", "sales",
      graft.sales.SalesFixture.schema.fieldNames.toSeq)
    assert(GovernanceCatalog.piiColumns.forall(c => !visible.contains(c)))
  }
}
