package graft.governance

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sales.SalesFixture

/** Lake-Formation-style governance, Spark-native.
  *
  * The reference attaches security metadata to catalog objects, not data:
  * an LF-Tag `pii=sensitive` on two columns (reference `main.tf:382-429`),
  * a data-cells filter combining a row predicate with a column allowlist
  * (`main.tf:432-457`), and per-principal grants (`main.tf:460-487`).
  * Athena consults Lake Formation at plan time and injects the filter into
  * the plan. Here the same semantics are plain relational algebra: wrap the
  * governed relation in `Project(allowedCols, Filter(rowPredicate, rel))`
  * before handing it to the caller — Catalyst then pushes both into the
  * parquet scan, which is exactly what LF+Athena achieve operationally.
  */
sealed trait Principal { def name: String }

/** Full access, including raw PII (reference `main.tf:460-470`). */
case object DataAdmin extends Principal { val name = "DataAdmin" }

/** SELECT only through the data-cells filter (reference `main.tf:473-487`). */
case object Analyst extends Principal { val name = "Analyst" }

/** The principal of a session that never set `spark.graft.principal`.
  * Default-DENY on every governed table (zero rows, PII columns
  * unresolvable) — the reference's posture, where access exists only via
  * an explicitly assumed IAM role (reference `main.tf:115-284`); an
  * unconfigured session there holds no credentials at all.
  */
case object Anonymous extends Principal { val name = "Anonymous" }

object Principal {
  def fromName(s: String): Principal = s match {
    case DataAdmin.name => DataAdmin
    case Analyst.name   => Analyst
    case Anonymous.name => Anonymous
    case other => throw new IllegalArgumentException(s"unknown principal $other")
  }
}

/** Row predicate + column allowlist attached to (principal, table) —
  * reference `main.tf:432-457` (`analyst-apac-filter`).
  */
final case class DataCellsFilter(
    name: String,
    table: String,
    rowFilterSql: String,
    allowedColumns: Seq[String])

/** In-memory governance catalog seeded with the reference's configuration
  * (`locals.tf:16-20`, `main.tf:432-487`). Table-level tag→column map plus
  * per-principal data-cells filters.
  */
object GovernanceCatalog {

  /** Columns tagged `pii=sensitive` (reference `main.tf:393-429`). */
  val piiColumns: Seq[String] = Seq("customer_email", "ssn")

  /** The analyst's data-cells filter (reference `main.tf:432-457`). */
  val analystApacFilter: DataCellsFilter = DataCellsFilter(
    name = "analyst-apac-filter",
    table = SalesFixture.tableName,
    rowFilterSql = "sales_region = 'APAC'",
    allowedColumns = Seq("customer_id", "customer_name", "sales_region",
      "sales_amount", "sale_date"))

  /** Registry of data-cells filters keyed by (principal name, database,
    * table) — the Spark analog of Lake Formation's grant store. Seeded
    * with the reference's single grant; additional governed tables
    * register here and the plan-time rule picks them up with no further
    * wiring. Keying on the full (db, table) identifier means a same-named
    * table in another database is neither governed by this grant nor
    * broken by its row predicate.
    */
  @volatile private var registry
      : Map[(String, String, String), DataCellsFilter] =
    Map((Analyst.name, SalesFixture.dbName, SalesFixture.tableName) ->
      analystApacFilter)

  /** Storage locations backing governed tables, mapped to their (db,
    * table) identity — the Spark analog of the reference's S3
    * public-access block + bucket policy (`main.tf:32-49`): without it,
    * `spark.read.parquet(<governed location>)` would hand back raw PII
    * with no governance, because the plan-time rule would only recognize
    * catalog-backed relations. Keys are normalized filesystem paths; a
    * read of the directory OR any file under it matches.
    */
  @volatile private var locations: Map[String, (String, String)] = Map.empty

  /** Register the storage path backing governed table `db.table`. */
  def registerLocation(path: String, database: String,
      table: String): Unit =
    synchronized {
      locations = locations + (normalize(path) -> ((database, table)))
    }

  /** Governed-table identity for a file-source path, if the path is (or
    * is under) a registered governed location.
    */
  def tableForLocation(path: String): Option[(String, String)] = {
    val p = normalize(path)
    locations.collectFirst {
      case (loc, ident) if p == loc || p.startsWith(loc + "/") => ident
    }
  }

  /** Normalized location key: `scheme://authority/path` with dot-segments
    * collapsed. Scheme and authority are KEPT — keying on the path alone
    * would make `s3://bucketA/data` and `s3://bucketB/data` collide (the
    * second registration silently un-governs the first bucket, and reads
    * of same-keyed paths on unrelated buckets get false-positive denies).
    * `URI.normalize()` collapses `..`, closing the
    * `<loc>/sibling/../<dir>` dodge of the prefix match. A scheme-less
    * java.io absolute path and hadoop's `file:/...` form normalize to the
    * same key (scheme-less ≡ `file`, empty authority), which is how
    * registration-by-local-path meets `HadoopFsRelation` root URIs.
    *
    * Both sides of the registry must land on the SAME key even though they
    * arrive in different representations: the read side passes Hadoop
    * `Path.toUri` strings (percent-ENCODED, always URI-legal), while
    * registration passes raw user strings that may contain URI-illegal
    * chars (spaces). An encoded URI parses directly and `getPath` DECODES
    * it; a raw string that fails to parse is re-read as unencoded — quoted
    * through the multi-argument URI constructor (scheme-ful) or
    * `File.toURI` (scheme-less) — so its decoded path equals the raw
    * input. Keying such paths on the raw string (the old fallback) made
    * registration and read keys diverge: the location was silently
    * un-governed.
    *
    * Scheme and authority compare case-insensitively (hostnames are), and
    * Hadoop filesystem-scheme ALIASES for the same storage canonicalize
    * together (`s3a`/`s3n` → `s3`) — otherwise a location registered as
    * `s3://bucket/data` would not govern the identical bytes read via
    * `s3a://bucket/data`.
    *
    * Known ambiguity: a registered path containing a LITERAL percent
    * sequence (a directory named `my%20dir`) parses as an encoded URI
    * and keys on the decoded form, while the read side double-encodes
    * and keys on the literal — such locations must be registered in
    * their Hadoop-encoded form. Inherent to accepting both raw and
    * encoded inputs on one API; percent-named directories are the
    * pathological case.
    */
  private val rawSchemeUri = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(/.*)?$".r

  private def parseUri(path: String): java.net.URI =
    try new java.net.URI(path)
    catch {
      case _: java.net.URISyntaxException => path match {
        case rawSchemeUri(scheme, auth, p) =>
          new java.net.URI(scheme, if (auth.isEmpty) null else auth,
            Option(p).getOrElse("/"), null)
        case _ => new java.io.File(path).toURI
      }
    }

  private def canonicalScheme(scheme: String): String = scheme match {
    case "s3a" | "s3n" => "s3"
    case other         => other
  }

  private def normalize(path: String): String = {
    val u = parseUri(path).normalize()
    if (u.getPath == null || u.getPath.isEmpty)
      path.replaceAll("/+$", "")
    else {
      val scheme = canonicalScheme(Option(u.getScheme).getOrElse("file")
        .toLowerCase(java.util.Locale.ROOT))
      val auth = Option(u.getAuthority).getOrElse("")
        .toLowerCase(java.util.Locale.ROOT)
      s"$scheme://$auth${u.getPath.replaceAll("/+$", "")}"
    }
  }

  /** Views registered as MASKED VIEWS over governed tables (seeded with
    * the reference's `sales_masked`, `outputs.tf:41-55`): the plan-time
    * rule injects only the ROW filter beneath them — their body already
    * masks the PII columns — while direct table references also get the
    * column allowlist.
    */
  @volatile private var maskedViews: Set[(String, String)] =
    Set((SalesFixture.dbName, SalesFixture.viewName))

  /** Register `db.view` as a masked view over a governed table. */
  def registerMaskedView(database: String, view: String): Unit =
    synchronized { maskedViews = maskedViews + ((database, view)) }

  def isMaskedView(database: String, view: String): Boolean =
    maskedViews.contains((database, view))

  /** True when `db.table` carries ANY governance metadata: a data-cells
    * filter registered for some principal, or a registered storage
    * location mapping to it. The plan-time rule uses this to decide
    * whether a full-access principal's read should carry the governed
    * audit mark — an ungoverned catalog table must NOT be marked, or the
    * audit trail stops distinguishing governed access from plain reads.
    */
  def isGoverned(database: String, table: String): Boolean =
    registry.keysIterator.exists {
      case (_, db, t) => db == database && t == table
    } || locations.valuesIterator.contains((database, table))

  /** Some governed table living in `database`, if any — the write
    * check's reason to refuse dropping the database itself.
    */
  def governedTableInDb(database: String): Option[(String, String)] =
    registry.keysIterator.collectFirst {
      case (_, db, t) if db == database => (db, t)
    }.orElse(locations.valuesIterator.find(_._1 == database))

  /** Register (or replace) a data-cells filter for principal+db+table. */
  def register(principal: Principal, database: String,
      filter: DataCellsFilter): Unit =
    synchronized {
      registry =
        registry + ((principal.name, database, filter.table) -> filter)
    }

  /** Data-cells filter applying to `principal` reading `db.table`, if
    * any. DataAdmin has ALL on every table (no filter); a principal with
    * a registered cells filter reads through it; every OTHER principal —
    * including [[Anonymous]], the unset-conf default — is DENIED on
    * governed tables (zero rows, PII columns unresolvable). Default-deny
    * is the reference's posture: a grant must exist, or there is no
    * access (`main.tf:115-284`). Tables with no registered filter at all
    * are not governed and stay open.
    */
  def filterFor(principal: Principal, database: String,
      table: String): Option[DataCellsFilter] =
    principal match {
      case DataAdmin => None
      case _ =>
        registry.get((principal.name, database, table))
          .orElse(denyFilter(database, table))
    }

  /** Deny-all cells filter for a governed table: zero rows, and the most
    * restrictive registered allowlist (so no PII column ever resolves).
    * A table governed ONLY by a registered storage location (no cells
    * filter anywhere) is still governed — deny with an EMPTY allowlist,
    * since nothing was ever granted to anyone; without this branch any
    * principal, including Anonymous, would fall through to full access on
    * location-registered tables. None when the table carries no
    * governance metadata at all.
    */
  private def denyFilter(database: String,
      table: String): Option[DataCellsFilter] = {
    val registered = registry.collect {
      case ((_, db, t), f) if db == database && t == table => f
    }
    if (registered.nonEmpty) {
      val tightest = registered.minBy(f => (f.allowedColumns.size, f.name))
      Some(DataCellsFilter("default-deny", table, "false",
        tightest.allowedColumns))
    } else if (locations.valuesIterator.contains((database, table))) {
      Some(DataCellsFilter("default-deny", table, "false", Seq.empty))
    } else None
  }

  /** Columns of `schemaCols` visible to `principal` on `db.table`. */
  def visibleColumns(principal: Principal, database: String, table: String,
      schemaCols: Seq[String]): Seq[String] =
    filterFor(principal, database, table) match {
      case Some(f) => schemaCols.filter(f.allowedColumns.contains)
      case None    => schemaCols
    }
}

object Governance {

  /** Email mask from the reference's view DDL (`outputs.tf:48`):
    * `REGEXP_REPLACE(customer_email, '^([^@]{1,3}).*@', '***@')`.
    */
  def maskEmail(c: Column): Column =
    regexp_replace(c, "^([^@]{1,3}).*@", "***@")

  /** SSN mask (`outputs.tf:49`): every digit → `*`. */
  def maskSsn(c: Column): Column = regexp_replace(c, "\\d", "*")

  // ---- tag-driven auto-masking (SURVEY §1.3) -----------------------------

  /** Mask registry keyed by the `mask` metadata kind. The `pii` tag on a
    * column decides WHAT is sensitive (the LF-Tag analog); this registry
    * decides HOW each kind is masked. A tagged field with no (or an
    * unregistered) kind falls back to full redaction — tagged data is
    * never silently passed through in clear.
    */
  val maskKinds: Map[String, Column => Column] = Map(
    "email" -> maskEmail,
    "digits" -> maskSsn)

  private val redact: Column => Column = _ => lit("***")

  /** Mask for a schema field: None when untagged. */
  def maskForField(f: org.apache.spark.sql.types.StructField)
      : Option[Column => Column] =
    if (!f.metadata.contains("pii")) None
    else Some(
      if (f.metadata.contains("mask"))
        maskKinds.getOrElse(f.metadata.getString("mask"), redact)
      else redact)

  /** Masked projection derived purely from `df`'s schema metadata — zero
    * per-table SQL. On the sales fixture this reproduces the reference's
    * hand-written `sales_masked` body exactly (oracle-proven by
    * `q_auto_masked_view` against the same oracle as `q_masked_view`).
    */
  def autoMaskedView(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      maskForField(f).map(m => m(col(f.name)).as(f.name))
        .getOrElse(col(f.name))
    }.toSeq: _*)

  /** Spark-SQL twins of [[maskKinds]], for generated view DDL. */
  private def maskSql(kind: Option[String], c: String): String = kind match {
    case Some("email")  => s"regexp_replace($c, '^([^@]{1,3}).*@', '***@')"
    case Some("digits") => s"regexp_replace($c, '\\\\d', '*')"
    case _              => "'***'"
  }

  /** Create + register a masked catalog view over any governed table,
    * with the body GENERATED from the table schema's `pii`/`mask`
    * metadata — no hand-written SQL per table. The view registers in the
    * masked-view registry, so the plan-time rule injects the principal's
    * row filter BENEATH it exactly like the reference's `sales_masked`.
    */
  def createAutoMaskedView(spark: SparkSession, database: String,
      table: String, view: String): Unit = {
    val schema = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table,
        Some(database))).schema
    val cols = schema.fields.map { f =>
      val q = s"`${f.name}`"
      if (!f.metadata.contains("pii")) q
      else {
        val kind =
          if (f.metadata.contains("mask"))
            Some(f.metadata.getString("mask"))
          else None
        s"${maskSql(kind, q)} AS $q"
      }
    }.mkString(", ")
    withPrincipal(spark, DataAdmin) {
      spark.sql(s"CREATE OR REPLACE VIEW $database.$view AS " +
        s"SELECT $cols FROM $database.$table")
    }
    GovernanceCatalog.registerMaskedView(database, view)
  }

  /** Run `f` with the session principal set to `p`, restoring the previous
    * principal afterwards. DataFrame construction inside the block analyzes
    * eagerly, so the governance rule sees the intended principal.
    */
  def withPrincipal[T](spark: SparkSession, p: Principal)(f: => T): T = {
    val key = GovernanceRule.PrincipalConf
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, p.name)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** True when the analyzed plan carries the governance-rule marker — i.e.
    * the plan-time rewrite actually fired for this DataFrame.
    */
  private def ruleApplied(df: DataFrame): Boolean =
    df.queryExecution.analyzed
      .find(_.getTagValue(GovernanceRule.GovernedTag).isDefined).isDefined

  /** Governed read of the sales table for `principal` — the Spark analog of
    * Athena calling `lakeformation:GetDataAccess` at plan time (reference
    * `main.tf:191-197`). Reads the CATALOG table (parquet-backed,
    * [[SalesFixture.ensureRegistered]]); enforcement is the
    * [[GovernanceRule]] plan rewrite, the same choke point raw
    * `spark.sql` traffic goes through. If the session was built without
    * `GraftExtensions`, falls back to wrapping the relation here, so this
    * API never returns ungoverned rows.
    */
  def secureRead(spark: SparkSession, principal: Principal): DataFrame = {
    SalesFixture.ensureRegistered(spark)
    val table = s"${SalesFixture.dbName}.${SalesFixture.tableName}"
    val df = withPrincipal(spark, principal)(spark.table(table))
    GovernanceCatalog.filterFor(principal, SalesFixture.dbName,
        SalesFixture.tableName) match {
      case None => df
      case Some(_) if ruleApplied(df) => df
      case Some(f) =>
        df.filter(expr(f.rowFilterSql))
          .select(f.allowedColumns.map(col): _*)
    }
  }

  /** The `sales_masked` view body (reference `outputs.tf:44-53`): all seven
    * columns, PII columns masked. Row-level security still applies beneath
    * the view for governed principals.
    */
  def maskedView(sales: DataFrame): DataFrame =
    sales.select(
      col("customer_id"),
      col("customer_name"),
      maskEmail(col("customer_email")).as("customer_email"),
      maskSsn(col("ssn")).as("ssn"),
      col("sales_region"),
      col("sales_amount"),
      col("sale_date"))

  /** Masked view as seen by `principal`: the CATALOG view `sales_masked`
    * (a real `CREATE VIEW`, reference `outputs.tf:41-55`) read under the
    * principal's session — [[GovernanceRule]] injects the row filter
    * BENEATH the view body (as Lake Formation does), so the analyst sees
    * masked PII *and* only APAC rows (`validate.sh:223-225`). Fallback for
    * extension-less sessions composes the filter over the view projection
    * (equivalent while no mask touches a filter column).
    */
  def maskedViewFor(spark: SparkSession, principal: Principal): DataFrame = {
    SalesFixture.ensureRegistered(spark)
    val view = s"${SalesFixture.dbName}.${SalesFixture.viewName}"
    val df = withPrincipal(spark, principal)(spark.table(view))
    GovernanceCatalog.filterFor(principal, SalesFixture.dbName,
        SalesFixture.tableName) match {
      case None => df
      case Some(_) if ruleApplied(df) => df
      case Some(f) => df.filter(expr(f.rowFilterSql))
    }
  }

  /** SQL text of the masked-view oracle body (shared with Tier A oracles).
    * DuckDB note: its `regexp_replace` is first-match-only by default, so
    * the SSN mask needs the `'g'` flag; Spark's is global. The email
    * pattern is anchored (single match) so the two dialects agree.
    */
  val maskedViewOracleSelect: String =
    """SELECT customer_id, customer_name,
      |  regexp_replace(customer_email, '^([^@]{1,3}).*@', '***@') AS customer_email,
      |  regexp_replace(ssn, '\d', '*', 'g') AS ssn,
      |  sales_region, sales_amount, sale_date
      |FROM sales""".stripMargin
}
