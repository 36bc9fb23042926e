package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.governance.{Analyst, DataAdmin, Governance}
import graft.sales.SalesFixture

/** Tier A — the queries the reference itself ships (SURVEY.md §2).
  *
  * All run on the 20-row `sales` fixture (the reference's only data), so the
  * `sfDir` argument is unused; the DuckDB oracles are self-contained via a
  * `VALUES` CTE. Every query carries a total ORDER BY on a unique key
  * (customer_id / sales_region) per the determinism checklist (SURVEY §7.5).
  */
object TierA {

  private val cte = SalesFixture.valuesCte

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A1 — SELECT * ORDER BY region, customer LIMIT 10 (outputs.tf:60-65)
    "q_scan_project_all" -> ((s, _) =>
      Governance.secureRead(s, DataAdmin)
        .orderBy(col("sales_region"), col("customer_id"))
        .limit(10)),

    // A2 — count by region (outputs.tf:67-73)
    "q_count_by_region" -> ((s, _) =>
      Governance.secureRead(s, DataAdmin)
        .groupBy(col("sales_region"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("sales_region"))),

    // A3 — row-level security: analyst row filter (main.tf:451-453)
    "q_rls_filter" -> ((s, _) =>
      Governance.secureRead(s, Analyst)
        .orderBy(col("customer_id"))),

    // A4 — column-level security: allowlist projection (main.tf:442-448)
    "q_cls_project" -> ((s, _) =>
      Governance.secureRead(s, DataAdmin)
        .select("customer_id", "customer_name", "sales_region",
          "sales_amount", "sale_date")
        .orderBy(col("customer_id"))),

    // A5 — email mask (outputs.tf:48)
    "q_mask_email" -> ((s, _) =>
      Governance.secureRead(s, DataAdmin)
        .select(col("customer_id"),
          Governance.maskEmail(col("customer_email")).as("customer_email"))
        .orderBy(col("customer_id"))),

    // A6 — ssn mask (outputs.tf:49)
    "q_mask_ssn" -> ((s, _) =>
      Governance.secureRead(s, DataAdmin)
        .select(col("customer_id"),
          Governance.maskSsn(col("ssn")).as("ssn"))
        .orderBy(col("customer_id"))),

    // A7 — the sales_masked view body (outputs.tf:44-53)
    "q_masked_view" -> ((s, _) =>
      Governance.maskedViewFor(s, DataAdmin)
        .orderBy(col("customer_id"))),

    // A7b — the SAME masked view derived from pii/mask column METADATA
    // (tag-driven auto-masking, SURVEY §1.3) instead of the hand-written
    // body; checked against the identical oracle as q_masked_view, so the
    // metadata-derived projection provably reproduces the reference DDL.
    "q_auto_masked_view" -> ((s, _) =>
      Governance.autoMaskedView(Governance.secureRead(s, DataAdmin))
        .orderBy(col("customer_id"))),

    // A8 — analyst through the masked view: masks AND row filter compose
    // (validate.sh:223-225)
    "q_analyst_masked_view" -> ((s, _) =>
      Governance.maskedViewFor(s, Analyst)
        .select("customer_id", "customer_email", "ssn", "sales_region")
        .orderBy(col("customer_id"))),

    // A9 — top-k: ORDER BY + LIMIT (outputs.tf:64,79,86)
    "q_limit" -> ((s, _) =>
      Governance.secureRead(s, DataAdmin)
        .select("customer_id", "customer_name", "sales_amount")
        .orderBy(col("customer_id"))
        .limit(5)),

    // A10 — explicit projection (validate.sh:208)
    "q_project_cols" -> ((s, _) =>
      Governance.secureRead(s, DataAdmin)
        .select("customer_id", "customer_email", "ssn", "sales_region")
        .orderBy(col("customer_id"))),

    // A15 — DataAdmin sees all 20 rows incl. raw PII (validate.sh:207-209)
    "q_admin_pii" -> ((s, _) =>
      Governance.secureRead(s, DataAdmin)
        .orderBy(col("customer_id"))),

    // A16 — analyst count-by-region: filter applies BEFORE aggregation →
    // only (APAC, 9) (validate.sh:214-216, README.md:249)
    "q_analyst_counts" -> ((s, _) =>
      Governance.secureRead(s, Analyst)
        .groupBy(col("sales_region"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("sales_region"))),

    // A13/M6 — RAW SQL against the catalog table as Analyst: the
    // SparkSessionExtensions governance rule rewrites the relation at plan
    // time, so even un-wrapped spark.sql traffic is row-filtered and
    // column-allowlisted (the semantics LF enforces for every Athena
    // query, main.tf:432-487).
    "q_sql_governed" -> ((s, _) => {
      SalesFixture.ensureRegistered(s)
      Governance.withPrincipal(s, Analyst)(
        s.sql(s"SELECT * FROM ${SalesFixture.dbName}.${SalesFixture.tableName}" +
          " ORDER BY customer_id"))
    }),

    // A7/A13 — RAW SQL against the CREATE VIEW sales_masked catalog object
    // as Analyst: masks from the view body compose with the row filter the
    // rule injects beneath the view (validate.sh:223-225).
    "q_sql_view_analyst" -> ((s, _) => {
      SalesFixture.ensureRegistered(s)
      Governance.withPrincipal(s, Analyst)(
        s.sql(s"SELECT * FROM ${SalesFixture.dbName}.${SalesFixture.viewName}" +
          " ORDER BY customer_id"))
    }),

    // A12 — CSV result sink: query results land as one headered CSV per
    // query (main.tf:504-510, validate.sh:160-163), then round-trip back
    // with an explicit schema (CSV carries no types).
    "q_csv_sink" -> ((s, _) => {
      import org.apache.spark.sql.types._
      val out = Governance.secureRead(s, DataAdmin)
        .groupBy(col("sales_region"))
        .agg(count(lit(1)).as("cnt"))
      val path = new java.io.File(
        "target/graft-data/csv/q_count_by_region").getAbsolutePath
      graft.sources.Sinks.writeCsv(out, path)
      graft.sources.Sinks.readCsv(s, path, StructType(Seq(
          StructField("sales_region", StringType),
          StructField("cnt", LongType))))
        .orderBy(col("sales_region"))
    })
  )

  private val allowedCols =
    "customer_id, customer_name, sales_region, sales_amount, sale_date"

  val oracles: Map[String, String] = Map(
    "q_scan_project_all" -> (cte +
      "SELECT * FROM sales ORDER BY sales_region, customer_id LIMIT 10"),
    "q_count_by_region" -> (cte +
      "SELECT sales_region, COUNT(*) AS cnt FROM sales " +
      "GROUP BY sales_region ORDER BY sales_region"),
    "q_rls_filter" -> (cte +
      s"SELECT $allowedCols FROM sales " +
      "WHERE sales_region = 'APAC' ORDER BY customer_id"),
    "q_cls_project" -> (cte +
      s"SELECT $allowedCols FROM sales ORDER BY customer_id"),
    "q_mask_email" -> (cte +
      "SELECT customer_id, regexp_replace(customer_email, " +
      "'^([^@]{1,3}).*@', '***@') AS customer_email FROM sales " +
      "ORDER BY customer_id"),
    "q_mask_ssn" -> (cte +
      "SELECT customer_id, regexp_replace(ssn, '\\d', '*', 'g') AS ssn " +
      "FROM sales ORDER BY customer_id"),
    "q_masked_view" -> (cte + Governance.maskedViewOracleSelect +
      " ORDER BY customer_id"),
    "q_auto_masked_view" -> (cte + Governance.maskedViewOracleSelect +
      " ORDER BY customer_id"),
    "q_analyst_masked_view" -> (cte +
      "SELECT customer_id, regexp_replace(customer_email, " +
      "'^([^@]{1,3}).*@', '***@') AS customer_email, " +
      "regexp_replace(ssn, '\\d', '*', 'g') AS ssn, sales_region " +
      "FROM sales WHERE sales_region = 'APAC' ORDER BY customer_id"),
    "q_limit" -> (cte +
      "SELECT customer_id, customer_name, sales_amount FROM sales " +
      "ORDER BY customer_id LIMIT 5"),
    "q_project_cols" -> (cte +
      "SELECT customer_id, customer_email, ssn, sales_region FROM sales " +
      "ORDER BY customer_id"),
    "q_admin_pii" -> (cte +
      "SELECT * FROM sales ORDER BY customer_id"),
    "q_analyst_counts" -> (cte +
      "SELECT sales_region, COUNT(*) AS cnt FROM sales " +
      "WHERE sales_region = 'APAC' " +
      "GROUP BY sales_region ORDER BY sales_region"),
    "q_sql_governed" -> (cte +
      s"SELECT $allowedCols FROM sales " +
      "WHERE sales_region = 'APAC' ORDER BY customer_id"),
    "q_sql_view_analyst" -> (cte +
      "SELECT customer_id, customer_name, " +
      "regexp_replace(customer_email, '^([^@]{1,3}).*@', '***@') " +
      "AS customer_email, regexp_replace(ssn, '\\d', '*', 'g') AS ssn, " +
      "sales_region, sales_amount, sale_date FROM sales " +
      "WHERE sales_region = 'APAC' ORDER BY customer_id"),
    "q_csv_sink" -> (cte +
      "SELECT sales_region, COUNT(*) AS cnt FROM sales " +
      "GROUP BY sales_region ORDER BY sales_region")
  )
}
