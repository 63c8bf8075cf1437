package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Schemas
import graft.operators.LatestSnapshot
import graft.sources.Sources

/**
 * SURVEY §2 operator inventory expressed over the driver's star-schema
 * testdata, one query per operator family, each with a DuckDB oracle
 * (SparkEntry.oracleSql). Design rules that make the oracle hash-compare
 * deterministic:
 *
 *  - Double sums are order-dependent; every SUM/AVG over a double column
 *    goes through DECIMAL(18,2) (exact, order-independent) and is cast back
 *    to DOUBLE at the end — identical bits in Spark and DuckDB.
 *  - Every query ends in a total ORDER BY on a unique key set; top-K queries
 *    carry a unique tiebreak column.
 *  - Untouched double columns pass through bit-identical; no rounding of
 *    computed doubles unless both engines round identically.
 */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String) =
    if (name == "events") Sources.events(s, dir)
    else Sources.table(s, dir, name)

  /** Exact order-independent sum of a 2-dp double column, returned as
    * DOUBLE: sum(cast(x as decimal(18,2))) then cast back. */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast(DecimalType(18, 2))).cast(DoubleType)

  // ── Grouped aggregation (SURVEY §2.5 note: exposed capability) ─────────

  /** q01: TPC-H-Q1-shaped grouped aggregation over lineitem. */
  def q01Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("sum_base_price"),
        (dsum("l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ── W1+W2: latest snapshot per key (reference window dedup) ────────────

  /** q02: latest event per user — the reference's row_number()=1 dedup
    * (3-spark_curated_analytics_full.py:67-74) on the events table, with a
    * deterministic event_id tiebreak. */
  def q02LatestEvent(s: SparkSession, dir: String): DataFrame =
    LatestSnapshot(t(s, dir, "events"), Seq("user_id"), col("ts"),
        tiebreak = Seq(col("event_id")))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts"))
      .orderBy(col("user_id"))

  val q02Sql: String =
    """SELECT user_id, event_id, event_type, value, ts FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ── O2/O3/O4: top-K desc, top-K asc, positional union ──────────────────

  private def movers(s: SparkSession, dir: String,
                     descending: Boolean): DataFrame = {
    val ev = t(s, dir, "events").filter(col("value").isNotNull)
    val ordered =
      if (descending) ev.orderBy(col("value").desc, col("event_id").asc)
      else ev.orderBy(col("value").asc, col("event_id").asc)
    ordered.limit(10)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
  }

  /** q03: top-10 by value desc → Catalyst `TakeOrderedAndProject` (no global
    * sort; per-partition heap + driver merge). */
  def q03TopDesc(s: SparkSession, dir: String): DataFrame =
    movers(s, dir, descending = true).orderBy(col("event_id"))

  val q03Sql: String =
    """SELECT event_id, user_id, event_type, value FROM (
      |  SELECT event_id, user_id, event_type, value FROM events
      |  WHERE value IS NOT NULL
      |  ORDER BY value DESC, event_id ASC LIMIT 10) t
      |ORDER BY event_id""".stripMargin

  /** q04: top-10 ascending (the reference's losers-from-history quirk O3). */
  def q04TopAsc(s: SparkSession, dir: String): DataFrame =
    movers(s, dir, descending = false).orderBy(col("event_id"))

  val q04Sql: String =
    """SELECT event_id, user_id, event_type, value FROM (
      |  SELECT event_id, user_id, event_type, value FROM events
      |  WHERE value IS NOT NULL
      |  ORDER BY value ASC, event_id ASC LIMIT 10) t
      |ORDER BY event_id""".stripMargin

  /** q05: gainers ∪ losers with movement labels — positional unionAll +
    * lit flag columns (O4, P16). */
  def q05MoversUnion(s: SparkSession, dir: String): DataFrame =
    movers(s, dir, descending = true)
      .withColumn("tipo_movimento", lit(Schemas.Gainer))
      .union(movers(s, dir, descending = false)
        .withColumn("tipo_movimento", lit(Schemas.Loser)))
      .orderBy(col("tipo_movimento"), col("event_id"))

  val q05Sql: String =
    """SELECT * FROM (
      |  SELECT event_id, user_id, event_type, value, 'Ganhador' AS tipo_movimento
      |  FROM (SELECT * FROM events WHERE value IS NOT NULL
      |        ORDER BY value DESC, event_id ASC LIMIT 10) g
      |  UNION ALL
      |  SELECT event_id, user_id, event_type, value, 'Perdedor' AS tipo_movimento
      |  FROM (SELECT * FROM events WHERE value IS NOT NULL
      |        ORDER BY value ASC, event_id ASC LIMIT 10) p) t
      |ORDER BY tipo_movimento, event_id""".stripMargin

  // ── O1/O5: global sort ─────────────────────────────────────────────────

  /** q06: full global sort (range-partition exchange + local sort). */
  def q06GlobalSort(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

  val q06Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC""".stripMargin

  // ── A1/A2: global scalar aggregation ───────────────────────────────────

  /** q07: ungrouped scalar aggregate (total order value + count). */
  def q07ScalarAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg(
      dsum("o_totalprice").as("total_price"),
      count(lit(1)).as("n_orders"))

  val q07Sql: String =
    """SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  COUNT(*) AS n_orders FROM orders""".stripMargin

  /** q08: percent-of-total (market-dominance shape): the scalar total is
    * collected to the driver and re-injected as a literal — the reference's
    * observable collect() round-trip (3-spark…py:204-209), guard included. */
  def q08PercentOfTotal(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val total = Option(cust.agg(dsum("c_acctbal"))
      .head.getAs[java.lang.Double](0)).map(_.doubleValue())
    require(total.exists(_ != 0), "total acctbal null/zero — analysis skipped")
    cust.filter(col("c_acctbal").isNotNull)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        (col("c_acctbal") / lit(total.get) * 100).as("percent_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val q08Sql: String =
    """SELECT c_custkey, c_name, c_acctbal,
      |  c_acctbal / (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |               FROM customer) * 100 AS percent_acctbal
      |FROM customer WHERE c_acctbal IS NOT NULL ORDER BY c_custkey""".stripMargin

  // ── P15/P16: nested CASE / conditional labels ──────────────────────────

  /** q09: 3-way nested CASE (supply-dynamics shape, exact UTF-8 labels). */
  def q09CaseWhen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("status_conta",
        when(col("c_acctbal").isNull, lit(Schemas.StatusUndefined))
          .otherwise(when(col("c_acctbal") >= 5000, lit(Schemas.StatusNearLimit))
            .otherwise(lit(Schemas.StatusAvailable))))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("status_conta"))
      .orderBy(col("c_custkey"))

  val q09Sql: String =
    """SELECT c_custkey, c_name, c_acctbal,
      |  CASE WHEN c_acctbal IS NULL THEN 'Não Definido'
      |       ELSE CASE WHEN c_acctbal >= 5000 THEN 'Próximo do Limite'
      |                 ELSE 'Disponível' END END AS status_conta
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ── J1 + A3: dashboard-shaped multi-way LEFT JOIN + scalar subquery ────

  private val q10Text =
    """SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate,
      |  c.c_name, n.n_name, r.r_name
      |FROM orders o
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE o.o_orderdate = (SELECT MAX(o_orderdate) FROM orders)
      |ORDER BY o.o_orderkey""".stripMargin

  /** q10: the dashboard master shape (5-sql_exportacao…sql): 3-way LEFT
    * JOIN + uncorrelated MAX scalar subquery, run through spark.sql so the
    * SQL entry path is exercised. Dimensions broadcast automatically. */
  def q10DashboardJoin(s: SparkSession, dir: String): DataFrame = {
    Seq("orders", "customer", "nation", "region")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(q10Text)
  }

  val q10Sql: String = q10Text

  // ── G1: explode (generator surface) ────────────────────────────────────

  /** q11: explode(split) — the reference's entire UDTF surface (G1) over
    * the documents table. */
  def q11ExplodeWords(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .orderBy(col("doc_id"), col("word"))

  val q11Sql: String =
    """SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |FROM documents ORDER BY doc_id, word""".stripMargin

  // ── P7/P8: null-check + conjunctive predicates ─────────────────────────

  /** q12: conjunctive predicate filter (pushed to the parquet scan). */
  def q12Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("value").isNotNull && col("value") > 100 &&
        col("event_type").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  val q12Sql: String =
    """SELECT event_id, user_id, event_type, value FROM events
      |WHERE value IS NOT NULL AND value > 100 AND event_type IS NOT NULL
      |ORDER BY event_id""".stripMargin

  // ── A4: count action ───────────────────────────────────────────────────

  def q13Count(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))

  val q13Sql: String = "SELECT COUNT(*) AS n_rows FROM lineitem"

  // ── Distinct aggregation ───────────────────────────────────────────────

  /** q14: grouped count-distinct (two-phase expand aggregate). */
  def q14GroupDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  val q14Sql: String =
    """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ── Semi / anti joins (EXISTS / NOT EXISTS) ────────────────────────────

  /** q15: customers with ≥1 order — left_semi (EXISTS). */
  def q15Semi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  val q15Sql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** q16: customers with no orders — left_anti (NOT EXISTS). */
  def q16Anti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  val q16Sql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ── P4/P5: epoch-ms → formatted string → timestamp two-step ────────────

  /** q17: the reference's exact two-step timestamp derivation: epoch-ms /
    * 1000 through from_unixtime → 'yyyy-MM-dd HH:mm:ss' STRING, then cast
    * to timestamp (P5 then P4 — NOT timestamp_millis; second-truncation
    * must match the reference). */
  def q17FromUnixtime(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("epoch_ms", unix_millis(col("ts")))
      .withColumn("data_referencia", from_unixtime(col("epoch_ms") / 1000))
      .withColumn("data_referencia_dt", col("data_referencia").cast("timestamp"))
      .select(col("event_id"), col("epoch_ms"), col("data_referencia"),
        col("data_referencia_dt"))
      .orderBy(col("event_id"))

  val q17Sql: String =
    """SELECT event_id, epoch_ms(ts) AS epoch_ms,
      |  strftime(to_timestamp(epoch_ms(ts) // 1000), '%Y-%m-%d %H:%M:%S') AS data_referencia,
      |  CAST(strftime(to_timestamp(epoch_ms(ts) // 1000), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)
      |    AS data_referencia_dt
      |FROM events ORDER BY event_id""".stripMargin
}
