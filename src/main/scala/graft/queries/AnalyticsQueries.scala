package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classic analytic workloads (TPC-H-shaped) over the test corpus — the
  * headline bench queries that exercise scan-filter-join-aggregate plans at
  * their widest, plus a TF-IDF text-feature extension (SURVEY §7.5d).
  *
  * Float policy: monetary sums go through per-row decimal casts wide enough
  * for the product's exact decimal count (price×(1±x)×(1±y) has ≤6
  * decimals → DECIMAL(22,6)), then one cast back to double — exact,
  * order-insensitive, hash-stable against the DuckDB oracle.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  private def exactSum6(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(22, 6))).cast("double")
  import Tables.exactSum

  /** q28 — pricing summary report (TPC-H Q1 shape): single wide aggregate
    * over the fact table with a pushed date filter; partial+final agg, one
    * shuffle of 4 groups.
    */
  val q28_pricing_summary: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        exactSum6(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        (exactSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (exactSum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (exactSum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q28Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q29 — top unshipped orders by revenue (TPC-H Q3 shape): selective
    * dimension filter broadcast against the fact, grouped revenue, top-10
    * with deterministic tie-break.
    */
  val q29_top_orders: Q = (s, d) => {
    val cutoff = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q29Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q30 — regional supplier revenue (TPC-H Q5 shape): the widest join tree
    * in the suite (6 tables); small dims broadcast, the supplier-customer
    * co-nation constraint rides the join condition.
    */
  val q30_region_revenue: Q = (s, d) => {
    val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val l = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup),
        l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q30Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** q31 — TF-IDF top-3 terms per document (SURVEY §7.5d): explode → tf →
    * df → idf join → windowed top-k. All shuffles key on doc or term; the
    * corpus-size scalar is a broadcast cross join.
    */
  val q31_tfidf: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.TextAnalysis.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("nn"))
    val scored = tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("nn").cast("double") / col("df")), 6).as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= 3)
      .orderBy("doc_id", "rk")
  }

  val q31Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS nn FROM documents)
      |SELECT doc_id, term, score, rk FROM (
      |  SELECT doc_id, term, score,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, term) AS INTEGER) AS rk
      |  FROM (
      |    SELECT tf.doc_id, tf.term,
      |      round(tf.tf * ln(CAST(n.nn AS DOUBLE) / df.df), 6) AS score
      |    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n) t1) t2
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  val queries: Map[String, Q] = Map(
    "q28_pricing_summary" -> q28_pricing_summary,
    "q29_top_orders" -> q29_top_orders,
    "q30_region_revenue" -> q30_region_revenue,
    "q31_tfidf" -> q31_tfidf)

  val oracleSql: Map[String, String] = Map(
    "q28_pricing_summary" -> q28Sql,
    "q29_top_orders" -> q29Sql,
    "q30_region_revenue" -> q30Sql,
    "q31_tfidf" -> q31Sql)
}
