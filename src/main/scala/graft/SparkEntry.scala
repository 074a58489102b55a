package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.FinancialFunctions

/** Driver contract — the correctness surface of the engine.
  *
  * Every entry in [[queries]] has a DuckDB-oracle twin in [[oracleSql]]
  * (same column names, same row set, bit-identical values where floating
  * point is involved — the indicator recurrences replicate the reference's
  * FP operation order, see [[graft.functions.IndicatorMath]]).
  *
  * Scale notes (the sf0.01 gate runs local; the design targets 100 TB):
  *  - indicator queries shuffle once on the window partition key and sort
  *    within partitions — the canonical Spark window plan;
  *  - joins to small dimensions are broadcast;
  *  - aggregations are partial (map-side combine) before the exchange;
  *  - filters/projections sit directly on the parquet scan so pushdown and
  *    column pruning reach the file source.
  */
object SparkEntry {

  /** Register every testdata table as a temp view for SQL queries. */
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  private def load(spark: SparkSession, dir: String): Unit = {
    FinancialFunctions.registerAll(spark)
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
  }

  private def q(spark: SparkSession, dir: String, sql: String): DataFrame = {
    load(spark, dir); spark.sql(sql)
  }

  // Shared window spec: partition by supplier, total order within partition.
  private val W =
    "PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber"
  private val duckW =
    s"($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"

  /** DuckDB sequential-fold EMA over a prefix list — bit-identical to the
    * Ema expression's update order. */
  // NB: literals must be ::DOUBLE — DuckDB otherwise does DECIMAL division,
  // which is not the IEEE quotient Spark computes.
  private def duckEma(list: String, n: Int): String =
    s"list_reduce($list, (acc,x) -> (2.0::DOUBLE/${n + 1}.0::DOUBLE)*x + (1.0::DOUBLE - 2.0::DOUBLE/${n + 1}.0::DOUBLE)*acc)"

  /** The struct accumulator for the prefix list `(p,g,l,c)` — p is the raw
    * value column wrapped per row. */
  private def rsiStructList(valueCol: String): String =
    s"list(struct_pack(p := $valueCol, g := 0.0::DOUBLE, l := 0.0::DOUBLE, c := 0.0::DOUBLE)) OVER w"

  /** DuckDB sequential RSI fold replicating Rsi's update order (seed =
    * simple mean of first n gains/losses, then Wilder
    * avg' = avg*(1-1/n) + g*(1/n)). */
  private def rsiFold(listExpr: String, n: Int): String = {
    val nd = s"$n.0::DOUBLE"
    s"""list_reduce($listExpr, (acc, e) -> CASE
       |      WHEN acc.c + 1.0 < $nd THEN struct_pack(p := e.p, g := acc.g + greatest(e.p - acc.p, 0.0::DOUBLE), l := acc.l + greatest(acc.p - e.p, 0.0::DOUBLE), c := acc.c + 1.0)
       |      WHEN acc.c + 1.0 = $nd THEN struct_pack(p := e.p, g := (acc.g + greatest(e.p - acc.p, 0.0::DOUBLE))/$nd, l := (acc.l + greatest(acc.p - e.p, 0.0::DOUBLE))/$nd, c := acc.c + 1.0)
       |      ELSE struct_pack(p := e.p, g := acc.g*(1.0::DOUBLE - 1.0::DOUBLE/$nd) + greatest(e.p - acc.p, 0.0::DOUBLE)*(1.0::DOUBLE/$nd), l := acc.l*(1.0::DOUBLE - 1.0::DOUBLE/$nd) + greatest(acc.p - e.p, 0.0::DOUBLE)*(1.0::DOUBLE/$nd), c := acc.c + 1.0)
       |    END)""".stripMargin
  }

  private def rsiEval(s: String, n: Int): String =
    s"CASE WHEN $s.c >= $n.0::DOUBLE THEN CASE WHEN $s.l = 0.0 THEN 100.0::DOUBLE ELSE 100.0 - (100.0 / (1.0 + $s.g/$s.l)) END END"

  private def duckRsiSql(table: String, valueCol: String, n: Int,
                         keyCols: String, extraFirst: String = "",
                         extraRest: String = ""): String = {
    s"""WITH base AS (
       |  SELECT $keyCols$extraFirst,
       |    ${rsiStructList(valueCol)} AS xs
       |  FROM $table
       |  WINDOW w AS $duckW
       |), red AS (
       |  SELECT $keyCols$extraRest, ${rsiFold("xs", n)} AS s
       |  FROM base
       |)
       |SELECT $keyCols$extraRest, ${rsiEval("s", n)} AS rsi_$n
       |FROM red""".stripMargin
  }

  /** DuckDB sequential-fold SMA over a sliding last-n list — replicates the
    * Sma expression's left-to-right buffer fold (DuckDB's windowed avg uses
    * pairwise summation, which differs in the last bits). */
  private def duckSma(col: String, n: Int, alias: String): String =
    s"""CASE WHEN count($col) OVER ${alias}_w = $n
       |  THEN list_reduce(list($col) OVER ${alias}_w, (a,b) -> a + b) / $n.0::DOUBLE END""".stripMargin.replace("\n", " ")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_indicators_combined")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1-A4: the four indicator window functions -----------------------
    "q_sma" -> ((s, d) => q(s, d,
      s"""SELECT l_orderkey, l_linenumber, sma(l_quantity, 5) OVER w AS sma_5
         |FROM lineitem WINDOW w AS ($W)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    "q_ema" -> ((s, d) => q(s, d,
      s"""SELECT l_orderkey, l_linenumber, ema(l_quantity, 12) OVER w AS ema_12
         |FROM lineitem WINDOW w AS ($W)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    "q_rsi" -> ((s, d) => q(s, d,
      s"""SELECT l_orderkey, l_linenumber, rsi(l_quantity, 14) OVER w AS rsi_14
         |FROM lineitem WINDOW w AS ($W)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    "q_macd" -> ((s, d) => q(s, d,
      s"""SELECT l_orderkey, l_linenumber, macd(l_quantity) OVER w AS macd
         |FROM lineitem WINDOW w AS ($W)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    "q_indicators_combined" -> ((s, d) => q(s, d,
      s"""SELECT l_orderkey, l_linenumber, l_quantity,
         |  sma(l_quantity, 5)  OVER w AS sma_5,
         |  ema(l_quantity, 12) OVER w AS ema_12,
         |  rsi(l_quantity, 14) OVER w AS rsi_14,
         |  macd(l_quantity)    OVER w AS macd
         |FROM lineitem WINDOW w AS ($W)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- A9: batch RSI signal scan (signals.rs:32-93) ---------------------
    "q_rsi_signals" -> ((s, d) => q(s, d,
      s"""WITH r AS (
         |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice AS price,
         |    rsi(l_extendedprice, 5) OVER w AS rsi_5
         |  FROM lineitem WINDOW w AS ($W)
         |)
         |SELECT l_suppkey, l_orderkey, l_linenumber, price,
         |  CASE WHEN rsi_5 < 30.0 THEN 'BUY' ELSE 'SELL' END AS signal_type,
         |  CASE WHEN rsi_5 < 30.0 THEN (30.0 - rsi_5) / 30.0
         |       ELSE (rsi_5 - 70.0) / 30.0 END AS confidence
         |FROM r
         |WHERE rsi_5 IS NOT NULL AND (rsi_5 < 30.0 OR rsi_5 > 70.0)
         |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // ---- A10: MA-crossover scan (signals.rs:96-169) -----------------------
    "q_ma_crossover" -> ((s, d) => q(s, d,
      s"""WITH ma AS (
         |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
         |    l_extendedprice AS price,
         |    sma(l_extendedprice, 20) OVER w AS sma_20,
         |    sma(l_extendedprice, 50) OVER w AS sma_50
         |  FROM lineitem WINDOW w AS ($W)
         |), lagged AS (
         |  SELECT *,
         |    LAG(sma_20, 1) OVER w2 AS prev_sma_20,
         |    LAG(sma_50, 1) OVER w2 AS prev_sma_50
         |  FROM ma WINDOW w2 AS ($W)
         |)
         |SELECT l_suppkey, l_orderkey, l_linenumber, price, sma_20, sma_50,
         |  CASE WHEN sma_20 > sma_50 THEN 'BUY' ELSE 'SELL' END AS signal_type,
         |  least(abs(sma_20 - sma_50) / price, 1.0) AS confidence
         |FROM lagged
         |WHERE sma_20 IS NOT NULL AND sma_50 IS NOT NULL
         |  AND prev_sma_20 IS NOT NULL AND prev_sma_50 IS NOT NULL
         |  AND ((prev_sma_20 <= prev_sma_50 AND sma_20 > sma_50)
         |    OR (prev_sma_20 >= prev_sma_50 AND sma_20 < sma_50))
         |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // ---- A11/A18: validation checks (validator.rs:63-163) -----------------
    "q_validate_values" -> ((s, d) => q(s, d,
      """SELECT count(*) AS total_rows,
        |  count(CASE WHEN l_quantity <= 0 THEN 1 END) AS nonpositive_quantity,
        |  count(CASE WHEN l_extendedprice <= 0 THEN 1 END) AS nonpositive_price,
        |  count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS bad_discount,
        |  count(CASE WHEN l_tax < 0 THEN 1 END) AS negative_tax
        |FROM lineitem""".stripMargin)),
    "q_validate_gaps" -> ((s, d) => q(s, d,
      """WITH g AS (
        |  SELECT o_orderdate,
        |    LAG(o_orderdate) OVER (ORDER BY o_orderdate, o_orderkey) AS prev_date
        |  FROM orders
        |)
        |SELECT count(*) AS gap_count
        |FROM g
        |WHERE prev_date IS NOT NULL
        |  AND (unix_timestamp(o_orderdate) - unix_timestamp(prev_date)) > 86400""".stripMargin)),
    // ---- A12: day-aggs weekend check (validator.rs:165-208) ---------------
    "q_validate_weekend" -> ((s, d) => q(s, d,
      // Spark: 1=Sunday..7=Saturday (constants translated per SURVEY A12)
      """SELECT count(*) AS weekend_rows
        |FROM orders WHERE dayofweek(o_orderdate) IN (1, 7)""".stripMargin)),

    // ---- 2.B relational surface ------------------------------------------
    "q1_agg" -> ((s, d) => q(s, d,
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    "q_pricing_summary" -> ((s, d) => q(s, d,
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    "q_topk_orders" -> ((s, d) => q(s, d,
      """SELECT l_orderkey, sum(l_quantity) AS total_qty
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY total_qty DESC, l_orderkey LIMIT 10""".stripMargin)),
    "q_revenue_by_nation" -> ((s, d) => {
      load(s, d)
      // broadcast-join shape: orders (fact) joined to small dims
      import org.apache.spark.sql.functions._
      val orders = s.table("orders")
      val customer = s.table("customer")
      val nation = s.table("nation")
      orders
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("order_count"))
        .orderBy(col("n_name"))
    }),
    "q_customers_without_orders" -> ((s, d) => q(s, d,
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),
    "q_window_builtin" -> ((s, d) => q(s, d,
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(row_number() OVER w AS BIGINT) AS rn,
         |  LAG(l_quantity) OVER w AS prev_qty,
         |  sum(l_quantity) OVER (${W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
         |FROM lineitem WINDOW w AS ($W)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    "q_distinct_agg" -> ((s, d) => q(s, d,
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  count(DISTINCT l_suppkey) AS distinct_suppliers
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_sma" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  CASE WHEN count(l_quantity) OVER wn = 5 THEN avg(l_quantity) OVER wn END AS sma_5
         |FROM lineitem
         |WINDOW wn AS ($W ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_ema" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${duckEma("list(l_quantity) OVER w", 12)} AS ema_12
         |FROM lineitem WINDOW w AS $duckW
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_rsi" ->
      (duckRsiSql("lineitem", "l_quantity", 14, "l_orderkey, l_linenumber") +
        "\nORDER BY l_orderkey, l_linenumber"),
    "q_macd" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${duckEma("xs", 12)} - ${duckEma("xs", 26)} AS macd
         |FROM (
         |  SELECT l_orderkey, l_linenumber, list(l_quantity) OVER w AS xs
         |  FROM lineitem WINDOW w AS $duckW
         |)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_indicators_combined" ->
      // single scan chain — (l_orderkey, l_linenumber) is not unique in the
      // testdata, so a self-join would fan out
      s"""WITH base AS (
         |  SELECT l_orderkey, l_linenumber, l_quantity,
         |    CASE WHEN count(l_quantity) OVER wn = 5 THEN avg(l_quantity) OVER wn END AS sma_5,
         |    list(l_quantity) OVER w AS xs,
         |    list(struct_pack(p := l_quantity, g := 0.0::DOUBLE, l := 0.0::DOUBLE, c := 0.0::DOUBLE)) OVER w AS rs
         |  FROM lineitem
         |  WINDOW w AS $duckW,
         |    wn AS ($W ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         |), red AS (
         |  SELECT l_orderkey, l_linenumber, l_quantity, sma_5,
         |    ${duckEma("xs", 12)} AS ema_12,
         |    ${duckEma("xs", 12)} - ${duckEma("xs", 26)} AS macd,
         |    ${rsiFold("rs", 14)} AS s
         |  FROM base
         |)
         |SELECT l_orderkey, l_linenumber, l_quantity, sma_5, ema_12,
         |  ${rsiEval("s", 14)} AS rsi_14, macd
         |FROM red
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_rsi_signals" ->
      s"""WITH r AS (
         |${duckRsiSql("lineitem", "l_extendedprice", 5,
            "l_suppkey, l_orderkey, l_linenumber",
            extraFirst = ", l_extendedprice AS price", extraRest = ", price")}
         |)
         |SELECT l_suppkey, l_orderkey, l_linenumber, price,
         |  CASE WHEN rsi_5 < 30.0 THEN 'BUY' ELSE 'SELL' END AS signal_type,
         |  CASE WHEN rsi_5 < 30.0 THEN (30.0 - rsi_5) / 30.0
         |       ELSE (rsi_5 - 70.0) / 30.0 END AS confidence
         |FROM r
         |WHERE rsi_5 IS NOT NULL AND (rsi_5 < 30.0 OR rsi_5 > 70.0)
         |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_ma_crossover" ->
      s"""WITH ma AS (
         |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
         |    l_extendedprice AS price,
         |    ${duckSma("l_extendedprice", 20, "s20")} AS sma_20,
         |    ${duckSma("l_extendedprice", 50, "s50")} AS sma_50
         |  FROM lineitem
         |  WINDOW s20_w AS ($W ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         |    s50_w AS ($W ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
         |), lagged AS (
         |  SELECT *,
         |    LAG(sma_20, 1) OVER w2 AS prev_sma_20,
         |    LAG(sma_50, 1) OVER w2 AS prev_sma_50
         |  FROM ma WINDOW w2 AS ($W)
         |)
         |SELECT l_suppkey, l_orderkey, l_linenumber, price, sma_20, sma_50,
         |  CASE WHEN sma_20 > sma_50 THEN 'BUY' ELSE 'SELL' END AS signal_type,
         |  least(abs(sma_20 - sma_50) / price, 1.0) AS confidence
         |FROM lagged
         |WHERE sma_20 IS NOT NULL AND sma_50 IS NOT NULL
         |  AND prev_sma_20 IS NOT NULL AND prev_sma_50 IS NOT NULL
         |  AND ((prev_sma_20 <= prev_sma_50 AND sma_20 > sma_50)
         |    OR (prev_sma_20 >= prev_sma_50 AND sma_20 < sma_50))
         |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_validate_values" ->
      """SELECT count(*) AS total_rows,
        |  count(CASE WHEN l_quantity <= 0 THEN 1 END) AS nonpositive_quantity,
        |  count(CASE WHEN l_extendedprice <= 0 THEN 1 END) AS nonpositive_price,
        |  count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS bad_discount,
        |  count(CASE WHEN l_tax < 0 THEN 1 END) AS negative_tax
        |FROM lineitem""".stripMargin,
    "q_validate_gaps" ->
      """WITH g AS (
        |  SELECT o_orderdate,
        |    LAG(o_orderdate) OVER (ORDER BY o_orderdate, o_orderkey) AS prev_date
        |  FROM orders
        |)
        |SELECT count(*) AS gap_count
        |FROM g
        |WHERE prev_date IS NOT NULL
        |  AND date_diff('second', prev_date, o_orderdate) > 86400""".stripMargin,
    "q_validate_weekend" ->
      // DuckDB: dayofweek 0=Sunday..6=Saturday
      """SELECT count(*) AS weekend_rows
        |FROM orders WHERE dayofweek(o_orderdate) IN (0, 6)""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_topk_orders" ->
      """SELECT l_orderkey, sum(l_quantity) AS total_qty
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY total_qty DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_revenue_by_nation" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS order_count
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_customers_without_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_window_builtin" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  row_number() OVER w AS rn,
         |  LAG(l_quantity) OVER w AS prev_qty,
         |  sum(l_quantity) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
         |FROM lineitem WINDOW w AS ($W)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  count(DISTINCT l_suppkey) AS distinct_suppliers
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
