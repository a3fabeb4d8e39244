package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second relational batch: navigation windows, statistical aggregates,
  * pivot, percentiles, conditional aggregation, extended string functions,
  * and the SQL-string API surface.
  *
  * Statistical aggregates (stddev/var/corr) are computed from exact
  * decimal component sums (n, Σx, Σx², Σxy …) with the closed-form
  * formulas applied in double at the end — the component sums are
  * order-independent, so the results are bit-identical across engines,
  * unlike the built-in one-pass stddev/corr whose accumulation order
  * varies with partitioning.
  */
object Relational2 {

  type Qf = (SparkSession, String) => DataFrame

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 10)))

  val queries: Map[String, Qf] = Map(
    // Navigation window functions over each customer's order history.
    "q_window_nav" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                lag(col("o_totalprice"), 1).over(w).as("prev_price"),
                lead(col("o_totalprice"), 1).over(w).as("next_price"),
                first_value(col("o_totalprice")).over(w).as("first_price"),
                row_number().over(w).cast("long").as("order_no"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Ranking family: dense_rank / percent_rank / ntile. Runs over orders
    // because ntile splits sort-key ties arbitrarily — the window order
    // must be a total order (o_totalprice, o_orderkey unique) for the
    // assignment to be deterministic on any engine.
    "q_window_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
                dense_rank().over(w).cast("long").as("drank"),
                round(percent_rank().over(w), 6).as("prank"),
                ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("o_orderkey")
    }),

    // Exact-decimal component sums → closed-form stddev/variance/corr.
    "q_stats_agg" -> ((s, d) => {
      val x = col("l_quantity"); val y = col("l_extendedprice")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             dsum(x).as("sx"), dsum(y).as("sy"),
             dsum(x * x).as("sx2"), dsum(y * y).as("sy2"),
             dsum(x * y).as("sxy"))
        .select(col("l_returnflag"), col("n"),
                round((col("sx2").cast("double") -
                       col("sx").cast("double") * col("sx").cast("double") / col("n"))
                      / (col("n") - 1), 4).as("var_qty"),
                round(sqrt((col("sx2").cast("double") -
                       col("sx").cast("double") * col("sx").cast("double") / col("n"))
                      / (col("n") - 1)), 4).as("sd_qty"),
                round((col("n") * col("sxy").cast("double") -
                       col("sx").cast("double") * col("sy").cast("double")) /
                      (sqrt(col("n") * col("sx2").cast("double") -
                            col("sx").cast("double") * col("sx").cast("double")) *
                       sqrt(col("n") * col("sy2").cast("double") -
                            col("sy").cast("double") * col("sy").cast("double"))), 6)
                  .as("corr_qp"))
        .orderBy("l_returnflag")
    }),

    // Pivot: per-user event-type count matrix (low-cardinality spread).
    "q_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    // Exact percentiles (interpolated), per group.
    "q_percentile" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
             round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
             round(expr("percentile(l_quantity, 0.25)"), 4).as("q1_qty"))
        .orderBy("l_returnflag")),

    // Conditional aggregation + HAVING.
    "q_cond_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
             Q.dsum4(when(col("o_orderpriority") === "1-URGENT",
                          col("o_totalprice")).otherwise(0.0)).as("urgent_total"))
        .filter(col("n_orders") >= 5) // HAVING
        .orderBy("o_custkey")),

    // Extended string functions.
    "q_string_funcs2" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
                regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
                split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
                lpad(col("p_brand"), 12, "*").as("brand_pad"),
                trim(lit(" pad "), lit(" ")).as("trimmed"),
                reverse(col("p_brand")).as("brand_rev"),
                instr(col("p_name"), "a").cast("long").as("first_a"))
        .orderBy("p_partkey")),

    // SQL-string API surface: TPC-H Q3 shape via spark.sql over temp views.
    // Join order + strategy pinned for the fact table: the planner's
    // size estimate puts FILTERED LINEITEM under the broadcast threshold
    // at bench SF and builds its ~270k-row hashed relation single-threaded
    // on the driver (measured 950 ms warm; the hinted shape runs 430 ms).
    // At 100 TB that plan is impossible anyway — the correct shape at any
    // scale is the one declared here: broadcast customer into orders,
    // then a SHUFFLED hash join whose BUILD side is the small filtered
    // customer⨝orders result, with lineitem only ever streamed.
    "q_sql_tpch3" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT /*+ SHUFFLE_HASH(co) */ o_orderkey, o_orderdate,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM (SELECT o_orderkey, o_orderdate
              FROM v_customer JOIN v_orders ON c_custkey = o_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1998-01-01') co
             JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate > TIMESTAMP '1996-06-30'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_window_nav" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                lag(o_totalprice, 1) OVER w AS prev_price,
                lead(o_totalprice, 1) OVER w AS next_price,
                first_value(o_totalprice) OVER w AS first_price,
                CAST(row_number() OVER w AS BIGINT) AS order_no
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",
    "q_window_ntile" ->
      """SELECT o_orderkey, o_orderstatus,
                CAST(dense_rank() OVER w AS BIGINT) AS drank,
                round(percent_rank() OVER w, 6) AS prank,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice ASC, o_orderkey ASC)
         ORDER BY o_orderkey""",
    "q_stats_agg" ->
      """SELECT l_returnflag, n,
                round((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n) / (n-1), 4) AS var_qty,
                round(sqrt((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n) / (n-1)), 4) AS sd_qty,
                round((n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
                      (sqrt(n*CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
                       sqrt(n*CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS corr_qp
         FROM (SELECT l_returnflag, count(*) AS n,
                      sum(CAST(l_quantity AS DECIMAL(38,10))) AS sx,
                      sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS sy,
                      sum(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS sx2,
                      sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,10))) AS sy2,
                      sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,10))) AS sxy
               FROM lineitem GROUP BY l_returnflag)
         ORDER BY l_returnflag""",
    "q_pivot" ->
      """SELECT user_id,
                count(*) FILTER (event_type = 'click')    AS click,
                count(*) FILTER (event_type = 'error')    AS error,
                count(*) FILTER (event_type = 'purchase') AS purchase,
                count(*) FILTER (event_type = 'signup')   AS signup,
                count(*) FILTER (event_type = 'view')     AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_percentile" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
                round(quantile_cont(l_quantity, 0.25), 4) AS q1_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_cond_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
                count(*) FILTER (o_orderstatus = 'F') AS n_finished,
                CAST(sum(CAST(CASE WHEN o_orderpriority = '1-URGENT'
                              THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS urgent_total
         FROM orders GROUP BY o_custkey HAVING count(*) >= 5 ORDER BY o_custkey""",
    "q_string_funcs2" ->
      """SELECT p_partkey,
                regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
                split_part(p_type, ' ', 1) AS type_head,
                lpad(p_brand, 12, '*') AS brand_pad,
                trim(' pad ', ' ') AS trimmed,
                reverse(p_brand) AS brand_rev,
                CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
         FROM part ORDER BY p_partkey""",
    "q_sql_tpch3" ->
      """SELECT o_orderkey, o_orderdate,
                CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
                       JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate  > TIMESTAMP '1996-06-30'
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue DESC, o_orderkey LIMIT 10"""
  )
}
