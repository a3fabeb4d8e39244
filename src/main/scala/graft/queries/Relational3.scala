package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Third relational batch: cube/grouping_id, correlated subqueries,
  * deterministic arg-max, and range-frame windows. */
object Relational3 {

  type Qf = (SparkSession, String) => DataFrame

  val queries: Map[String, Qf] = Map(
    // CUBE with grouping_id — all four aggregation levels in one pass
    // (partial+final agg per grouping set; no re-scan per level).
    "q_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Q.dsum4(col("o_totalprice")).as("total"),
             grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)),

    // Correlated scalar subquery (decorrelated by Catalyst into a join):
    // each order vs its customer's average order value.
    "q_subquery_corr" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v3_orders")
      // gap to the customer's max order: subtraction of 2-decimal values
      // stays far from any round() boundary (a division-based avg lands on
      // .00005 boundaries where Spark's and DuckDB's double-round differ)
      s.sql("""
        SELECT o_orderkey, o_custkey,
               round((SELECT max(o2.o_totalprice)
                      FROM v3_orders o2
                      WHERE o2.o_custkey = o.o_custkey) - o_totalprice, 4) AS gap_to_best
        FROM v3_orders o ORDER BY o_orderkey""")
    }),

    // Deterministic arg-max: lexicographic max over (price, key) struct —
    // ties on price resolve by key on every engine, unlike max_by/arg_max
    // whose tie choice is unspecified.
    "q_argmax" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k"))).as("m"),
             count(lit(1)).as("n_orders"))
        .select(col("o_custkey"), col("m.p").as("best_price"),
                col("m.k").as("best_order"), col("n_orders"))
        .orderBy("o_custkey")),

    // MapType handling: JSON payload → typed map, key listing/lookup.
    "q_map_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
                from_json(col("props"), org.apache.spark.sql.types.MapType(
                  org.apache.spark.sql.types.StringType,
                  org.apache.spark.sql.types.StringType)).as("m"))
        .select(col("event_id"),
                size(col("m")).cast("long").as("n_keys"),
                array_join(array_sort(map_keys(col("m"))), ",").as("keys"),
                try_element_at(col("m"), lit("k")).cast("long").as("k_val"))
        .orderBy("event_id")),

    // Generator: posexplode over an array slice (UNNEST-with-position).
    "q_posexplode" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
                round(col("col").cast("double"), 6).as("v"))
        .orderBy("vec_id", "pos")),

    // UNION (distinct) — dedups across branches, unlike q_union_all.
    "q_union_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .union(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .distinct()
        .orderBy("o_custkey")
    }),

    // Pagination: ORDER BY … OFFSET/LIMIT (stable page under total order).
    "q_paginate" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .offset(20).limit(10)),

    // Ordered string aggregation (listagg/group_concat family) — sorted
    // element order makes the concatenation engine-independent.
    "q_string_agg" -> ((s, d) =>
      Tables.nation(s, d)
        .groupBy(col("n_regionkey").cast("long").as("region"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
               .as("nations"),
             count(lit(1)).as("n"))
        .orderBy("region")),

    // Range frame: trailing 30-day revenue per customer — the frame is
    // bounded by the ORDER BY *value* (days), not row count.
    "q_window_range" -> ((s, d) => {
      val days = datediff(col("o_orderdate").cast("date"),
                          lit("1990-01-01").cast("date"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(days)
        .rangeBetween(-30, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("trail30",
          sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("trail30"))
        .orderBy("o_custkey", "o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
                CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q_subquery_corr" ->
      """SELECT o_orderkey, o_custkey,
                round((SELECT max(o2.o_totalprice)
                       FROM orders o2
                       WHERE o2.o_custkey = o.o_custkey) - o_totalprice, 4) AS gap_to_best
         FROM orders o ORDER BY o_orderkey""",
    "q_argmax" ->
      """SELECT o_custkey,
                max(struct_pack(p := o_totalprice, k := o_orderkey)).p AS best_price,
                max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS best_order,
                count(*) AS n_orders
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "q_map_funcs" ->
      """SELECT event_id,
                CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
                array_to_string(list_sort(json_keys(props)), ',') AS keys,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
         FROM events ORDER BY event_id""",
    "q_posexplode" ->
      """SELECT vec_id, CAST(t.i AS BIGINT) AS pos,
                round(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE), 6) AS v
         FROM embeddings, (SELECT unnest(range(4)) AS i) t
         ORDER BY vec_id, pos""",
    "q_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         UNION
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",
    "q_paginate" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10 OFFSET 20""",
    "q_string_agg" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS region,
                string_agg(n_name, ',' ORDER BY n_name) AS nations,
                count(*) AS n
         FROM nation GROUP BY n_regionkey ORDER BY region""",
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                       PARTITION BY o_custkey
                       ORDER BY datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                       RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail30
         FROM orders ORDER BY o_custkey, o_orderkey"""
  )
}
