package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join operators.
  *
  * Reference analogs: the extension's own config lookup is an inner equi-join
  * (`consumers c JOIN endpoints e ON c.endpoint = e.name`,
  * pipeline_kinesis.c:348-352); PipelineDB's continuous views support the
  * full SQL join surface over streams. Scale notes inline per query.
  */
object Joins {

  type Qf = (SparkSession, String) => DataFrame

  val queries: Map[String, Qf] = Map(
    // C4 analog. Dimension side (customer) is broadcast explicitly: at
    // 100 TB the fact side streams through map tasks with zero shuffle.
    "q_join_inner" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .select(o("o_orderkey"), c("c_name"), o("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // TPC-H5-style 5-way join. lineitem⋈orders is the only large-large
    // join (shuffle on orderkey); customer/nation/region are broadcast, so
    // the plan is one shuffle + three map-side joins, then a partial+final
    // hash aggregate on the 25-value nation key.
    "q_join_multi" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA")
        .groupBy(n("n_name"))
        .agg(graft.Q.dsum4(l("l_extendedprice") * (lit(1.0) - l("l_discount")))
               .as("revenue"),
             count(lit(1)).as("n_rows"))
        .orderBy("n_name")
    }),

    // Left outer join + null-aware aggregation (customers without orders
    // keep n_orders = 0).
    "q_join_left" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"), c("c_name"))
        .agg(count(o("o_orderkey")).as("n_orders"),
             coalesce(graft.Q.dsum4(o("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    }),

    // EXISTS → left-semi: no payload duplication, dedups build side.
    "q_join_semi" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select(o("o_orderkey"), o("o_orderstatus"))
        .orderBy("o_orderkey")
    }),

    // NOT EXISTS → left-anti.
    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(c("c_custkey"), c("c_name"))
        .orderBy("c_custkey")
    }),

    // As-of join: each event (with a deterministic synthetic event time in
    // the orders date range) matched to the customer's latest order at or
    // before that time. Single shuffle on the key — see operators.AsOfJoin.
    "q_join_asof" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
                date_add(lit("1995-01-01").cast("date"),
                         (col("event_id") % 2400).cast("int"))
                  .cast("timestamp").as("ets"))
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val joined = AsOfJoin(e, o,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ets", rightTime = "o_orderdate",
        rightCols = Seq("o_orderkey", "o_orderdate"),
        rightTiebreak = "o_orderkey")
      joined.filter(col("asof_o_orderkey").isNotNull)
        .select(col("event_id"), col("user_id"),
                col("asof_o_orderkey").as("asof_orderkey"),
                col("asof_o_orderdate").as("asof_date"))
        .orderBy("event_id")
    }),

    // Interval (range) join: every event inside the 10-minute window
    // opened by each purchase. No equi-key exists, so a naive theta-join
    // would plan BNLJ/cartesian; operators.RangeJoin buckets both sides
    // to 600 s bins and equi-joins on the bin id — one hash exchange per
    // side, the same plan shape at 100 TB (PlanAuditSpec asserts it).
    "q_join_range" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val iv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("iv_id"), col("ts").as("start_ts"),
                (col("ts") + expr("INTERVAL 10 MINUTES")).as("end_ts"))
      val pts = ev.select(col("event_id").as("ev_id"), col("ts").as("ev_ts"))
      RangeJoin(iv, pts, col("start_ts"), col("end_ts"), col("ev_ts"),
                binSeconds = 600)
        .select(col("iv_id"), col("ev_id"))
        .orderBy("iv_id", "ev_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q_join_multi" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                count(*) AS n_rows
         FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY n_name""",
    "q_join_left" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
                coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q_join_semi" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
         ORDER BY o_orderkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q_join_asof" ->
      """SELECT event_id, user_id, o_orderkey AS asof_orderkey, o_orderdate AS asof_date
         FROM (SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
                      row_number() OVER (PARTITION BY e.event_id
                                         ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
               FROM (SELECT event_id, user_id,
                            TIMESTAMP '1995-01-01 00:00:00'
                              + to_days(CAST(event_id % 2400 AS INTEGER)) AS ets
                     FROM events) e
               JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ets)
         WHERE rn = 1 ORDER BY event_id""",
    "q_join_range" ->
      """SELECT i.event_id AS iv_id, e.event_id AS ev_id
         FROM (SELECT event_id, ts AS start_ts, ts + INTERVAL 10 MINUTE AS end_ts
               FROM events WHERE event_type = 'purchase') i
         JOIN events e ON e.ts >= i.start_ts AND e.ts < i.end_ts
         ORDER BY iv_id, ev_id"""
  )
}
