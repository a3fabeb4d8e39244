package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scans, filters, projections, sorts, set ops and scalar-function queries.
  *
  * Capability parity: the reference ingests untyped records and exposes them
  * to arbitrary PipelineDB SQL (reference `README.md:65-88`); the relational
  * surface below is that SQL surface re-expressed on the Spark DataFrame API.
  * Every query ends in a total order so the driver's hash compare is
  * deterministic.
  */
object Relational {

  type Qf = (SparkSession, String) => DataFrame

  val queries: Map[String, Qf] = Map(
    // A8: plain columnar scan; projection is pruned down to the parquet
    // reader (ReadSchema shows only 4 of 11 columns at scale).
    // NOTE (here and below): (l_orderkey, l_linenumber) is NOT unique in
    // the synthetic lineitem, so every lineitem query orders by ALL output
    // columns — identical rows are interchangeable, making the hash
    // compare deterministic on any engine/partitioning.
    "q_scan_parquet" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")),

    // A1 batch analog: scan of the stream-shaped `events` table
    // (reference's stream relation, pipeline_kinesis.c:249-256).
    "q_scan_stream" -> ((s, d) =>
      Tables.events(s, d)
        .select($"event_id", $"user_id", $"event_type")
        .orderBy("event_id")),

    // TPC-H6-style conjunctive predicate; all three conjuncts are pushed to
    // the parquet scan (PushedFilters), so at 100 TB row-groups outside the
    // shipdate year are skipped entirely.
    "q_filter_pred" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
                $"l_discount".between(0.03, 0.07) && $"l_quantity" < 24)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
                $"l_extendedprice", $"l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount")),

    // B3 analog: projection with derived scalar expressions. Left-assoc
    // double arithmetic is bit-identical across engines, so no rounding.
    "q_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber",
                ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"),
                ($"l_extendedprice" * (lit(1.0) - $"l_discount") *
                  (lit(1.0) + $"l_tax")).as("charge"))
        .orderBy("l_orderkey", "l_linenumber", "net_price", "charge")),

    // E4: multi-key ordered scan (seqnums ORDER BY shard_id analog,
    // reference README.md:119).
    "q_sort_multi" -> ((s, d) =>
      Tables.events(s, d)
        .select($"user_id", $"event_id", $"event_type", $"value")
        .orderBy($"user_id".asc, $"event_id".asc)),

    // Top-k: exact decimal revenue (order-independent) then sort-limit;
    // Spark executes this as a TakeOrderedAndProject — no full sort at scale.
    "q_topk" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name")
        .agg(graft.Q.dsum4($"o_totalprice").as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey".asc)
        .limit(10)
    }),

    "q_union_all" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.filter($"event_type" === "click").select($"event_id", $"event_type", $"value")
        .unionAll(e.filter($"value" > 150).select($"event_id", $"event_type", $"value"))
        .orderBy("event_id", "event_type")
    }),

    "q_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        .intersect(o.filter($"o_orderstatus" === "F").select($"o_custkey"))
        .orderBy("o_custkey")
    }),

    "q_except" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.select($"c_custkey")
        .except(o.filter($"o_orderpriority" === "1-URGENT")
                  .select($"o_custkey".as("c_custkey")))
        .orderBy("c_custkey")
    }),

    "q_string_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select($"p_partkey",
                upper($"p_name").as("name_up"),
                substring($"p_name", 1, 5).as("name_pre"),
                concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
                length($"p_name").cast("long").as("name_len"),
                when($"p_name".like("%a%"), 1L).otherwise(0L).as("has_a"))
        .orderBy("p_partkey")),

    "q_date_funcs" -> ((s, d) =>
      Tables.orders(s, d)
        .select($"o_orderkey",
                date_trunc("month", $"o_orderdate").as("order_month"),
                year($"o_orderdate").cast("long").as("order_year"),
                month($"o_orderdate").cast("long").as("order_mm"),
                dayofmonth($"o_orderdate").cast("long").as("order_dd"),
                quarter($"o_orderdate").cast("long").as("order_q"),
                datediff(lit("2002-01-01").cast("date"),
                         $"o_orderdate".cast("date")).cast("long").as("days_to_2002"))
        .orderBy("o_orderkey")),

    // Transcendentals rounded to 4dp: cross-engine libm agreement is within
    // 1 ulp, far inside the rounding bucket.
    "q_math_funcs" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber",
                round($"l_extendedprice", 0).as("price_round"),
                abs($"l_quantity" - 25.0).as("qty_dev"),
                round(log($"l_extendedprice"), 4).as("price_ln"),
                ($"l_quantity" * $"l_quantity").as("qty_sq"),
                sqrt($"l_quantity").as("qty_sqrt"),
                ceil($"l_discount" * 100).cast("long").as("disc_pct_ceil"),
                floor($"l_tax" * 100).cast("long").as("tax_pct_floor"))
        .orderBy("l_orderkey", "l_linenumber", "price_round", "qty_dev",
                 "price_ln", "qty_sq", "qty_sqrt", "disc_pct_ceil",
                 "tax_pct_floor")),

    // B2 analog for JSON payloads: extract typed field from the JSON props.
    "q_json_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .select($"event_id",
                get_json_object($"props", "$.k").cast("long").as("k_val"),
                when(get_json_object($"props", "$.k").cast("long") > 50, lit("high"))
                  .otherwise(lit("low")).as("k_bucket"))
        .orderBy("event_id")),

    // Array higher-order functions over the embedding column (UDF-free, so
    // the lambda executes inside codegen'd expressions, not a Scala closure).
    "q_array_funcs" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select($"vec_id",
                size($"embedding").cast("long").as("dim"),
                round(aggregate($"embedding", lit(0.0),
                  (acc, x) => acc + x.cast("double") * x.cast("double")), 4)
                  .as("norm_sq"),
                round(element_at($"embedding", 1).cast("double"), 6).as("e0"))
        .orderBy("vec_id")),

    // B2: delimited-record parsing (COPY text/csv analog,
    // pipeline_kinesis.c:260-286): frame a delimited line, then split it
    // back into typed columns.
    "q_parse_csv" -> ((s, d) =>
      Tables.events(s, d)
        .select($"event_id",
                concat_ws(",", $"event_type", $"user_id", $"event_id").as("line"))
        .select($"event_id",
                split($"line", ",").getItem(0).as("f_type"),
                split($"line", ",").getItem(1).cast("long").as("f_user"),
                split($"line", ",").getItem(2).cast("long").as("f_id"))
        .orderBy("event_id"))
  )

  // Import-free Column interpolation helper.
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.parts.mkString)
  }

  val oracle: Map[String, String] = Map(
    "q_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""",
    "q_scan_stream" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount""",
    "q_project" ->
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1.0 - l_discount) AS net_price,
                l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
         FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price, charge""",
    "q_sort_multi" ->
      """SELECT user_id, event_id, event_type, value
         FROM events ORDER BY user_id ASC, event_id ASC""",
    "q_topk" ->
      """SELECT c_custkey, c_name,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name
         ORDER BY revenue DESC, c_custkey ASC LIMIT 10""",
    "q_union_all" ->
      """SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT event_id, event_type, value FROM events WHERE value > 150
         ORDER BY event_id, event_type""",
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",
    "q_except" ->
      """SELECT c_custkey FROM customer
         EXCEPT
         SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY c_custkey""",
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_up, substr(p_name, 1, 5) AS name_pre,
                p_brand || '/' || p_type AS brand_type,
                CAST(length(p_name) AS BIGINT) AS name_len,
                CASE WHEN p_name LIKE '%a%' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS has_a
         FROM part ORDER BY p_partkey""",
    "q_date_funcs" ->
      """SELECT o_orderkey, date_trunc('month', o_orderdate) AS order_month,
                CAST(year(o_orderdate) AS BIGINT) AS order_year,
                CAST(month(o_orderdate) AS BIGINT) AS order_mm,
                CAST(day(o_orderdate) AS BIGINT) AS order_dd,
                CAST(quarter(o_orderdate) AS BIGINT) AS order_q,
                CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002
         FROM orders ORDER BY o_orderkey""",
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
                round(l_extendedprice, 0) AS price_round,
                abs(l_quantity - 25.0) AS qty_dev,
                round(ln(l_extendedprice), 4) AS price_ln,
                l_quantity * l_quantity AS qty_sq,
                sqrt(l_quantity) AS qty_sqrt,
                CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
                CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor
         FROM lineitem ORDER BY l_orderkey, l_linenumber, price_round, qty_dev,
                  price_ln, qty_sq, qty_sqrt, disc_pct_ceil, tax_pct_floor""",
    "q_json_funcs" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
                CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                     THEN 'high' ELSE 'low' END AS k_bucket
         FROM events ORDER BY event_id""",
    "q_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
                round(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm_sq,
                round(CAST(embedding[1] AS DOUBLE), 6) AS e0
         FROM embeddings ORDER BY vec_id""",
    "q_parse_csv" ->
      """SELECT event_id,
                string_split(line, ',')[1] AS f_type,
                CAST(string_split(line, ',')[2] AS BIGINT) AS f_user,
                CAST(string_split(line, ',')[3] AS BIGINT) AS f_id
         FROM (SELECT event_id,
                      event_type || ',' || user_id || ',' || event_id AS line
               FROM events) ORDER BY event_id"""
  )
}
