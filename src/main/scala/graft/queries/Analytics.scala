package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream — the standing
  * queries a PipelineDB deployment would run as continuous views:
  * funnel conversion and day-N retention cohorts. Both are single-pass
  * per-user aggregations (shuffle on user_id only) followed by a tiny
  * summary aggregate, so they scale with user cardinality, not event
  * volume. */
object Analytics {

  type Qf = (SparkSession, String) => DataFrame

  val queries: Map[String, Qf] = Map(
    // Funnel: view → click → purchase in timestamp order per user. One
    // pass computes each stage's earliest feasible timestamp; a user
    // converts at stage k if the chain holds in order.
    "q_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
      val perUser = e.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"),
             count(lit(1)).as("n_events"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("t_c"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("t_p"))
      val withClick = perUser
        .join(clicks, col("user_id") === col("cu") && col("t_c") > col("t_view"), "left")
        .groupBy(col("user_id"), col("t_view"), col("n_events"))
        .agg(min(col("t_c")).as("t_click"))
      val withPurchase = withClick
        .join(purchases, col("user_id") === col("pu") && col("t_p") > col("t_click"), "left")
        .groupBy(col("user_id"), col("t_view"), col("t_click"), col("n_events"))
        .agg(min(col("t_p")).as("t_purchase"))
      withPurchase
        .select(col("user_id"),
                col("t_view").isNotNull.as("s1_view"),
                col("t_click").isNotNull.as("s2_click"),
                col("t_purchase").isNotNull.as("s3_purchase"),
                col("n_events"))
        .orderBy("user_id")
    }),

    // Retention: for each calendar day, of the users active that day, how
    // many were also active the next day. Two compact (day, user) sets
    // joined on user with a day+1 equality — shuffle carries distinct
    // (day, user) pairs only.
    "q_retention" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .distinct()
      // distinct column names on the shifted copy — self-join column refs
      // (du("day") on both sides) misbind after the derivation. Shift
      // NEXT-day activity back onto day d (minus): a (d+1, u) row becomes
      // day2 = d, so matching day = day2 marks u as retained into d+1.
      val nxt = du.select((col("day") - expr("INTERVAL 1 DAY")).as("day2"),
                          col("user_id").as("u2"))
      du.join(nxt, col("user_id") === col("u2") && col("day") === col("day2"), "left")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("active_users"),
             count(col("u2")).as("retained_next_day"))
        .orderBy("day")
    }),

    // Skew-safe two-phase aggregation. `event_type` has ~5 values, so at
    // 100 TB a single groupBy funnels the whole table through 5 reducers.
    // Phase 1 salts the key 16 ways (deterministic hash of the row id —
    // no rand(), so retries agree) and computes uniform partial
    // aggregates; phase 2 combines the ≤ 5×16 partials. The oracle is the
    // plain GROUP BY: salting must be invisible in the result.
    // Partials sum in DecimalType(18,4): double addition is
    // order-dependent, and the salted two-phase order differs from both
    // the plain groupBy and the oracle's single pass — at a 4-decimal
    // half boundary round() could flip. Decimal partials make every
    // summation order bit-identical (value is an exact 2-decimal).
    "q_agg_salted" -> ((s, d) => {
      val partial = Tables.events(s, d)
        .groupBy(col("event_type"),
                 pmod(hash(col("event_id")), lit(16)).as("__salt"))
        .agg(count(lit(1)).as("pc"),
             sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("pv"))
      partial.groupBy(col("event_type"))
        .agg(sum(col("pc")).as("n_events"),
             round(sum(col("pv")).cast("double"), 4).as("sum_value"))
        .orderBy("event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_funnel" ->
      """WITH pu AS (
           SELECT user_id,
                  min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                  count(*) AS n_events
           FROM events GROUP BY user_id),
         wc AS (
           SELECT pu.user_id, pu.t_view, pu.n_events, min(c.ts) AS t_click
           FROM pu LEFT JOIN events c
             ON c.user_id = pu.user_id AND c.event_type = 'click' AND c.ts > pu.t_view
           GROUP BY pu.user_id, pu.t_view, pu.n_events),
         wp AS (
           SELECT wc.user_id, wc.t_view, wc.t_click, wc.n_events, min(p.ts) AS t_purchase
           FROM wc LEFT JOIN events p
             ON p.user_id = wc.user_id AND p.event_type = 'purchase' AND p.ts > wc.t_click
           GROUP BY wc.user_id, wc.t_view, wc.t_click, wc.n_events)
         SELECT user_id,
                t_view IS NOT NULL AS s1_view,
                t_click IS NOT NULL AS s2_click,
                t_purchase IS NOT NULL AS s3_purchase,
                n_events
         FROM wp ORDER BY user_id""",
    "q_retention" ->
      """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events)
         SELECT a.day, count(*) AS active_users, count(b.user_id) AS retained_next_day
         FROM du a LEFT JOIN du b
           ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
         GROUP BY a.day ORDER BY a.day""",
    "q_agg_salted" ->
      // decimal sum on the oracle side too: both engines then compute the
      // identical exact decimal before the final round — bit-identical
      """SELECT event_type, count(*) AS n_events,
                round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
