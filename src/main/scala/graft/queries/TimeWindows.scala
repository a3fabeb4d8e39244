package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing — the batch forms of the continuous-view windows.
  *
  * These are the same `window()`/`session_window()` expressions the
  * streaming path uses (graft.streaming); in batch they verify against the
  * DuckDB oracle, in streaming they run with watermarks (covered by
  * MemoryStream specs). PipelineDB continuous views are precisely standing
  * windowed aggregations over streams (reference README.md:66).
  */
object TimeWindows {

  type Qf = (SparkSession, String) => DataFrame

  val queries: Map[String, Qf] = Map(
    // Tumbling 1-hour windows × event_type.
    "q_window_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"))
        .orderBy("window_start", "event_type")),

    // Hopping windows: 1 hour long, sliding every 30 minutes — each event
    // lands in exactly two windows.
    "q_window_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"))
        .orderBy("window_start", "event_type")),

    // Session windows: per-user sessions closed by a 30-minute silence gap.
    "q_window_session" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
                col("n_events"))
        .orderBy("user_id", "session_start")),

    // Session metrics: duration (last event + gap − first event), event
    // count, exact extrema. Sum-free on purpose: double sums of
    // full-precision values can't be made order-independent.
    "q_session_stats" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
             round(max(col("value")), 4).as("max_value"))
        .select(col("user_id"),
                col("session_window.start").as("session_start"),
                (col("session_window.end").cast("long") -
                 col("session_window.start").cast("long")).as("dur_sec"),
                col("n_events"), col("max_value"))
        .orderBy("user_id", "session_start"))
  )

  val oracle: Map[String, String] = Map(
    "q_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    // Window starts are the 30-minute bucket of ts and the bucket before it.
    "q_window_sliding" ->
      """SELECT window_start, event_type, count(*) AS n FROM (
           SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type FROM events
           UNION ALL
           SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type FROM events
         ) GROUP BY 1, 2 ORDER BY window_start, event_type""",
    // Gaps-and-islands: new session when the gap to the previous event of
    // the same user is >= 30 minutes (session end bound is exclusive,
    // matching Spark's session_window semantics).
    "q_session_stats" ->
      """SELECT user_id, min(ts) AS session_start,
                CAST(datediff('second', min(ts), max(ts)) + 1800 AS BIGINT) AS dur_sec,
                count(*) AS n_events,
                round(max(value), 4) AS max_value
         FROM (
           SELECT user_id, ts, value,
                  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
           FROM (SELECT user_id, ts, value,
                        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                  >= INTERVAL '30 minutes'
                             THEN 1 ELSE 0 END AS new_sess
                 FROM events))
         GROUP BY user_id, sess_id ORDER BY user_id, session_start""",
    "q_window_session" ->
      """SELECT user_id, min(ts) AS session_start, count(*) AS n_events FROM (
           SELECT user_id, ts,
                  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
           FROM (SELECT user_id, ts,
                        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                  >= INTERVAL '30 minutes'
                             THEN 1 ELSE 0 END AS new_sess
                 FROM events))
         GROUP BY user_id, sess_id ORDER BY user_id, session_start"""
  )
}
