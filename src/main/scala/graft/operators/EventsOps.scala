package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table, batch form. The same
  * plans run unchanged as Structured Streaming queries (see
  * graft.streaming.Streaming + the batch/stream parity tests); the
  * DuckDB oracles pin the window semantics.
  *
  * Scale notes: tumbling/sliding windows are plain groupBy shuffles on
  * (window, key) — unbounded in key cardinality, bounded state. Session
  * windows shuffle on user_id; Spark's session_window merges in-partition.
  */
object EventsOps {

  val qs: Seq[Q] = Seq(
    // Tumbling 1-hour windows. Spark's window() starts are epoch-aligned,
    // identical to DuckDB time_bucket for hour-aligned buckets.
    Q("q37_events_tumbling",
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events) e
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    },

    // Sliding windows (1 hour, slide 30 min): each event lands in the
    // two windows starting at floor30(ts) and floor30(ts)-30min.
    Q("q38_events_sliding",
      """SELECT win_start, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM (SELECT time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS win_start,
        |             event_type, value
        |      FROM (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events) e
        |      CROSS JOIN (VALUES (0), (1)) offs(o)) t
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    },

    // Session windows (5-minute gap) per user: a new session starts when
    // the gap to the previous event is >= the gap duration ([t, t+gap)
    // intervals merge only when they overlap).
    Q("q39_events_session",
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '5 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM (SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events) e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), numbered AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM numbered
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // Deterministic "first event per (user, type)" dedup — the batch
    // analogue of streaming dropDuplicatesWithinWatermark (which keeps
    // the first arrival; batch dropDuplicates keeps an arbitrary row, so
    // the deterministic rank-1 form is the declared operator).
    Q("q40_events_first_dedup",
      """SELECT user_id, event_type, event_id, ts
        |FROM (SELECT user_id, event_type, event_id, ts,
        |        row_number() OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts, event_id) AS rn
        |      FROM (SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
        |            FROM events) e) t
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    },

    // As-of join (time-series point-in-time lookup): each click joins
    // the latest purchase of the same user at or before its timestamp.
    // Spark has no ASOF join operator; the scale-correct decomposition
    // is union both sides tagged, one shuffle+sort per user, and a
    // last-ignoreNulls carry-forward window — O(n log n) per key, no
    // range-join explosion. The purchase side is pre-aggregated to
    // unique (user, ts) so tie behavior is engine-independent. DuckDB's
    // native ASOF LEFT JOIN is the oracle.
    Q("q68_asof_join",
      """WITH c AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'click'),
        |     p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS p_value
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, c.ts,
        |  p.ts AS purchase_ts, p.p_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.user_id, c.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"),
          lit(null).cast("timestamp_ntz").as("p_ts"), lit(null).cast("double").as("p_val"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("p_val"))
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          lit(null).cast("long").as("event_id"), col("ts").as("p_ts"), col("p_val"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      clicks.unionByName(purchases)
        .withColumn("purchase_ts", last(col("p_ts"), ignoreNulls = true).over(w))
        .withColumn("p_value", last(col("p_val"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select("user_id", "event_id", "ts", "purchase_ts", "p_value")
        .orderBy("user_id", "event_id")
    }
  )
}
