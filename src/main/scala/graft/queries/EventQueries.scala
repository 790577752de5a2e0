package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time analytics over the `events` fixture (SURVEY §2.12): tumbling and
  * sliding windows, gap-based sessionization, and JSON extraction. These are
  * the batch-mode semantics; `graft.streaming.EventStreams` runs the identical
  * aggregations under Structured Streaming with a watermark, and the batch
  * results here are the parity oracle (SURVEY §7.4.6).
  */
object EventQueries {

  val defs: Seq[QueryDef] = Seq(

    // Tumbling 1-hour event-time window per type.
    QueryDef("q26_tumbling_window",
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
        |       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
        .orderBy("win_start", "event_type")
    },

    // Sliding 1-hour window, 30-minute slide: each event lands in 2 windows.
    QueryDef("q27_sliding_window",
      """WITH e AS (
        |  SELECT (epoch_us(ts) // 1800000000) * 1800 - k AS win_start,
        |         event_type
        |  FROM events, (SELECT unnest([0, 1800]) AS k))
        |SELECT win_start, event_type, count(*) AS n
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .groupBy(unix_timestamp(col("w.start")).as("win_start"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("win_start", "event_type")
    },

    // Gap-based sessionization (30-min inactivity): lag + cumulative boundary
    // count — the classic two-window formulation, fully deterministic via the
    // (ts, event_id) order.
    QueryDef("q28_sessionize",
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
        |                (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, count(DISTINCT session_id) AS n_sessions,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        // exact integer microseconds on both engines (unix_micros / epoch_us)
        .withColumn("new_session",
          when(unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id")
        .agg(countDistinct("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // session_window in batch mode: Spark's native gap-session operator must
    // agree with the lag+cumsum formulation (q28). Session-boundary semantics:
    // a gap of exactly the window closes the session (hence >= in the oracle,
    // vs > in q28's convention).
    QueryDef("q55_session_window",
      """WITH g AS (
        |  SELECT user_id, ts,
        |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
        |                (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
        |         ts
        |  FROM g),
        |sess AS (SELECT user_id, session_id, count(*) AS n_events,
        |                min(epoch_us(ts)) AS start_us
        |         FROM s GROUP BY user_id, session_id)
        |SELECT user_id, start_us, n_events
        |FROM sess ORDER BY user_id, start_us""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
          col("n_events"))
        .orderBy("user_id", "start_us")
    },

    // JSON extraction (events.props is a JSON string).
    QueryDef("q29_json_extract",
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |       count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }
  )
}
