package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin}

/** Temporal operators over the events table: backward as-of join and
  * trailing range-frame aggregates — the "state as of" and "activity
  * in the last hour" building blocks of event-stream feature
  * pipelines. Both hash-gated: DuckDB has native ASOF JOIN and
  * identical RANGE-frame semantics. */
object TemporalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Backward as-of join: each click enriched with the user's most
    // recent purchase at or before the click. The right side is
    // pre-aggregated unique per (user, ts) — as-of requires it.
    QueryDef.sql(
      "q_asof_purchase",
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, c.ts,
        |  p.purchase_id, p.ts AS purchase_ts
        |FROM clicks c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
        .withColumn("purchase_ts", col("ts"))
      AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("purchase_id", "purchase_ts"))
        .orderBy("event_id")
    },

    // Tolerance as-of (pandas merge_asof tolerance): the latest
    // purchase at-or-before each click counts only within 24h — the
    // latest-before row is the CLOSEST, so tolerance is a
    // post-condition on the matched row (same single-shuffle plan);
    // DuckDB replays it as a CASE over its native ASOF.
    QueryDef.sql(
      "q_asof_tolerance",
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, c.ts,
        |  CASE WHEN p.ts >= c.ts - INTERVAL 1 DAY THEN p.purchase_id END
        |    AS purchase_id,
        |  CASE WHEN p.ts >= c.ts - INTERVAL 1 DAY THEN p.ts END AS purchase_ts
        |FROM clicks c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
        .withColumn("purchase_ts", col("ts"))
      AsOfJoin.backwardWithin(clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("purchase_id", "purchase_ts"), toleranceMicros = 24L * 3600 * 1000000)
        .orderBy("event_id")
    },

    // Forward as-of: each click's NEXT purchase (smallest purchase ts
    // >= click ts) — gated against DuckDB's native forward ASOF
    // (c.ts <= p.ts). Same one-shuffle union+window plan, ts DESC.
    QueryDef.sql(
      "q_asof_next",
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, c.ts,
        |  p.purchase_id, p.ts AS purchase_ts
        |FROM clicks c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
        .withColumn("purchase_ts", col("ts"))
      AsOfJoin.forward(clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("purchase_id", "purchase_ts"))
        .orderBy("event_id")
    },

    // Keyless range join via time binning: every sampled error event
    // opens a 30-minute window; count + sum all events falling inside.
    // The oracle is the plain inequality join (fine at oracle scale);
    // the Spark plan is the binned equi-join (no cartesian, plan-pinned
    // in spec).
    QueryDef.sql(
      "q_range_join",
      """WITH iv AS (
        |  SELECT event_id AS interval_id, epoch_us(ts) AS s_us,
        |         epoch_us(ts) + 1800000000 AS e_us
        |  FROM events
        |  WHERE event_type = 'error' AND event_id % 50 = 0)
        |SELECT iv.interval_id, COUNT(*) AS n_in_window,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM iv JOIN events e
        |  ON epoch_us(e.ts) BETWEEN iv.s_us AND iv.e_us
        |GROUP BY iv.interval_id
        |ORDER BY interval_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val intervals = ev
        .filter(col("event_type") === "error" && col("event_id") % 50 === 0)
        .select(col("event_id").as("interval_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
      RangeJoin.pointInInterval(
          ev.select(col("ts"), col("value")), intervals,
          "ts", "w_start", "w_end", binMicros = 1800L * 1000000L)
        .groupBy("interval_id")
        .agg(count(lit(1)).as("n_in_window"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("interval_id")
    },

    // Trailing range-frame aggregate: events in the user's last hour
    // (RANGE frame on epoch micros — peers at equal ts are included
    // identically in both engines).
    QueryDef.sql(
      "q_w_trailing_range",
      """SELECT event_id,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, d).select(
          col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("sum_1h"))
        .orderBy("event_id")
    })
}
