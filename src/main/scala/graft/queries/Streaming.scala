package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.EventStream

/** Streaming surface — each query actually executes a Structured
  * Streaming job (file source → event-time aggregation → memory sink,
  * Trigger.AvailableNow) and returns the materialized result, which is
  * hash-checked against the equivalent batch SQL in DuckDB. */
object Streaming {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "st_hourly_agg" -> ((s, dir) => EventStream.hourlyAgg(s, dir)),
    "st_sliding_agg" -> ((s, dir) => EventStream.slidingAgg(s, dir)),
    "st_enrich" -> ((s, dir) => EventStream.enrich(s, dir)),
    "st_stream_join" -> ((s, dir) => EventStream.streamJoin(s, dir)),
    "st_stream_join_outer" -> ((s, dir) => EventStream.streamJoinOuter(s, dir)),
    "st_sessionize" -> ((s, dir) => EventStream.sessionize(s, dir)),
    "st_user_journey" -> ((s, dir) => EventStream.userJourney(s, dir)),
    "st_dedup_ingest" -> ((s, dir) => EventStream.dedupedIngest(s, dir)),
    "st_late_data" -> ((s, dir) => EventStream.lateData(s, dir)),
    "st_anomaly" -> ((s, dir) => EventStream.anomaly(s, dir)),
    "st_temporal_enrich" -> ((s, dir) => EventStream.temporalEnrich(s, dir)),
    "st_upsert_sink" -> ((s, dir) => EventStream.upsertSink(s, dir)),
    "st_corpus_ingest" -> ((s, dir) =>
      graft.streaming.DocumentStream.corpusIngest(s, dir)),
    "st_sel_gate" -> ((s, dir) =>
      graft.streaming.DocumentStream.selGate(s, dir)),
    "st_source_cap_gate" -> ((s, dir) =>
      graft.streaming.DocumentStream.sourceCapGate(s, dir)))

  val oracles: Map[String, String] = Map(
    "st_corpus_ingest" ->
      s"""WITH w AS (SELECT doc_id, lang,
         |        len(regexp_extract_all(lower(text), '\\b(${Text.stopsEn})\\b')) AS stop_hits,
         |        string_split(${Text.normDuck}, ' ') AS ws,
         |        md5(${Text.normDuck}) AS h FROM documents),
         |b AS (SELECT doc_id, lang, stop_hits, h, len(ws) AS n_words,
         |        len(list_distinct(ws)) AS n_distinct FROM w),
         |t AS (SELECT doc_id, MAX(c) AS top2 FROM (
         |        SELECT doc_id, g, COUNT(*) AS c FROM (
         |          SELECT doc_id, unnest(list_transform(range(1, len(ws)),
         |                 i -> ws[i] || ' ' || ws[i+1])) AS g
         |          FROM w WHERE len(ws) >= 2) GROUP BY doc_id, g)
         |      GROUP BY doc_id),
         |gated AS (SELECT b.doc_id, b.h FROM b LEFT JOIN t USING (doc_id)
         |          WHERE ${Text.gateWhereSql}),
         |k AS (SELECT h, MIN(doc_id) AS keep_id FROM gated GROUP BY h)
         |SELECT g.doc_id, g.doc_id = k.keep_id AS is_novel,
         |       CASE WHEN g.doc_id <> k.keep_id THEN k.keep_id END AS dup_of
         |FROM gated g JOIN k USING (h)""".stripMargin,
    "st_hourly_agg" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |       event_type,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "st_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
        |       v.ts AS v_ts, p.ts AS p_ts
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        | AND v.event_type = 'view' AND p.event_type = 'purchase'
        | AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 30 MINUTE""".stripMargin,
    // matches emit as in the inner join; a NULL row appears only for
    // views whose 30-minute window closed under the final watermark
    // (state eviction proves no future purchase can match) — newer
    // unmatched views are withheld from a bounded replay. With TWO
    // watermarked columns the global watermark is the MIN of the
    // per-column watermarks (each ms-floored max - delay), NOT the
    // global event-time max — pinned empirically: one unmatched view
    // between the two candidate watermarks distinguishes the rules.
    "st_stream_join_outer" ->
      """WITH wmf AS (SELECT least(
        |               (SELECT date_trunc('millisecond', MAX(ts)) FROM events
        |                WHERE event_type = 'view'),
        |               (SELECT date_trunc('millisecond', MAX(ts)) FROM events
        |                WHERE event_type = 'purchase')) - INTERVAL 1 HOUR AS w),
        |v AS (SELECT user_id, event_id AS view_id, ts AS v_ts
        |      FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id, v.view_id, p.purchase_id, v.v_ts, p.p_ts
        |FROM v LEFT JOIN p
        |  ON v.user_id = p.user_id
        | AND p.p_ts >= v.v_ts AND p.p_ts < v.v_ts + INTERVAL 30 MINUTE
        |WHERE p.purchase_id IS NOT NULL
        |   OR v.v_ts + INTERVAL 30 MINUTE < (SELECT w FROM wmf)""".stripMargin,
    "st_enrich" ->
      """SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1""".stripMargin,
    // each event lands in exactly the two 1-hour windows whose starts
    // are floor30(ts) and floor30(ts) - 30min — unnest both and group.
    "st_sliding_agg" ->
      """WITH w AS (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
        |           AS window_start,
        |         event_type, value
        |  FROM events)
        |SELECT window_start, event_type,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    // gaps-and-islands rendering of 30-min-gap sessions. Strict >
    // matches session_window: Spark merges ADJACENT session windows,
    // so an exact-30:00 gap stays one session (SessionBoundarySpec
    // pins this on a boundary fixture).
    "st_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                     > INTERVAL '30 minutes'
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                                ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM o)
        |SELECT MIN(ts) AS session_start, user_id,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM s
        |GROUP BY user_id, sess_id""".stripMargin,
    // per-event running state (flatMapGroupsWithState) rendered as
    // gaps-and-islands window SQL; cumulative value decimal-exact in
    // both engines so running-sum evaluation order can't drift it.
    "st_user_journey" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |                OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id, ts,
        |       ROW_NUMBER() OVER w AS event_seq,
        |       CAST(SUM(new_sess) OVER w AS BIGINT) AS session_idx,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS cum_value
        |FROM o
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS UNBOUNDED PRECEDING)""".stripMargin,
    "st_dedup_ingest" ->
      """SELECT DISTINCT event_id, user_id, event_type, value
        |FROM events""".stripMargin,
    // the SCD2 rebuild (same CTE as etl_scd2's oracle) + the affine
    // event-day replay mapping, then the identical as-of interval join.
    "st_temporal_enrich" ->
      """WITH ord AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS valid_from,
        |         o_orderkey, o_orderpriority,
        |         LAG(o_orderpriority) OVER (PARTITION BY o_custkey
        |           ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_prio
        |  FROM orders),
        |chg AS (
        |  SELECT o_custkey, valid_from, o_orderkey, o_orderpriority
        |  FROM ord WHERE prev_prio IS NULL OR prev_prio <> o_orderpriority),
        |hist AS (
        |  SELECT o_custkey, ROW_NUMBER() OVER w AS version,
        |         o_orderpriority AS priority, valid_from,
        |         LEAD(valid_from) OVER w AS valid_to
        |  FROM chg
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)),
        |ev AS (
        |  SELECT event_id, user_id,
        |         CAST('1995-01-01' AS DATE)
        |           + CAST((day(ts) - 1) * 80 AS INTEGER) AS lookup_date
        |  FROM events)
        |SELECT e.event_id, e.user_id, e.lookup_date,
        |       coalesce(h.priority, 'NONE') AS priority,
        |       CAST(coalesce(h.version, 0) AS INTEGER) AS version
        |FROM ev e LEFT JOIN hist h ON e.user_id = h.o_custkey
        |  AND e.lookup_date >= h.valid_from
        |  AND (h.valid_to IS NULL OR e.lookup_date < h.valid_to)""".stripMargin,
    // the same cross-multiplied integer inequality over prior-row
    // running moments, expressed as a 1-PRECEDING window. x uses the
    // proven DECIMAL(18,4) tick conversion (matches BigDecimal
    // setScale(4, HALF_UP) on the Spark side).
    "st_anomaly" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, ts, CAST(x AS HUGEINT) AS x,
        |         COUNT(*) OVER win AS n,
        |         SUM(CAST(x AS HUGEINT)) OVER win AS s,
        |         SUM(CAST(x AS HUGEINT) * x) OVER win AS q
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, ts,
        |       coalesce(n >= 5 AND (x*n - s)*(x*n - s) > 4*(n*q - s*s), FALSE)
        |         AS is_anomaly
        |FROM w""".stripMargin,
    // append-mode watermark semantics, re-derived in SQL. The replay is
    // three ordered batches (see EventStream.lateData): batch 0 = rows
    // older than maxTs-12h minus the 5% straggler stratum; batch 2
    // carries the stragglers. Spark's late filter for batch N uses the
    // watermark as of batch N-1's start, so the stragglers are gated
    // by batch 0's watermark (ms-floored max event time - 1h; window
    // END above it ⇒ kept). The final watermark gates which windows
    // are emitted at all (window end ≤ watermark ⇒ closed and
    // flushed).
    "st_late_data" ->
      """WITH cut AS (SELECT MAX(ts) - INTERVAL 12 HOUR AS c FROM events),
        |b0 AS (SELECT * FROM events
        |       WHERE ts <= (SELECT c FROM cut) AND event_id % 20 <> 0),
        |wm1 AS (SELECT date_trunc('millisecond', MAX(ts)) - INTERVAL 1 HOUR AS w
        |        FROM b0),
        |wmf AS (SELECT date_trunc('millisecond', MAX(ts)) - INTERVAL 1 HOUR AS w
        |        FROM events),
        |kept AS (
        |  SELECT * FROM events
        |  WHERE event_id % 20 <> 0
        |     OR time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR
        |          > (SELECT w FROM wm1))
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |       event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM kept
        |WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR
        |        <= (SELECT w FROM wmf)
        |GROUP BY 1, 2""".stripMargin,
    // the streaming DSIR gate scores each arriving doc with the model
    // compiled from the batch fit — same integer fixed-point weights,
    // so the batch replay is exact; kept = "at least as target-like
    // as the reference corpus' DsirK-th doc"
    "st_sel_gate" ->
      s"""WITH ${Selection.dsirPerSql},
         |thr AS (SELECT ${Selection.dsirThresholdSql} AS t)
         |SELECT doc_id, n_tokens, dsir_fp, dsir_fp >= t AS kept
         |FROM per CROSS JOIN thr""".stripMargin,
    // the streaming cap gate replays the batch decision bit-for-bit
    // (same thresholds, same hash slice), so its oracle IS the batch
    // operator's oracle
    "st_source_cap_gate" -> Selection.oracles("sel_source_cap"),
    // the upsert target's final state = last event (by ts, event_id)
    // plus total count per user, independent of batch boundaries.
    "st_upsert_sink" ->
      """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        |       event_type AS last_type, n_events
        |FROM (
        |  SELECT user_id, ts, event_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY ts DESC, event_id DESC) AS rn,
        |         COUNT(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM events)
        |WHERE rn = 1""".stripMargin)
}
