package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, DecimalType, DoubleType}

/** Structured Streaming ingest over the `events` table.
  *
  * The reference is batch-only (SURVEY.md §2.10); its unwired
  * incremental extract (extract_data.py:94-145) maps to a file-source
  * stream with `Trigger.AvailableNow` — process everything available,
  * then stop — which is also the idiomatic backfill pattern on a real
  * cluster (checkpointed, restart-safe, scales with file listing
  * parallelism). Aggregations run in complete mode so the one-shot
  * result equals the batch answer exactly (append mode would hold back
  * windows above the final watermark).
  *
  * Event-time operators: tumbling 1-hour windows and native
  * 30-minute-gap session windows (Spark's session_window — the
  * stateful merge is the engine's, no custom state store needed;
  * flatMapGroupsWithState is only warranted for non-gap session
  * logic).
  */
/** O(1) per-user streaming state for userJourney: last event time
  * (epoch MICROS — the events data is microsecond-granular, so a
  * millisecond state key could mis-order same-ms events or flip a gap
  * within 1ms of the 30-min boundary), running counters, decimal-exact
  * cumulative value. */
final case class JourneyState(lastTsMicros: Long, seq: Long, sessionIdx: Long,
                              cum: java.math.BigDecimal)

object EventStream {

  /** Streaming read of `<dir>/events.parquet` (schema from a static
    * peek; ns-timestamps arrive as Long and are converted exactly). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val static = spark.read.parquet(s"$dir/events.parquet")
    val stream = spark.readStream
      .schema(static.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (static.schema("ts").dataType == LongType)
      stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else stream
  }

  /** State-store partition count for the streaming queries. A stateful
    * query's state is sharded into `spark.sql.shuffle.partitions`
    * store instances, FIXED at the first checkpoint — each instance
    * pays per-batch snapshot/commit I/O, so idle shards are pure
    * overhead. Sized to the stateful key cardinality / executor count
    * on a real cluster; a small fixed count suits the one-shot
    * AvailableNow runs here. */
  private def streamShufflePartitions: String =
    sys.env.getOrElse("GRAFT_STREAM_PARTS", "8")

  private def runToTable(df: DataFrame, name: String,
                         mode: String = "complete"): DataFrame = {
    val spark = df.sparkSession
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", streamShufflePartitions)
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    df.sparkSession.table(name)
  }

  /** Tumbling 1-hour windows per event_type: count + exact value sum. */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    runToTable(agg, s"st_hourly_${dir.hashCode.abs}")
  }

  /** Stream-stream join: attribute each purchase to the same user's
    * views in the preceding 30 minutes. Both sides carry watermarks and
    * the join condition carries the time bound, so the state store
    * provably evicts rows older than watermark+bound — the only shape
    * under which an unbounded two-stream join runs forever at scale.
    * Inner join in append mode: matches emit as soon as both sides
    * arrive. */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = readEvents(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") < col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        col("v_ts"), col("p_ts"))
    runToTable(joined, s"st_join_${dir.hashCode.abs}", mode = "append")
  }

  /** Stream-static enrichment: the event stream left-joins the (small,
    * broadcast) customer dimension — the canonical streaming-ingest
    * lookup shape; the static side is re-planned per micro-batch, so
    * at warehouse scale a slowly-changing dim is picked up without
    * restarting the query. Aggregated per enriched segment. */
  def enrich(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.core.Tables(spark, dir).customer
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = readEvents(spark, dir)
      .join(broadcast(cust), col("user_id") === col("c_custkey"), "left")
      .select(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
        col("value"))
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
    runToTable(agg, s"st_enrich_${dir.hashCode.abs}")
  }

  /** Sliding 1-hour windows advancing every 30 minutes, per event_type:
    * each event contributes to the two overlapping windows. Same
    * complete-mode one-shot semantics as hourlyAgg; the engine expands
    * the window set per row before the keyed shuffle, so the cost is a
    * constant small multiple of the tumbling case at any scale. */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    runToTable(agg, s"st_sliding_${dir.hashCode.abs}")
  }

  /** Custom per-key streaming state via flatMapGroupsWithState: the
    * per-user "journey" — monotone event sequence number, 30-minute-gap
    * session index, and exact cumulative spend — state that windowed
    * aggregation can't express (it is per-EVENT output with cross-event
    * running state, not a per-window rollup).
    *
    * State per user is O(1) (last timestamp, counters, one decimal
    * accumulator), carried across micro-batches by the state store and
    * keyed-shuffled once — the standard scale shape for streaming
    * sessionization. Events within a batch are ordered (ts, event_id)
    * in-group; the cumulative sum is decimal-exact so replay /
    * parallelism changes can never drift the output. */
  def userJourney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ev = readEvents(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("tus"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Long, Double)]
    val out = ev.groupByKey(_._1)
      .flatMapGroupsWithState[JourneyState, (Long, Long, java.sql.Timestamp, Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[JourneyState]) =>
          var st = state.getOption.getOrElse(JourneyState(Long.MinValue, 0L, 0L, java.math.BigDecimal.ZERO))
          val rows = it.toSeq.sortBy { case (_, eid, _, tus, _) => (tus, eid) }.map {
            case (_, eid, ts, tus, v) =>
              val newSession = st.lastTsMicros == Long.MinValue ||
                tus - st.lastTsMicros >= 30L * 60 * 1000 * 1000
              val cum = st.cum.add(
                new java.math.BigDecimal(v).setScale(4, java.math.RoundingMode.HALF_UP))
              st = JourneyState(tus, st.seq + 1,
                st.sessionIdx + (if (newSession) 1 else 0), cum)
              (uid, eid, ts, st.seq, st.sessionIdx, cum.doubleValue)
          }
          state.update(st)
          rows.iterator
      }
      .toDF("user_id", "event_id", "ts", "event_seq", "session_idx", "cum_value")
    runToTable(out, s"st_journey_${dir.hashCode.abs}", mode = "append")
  }

  /** Streaming ingest dedup: exactly-once event delivery over an
    * at-least-once transport. dropDuplicatesWithinWatermark keys the
    * state store on event_id and evicts entries once the watermark
    * passes — bounded state, unlike an unwindowed distinct which
    * would grow forever on an unbounded stream. On replay-clean input
    * the output equals batch DISTINCT (the oracle). */
  def dedupedIngest(spark: SparkSession, dir: String): DataFrame = {
    val out = readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type", "value")
    runToTable(out, s"st_dedup_${dir.hashCode.abs}", mode = "append")
  }

  /** Streaming upsert sink via foreachBatch: each micro-batch MERGEs
    * into a keyed parquet target (union + keep-latest-per-key, the
    * anti-join/overwrite upsert of SURVEY.md §4.3.5 — the plain-parquet
    * stand-in for Delta's whenMatchedUpdateAll). State lives in the
    * TARGET TABLE, not the state store, so arbitrarily many keys cost
    * no streaming memory — the standard shape for a streaming-ingest
    * upsert at warehouse scale. Batches write to alternating
    * generation dirs (a poor man's atomic swap; a real lakehouse
    * commit log does this transactionally).
    *
    * Target grain: one row per user — latest event (last-write-wins on
    * (ts, event_id)) plus an additively-merged event count. */
  def upsertSink(spark: SparkSession, dir: String): DataFrame = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_upsert_${dir.hashCode.abs}"
    var current: Option[String] = None
    var gen = 0
    val ev = readEvents(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val q = ev.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // per-batch partial upsert rows: latest event + count per user
        val partial = batch
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("_m"),
               count(lit(1)).as("n_events"))
          .select(col("user_id"), col("_m.ts").as("last_ts"),
            col("_m.event_id").as("last_event_id"),
            col("_m.event_type").as("last_type"), col("n_events"))
        val merged = current match {
          case None => partial
          case Some(path) =>
            spark.read.parquet(path).unionByName(partial)
              .groupBy(col("user_id"))
              .agg(max(struct(col("last_ts"), col("last_event_id"),
                     col("last_type"))).as("_m"),
                   sum(col("n_events")).as("n_events"))
              .select(col("user_id"), col("_m.last_ts").as("last_ts"),
                col("_m.last_event_id").as("last_event_id"),
                col("_m.last_type").as("last_type"), col("n_events"))
        }
        gen += 1
        val next = s"$base/gen$gen"
        merged.write.mode("overwrite").parquet(next)
        current = Some(next)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(current.getOrElse(
      sys.error("upsertSink: stream produced no batches")))
  }

  /** Native session windows: 30-minute inactivity gap per user. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value"))
    runToTable(agg, s"st_sessions_${dir.hashCode.abs}")
  }
}
