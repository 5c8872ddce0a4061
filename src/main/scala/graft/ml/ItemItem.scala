package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Item-item collaborative filtering on binary co-purchase (SURVEY.md
  * §2.8 — the memory-based "customers also bought" neighbor model the
  * reference serves without trained factors): cosine(i,j) =
  * n_ij / √(n_i·n_j) over distinct (user, item) purchases, top-k
  * neighbors per item, ties broken by neighbor id. Exact and
  * bit-deterministic (integer counts, one correctly-rounded sqrt +
  * division), so it hash-matches the DuckDB oracle directly.
  *
  * Scale shape: the pair build self-joins users, so its cost is
  * Σ_u d(u)² — bounded ONLY if per-user degree is; the degree cap
  * (≤1000 distinct items, a no-op on this data, load-bearing on
  * power-law users) keeps the quadratic term linear-ish in practice.
  *
  * TWO physical strategies behind one result contract:
  *
  * KERNEL (default whenever the item catalog fits a driver-side count
  * table — the same ceiling the legacy path uses to broadcast its
  * denominator joins): the directed pair stream (a≠b, both directions
  * — emitting both directions out of the self-join costs nothing,
  * the join materializes d(u)² rows either way) is packed into ONE
  * long per row ((a<<32)|b; gated on ids in [0, 2³¹)), shuffled once
  * hash-partitioned BY SOURCE ITEM, and each partition sorts its
  * packed longs and run-length-scans them: a run of equal values IS
  * (a, b, n_ab), runs of one item are consecutive and already
  * neighbor-ordered, so exact counts, the cosine against the
  * broadcast n_i table and the bounded top-k selection all happen in
  * one primitive-array pass that emits FINAL rows (item, rank,
  * neighbor, n_ab, cosine). Replaces the legacy tail — a 10⁹-key
  * final hash aggregate that spilled ~37 GB at the 100× rehearsal,
  * two denominator joins and a mirror union re-streaming every pair,
  * and a top-k heap aggregate with its own exchange — with one
  * exchange of 8-byte rows and an O(m log m) per-partition scan.
  * Per-task memory is the packed pair slice (pairs/P × 8 B); the
  * partition count derives from a metadata-cheap pair-volume estimate
  * so the slice stays ~128 MB at any scale, the analog of one
  * executor core's shuffle slice on a real cluster.
  *
  * LEGACY (ids outside [0, 2³¹) or a catalog past the broadcast
  * ceiling): canonical a<b half-pair aggregation + dual-path
  * denominator attach + mirror + bounded-heap top-k aggregate — every
  * stage shuffle-hash hinted sort-free; see the inline comments.
  *
  * The kernel's driver-side n_i collect is the entry's MODEL BUILD,
  * deliberately at query-construction time like the ALS family's
  * train() — bounded by the same gate that already bounded the legacy
  * broadcast (`graft.reco.niBroadcastLimit`, default 4M items), so it
  * can never become an unbounded driver fetch on a corpus where the
  * legacy path wouldn't have broadcast the same table.
  */
object ItemItem {

  /** Sentinel a gate probe returns for a PROVABLY-missing table
    * (CountMemo onMissing) — distinct from Long.MaxValue (transient
    * error → legacy path): missing means "no catalog pre-check
    * available, size via the bounded limit+1 collect instead". */
  val MissingTable: Long = -1L

  /** The most recent kernel invocation's capped-purchases
    * QueryExecution (the fact join → distinct → degree-cap pipeline
    * the checkpoint materializes). TEST HOOK ONLY (PlanSpec): the
    * kernel's served plan is the RowBridge RDD wrap, so this
    * pipeline's physical plan (the shuffle_hash pins) is otherwise
    * invisible to plan inspection. Never read on a production path. */
  @volatile private[graft] var lastKernelQE
      : Option[org.apache.spark.sql.execution.QueryExecution] = None

  /** Whether the most recent kernel invocation had to repartition the
    * checkpointed frame by user (the AQE-skew-split safety exchange)
    * instead of trusting its reported hash(user) partitioning. TEST
    * HOOK ONLY (ItemItemSpec pins that the normal path does NOT pay
    * the exchange and that the guard logic itself discriminates). */
  @volatile private[graft] var lastPairSrcRepartitioned: Option[Boolean] = None

  /** n_i lookup shipped to the kernel: dense direct-indexed array when
    * the id space is compact (TPC-H partkeys are 1..P — one DRAM touch
    * per probe), open-addressing linear-probe table otherwise (~1-2
    * touches; never more than 50% loaded). Both deterministic. */
  private[graft] sealed trait NiLookup extends Serializable {
    def get(item: Long): Long
  }
  private final class DenseNi(arr: Array[Long]) extends NiLookup {
    def get(item: Long): Long = arr(item.toInt)
  }
  private final class HashNi(keys: Array[Int], vals: Array[Long]) extends NiLookup {
    private val mask = keys.length - 1
    def get(item: Long): Long = {
      val k = item.toInt
      var i = (((k * 0x9E3779B9) >>> 16) ^ k) & mask
      while (keys(i) != k) i = (i + 1) & mask // gate guarantees presence
      vals(i)
    }
  }

  private[graft] def buildLookup(ids: Array[Long], counts: Array[Long]): NiLookup = {
    val n = ids.length
    var maxId = -1L
    var i = 0
    while (i < n) { if (ids(i) > maxId) maxId = ids(i); i += 1 }
    // dense when ≤4× overallocated (and never >32M slots): the direct
    // array wins every probe it can afford the memory for
    if (maxId < (1L << 25) && maxId + 1 <= 4L * n + 1024) {
      val arr = new Array[Long]((maxId + 1).toInt)
      i = 0
      while (i < n) { arr(ids(i).toInt) = counts(i); i += 1 }
      new DenseNi(arr)
    } else {
      var cap = 16
      while (cap < 2 * n) cap <<= 1
      val keys = new Array[Int](cap)
      java.util.Arrays.fill(keys, -1)
      val vals = new Array[Long](cap)
      val mask = cap - 1
      i = 0
      while (i < n) {
        val k = ids(i).toInt
        var j = (((k * 0x9E3779B9) >>> 16) ^ k) & mask
        while (keys(j) != -1) j = (j + 1) & mask
        keys(j) = k; vals(j) = counts(i)
        i += 1
      }
      new HashNi(keys, vals)
    }
  }

  /** The sorted-scan core: run-length-scan packed (a<<32)|b pairs —
    * runs of equal values are exact (a, b, n_ab); runs of one item are
    * consecutive and neighbor-ascending — keeping a k-slot
    * insertion-sorted best list per item. Strict > on the cosine
    * preserves the (cosine desc, neighbor asc) tie-break because
    * neighbors arrive ascending. Emits FINAL result rows. */
  private[graft] def scanSorted(buf: Array[Long], n: Int, ni: NiLookup, k: Int)
      : scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Long, Double)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Long, Double)]
    val tCos = new Array[Double](k); val tNb = new Array[Long](k)
    val tCnt = new Array[Long](k)
    var tSize = 0
    var curItem = -1L
    var na = 0L
    def flush(): Unit = {
      var r = 0
      while (r < tSize) {
        out += ((curItem, r + 1, tNb(r), tCnt(r), tCos(r))); r += 1
      }
      tSize = 0
    }
    var i = 0
    while (i < n) {
      val pk = buf(i)
      var j = i + 1
      while (j < n && buf(j) == pk) j += 1
      val a = pk >>> 32
      val b = pk & 0xFFFFFFFFL
      if (a != curItem) { flush(); curItem = a; na = ni.get(a) }
      val cnt = (j - i).toLong
      // same arithmetic shape as the SQL: long product, one cast, one
      // correctly-rounded sqrt and division — bit-identical to DuckDB
      val cos = cnt.toDouble / math.sqrt((na * ni.get(b)).toDouble)
      if (tSize < k || cos > tCos(tSize - 1)) {
        var pos = if (tSize < k) tSize else k - 1
        while (pos > 0 && cos > tCos(pos - 1)) {
          tCos(pos) = tCos(pos - 1); tNb(pos) = tNb(pos - 1)
          tCnt(pos) = tCnt(pos - 1); pos -= 1
        }
        tCos(pos) = cos; tNb(pos) = b; tCnt(pos) = cnt
        if (tSize < k) tSize += 1
      }
      i = j
    }
    flush()
    out
  }

  private val outputSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "item BIGINT NOT NULL, rank INT NOT NULL, neighbor BIGINT NOT NULL, " +
      "n_ab BIGINT NOT NULL, cosine DOUBLE NOT NULL")

  private val pkSchema =
    org.apache.spark.sql.types.StructType.fromDDL("pk BIGINT NOT NULL")

  /** True iff the EXECUTED (post-AQE-finalization) plan of the capped
    * purchases proves pairGenRows' invariant — every user's rows in
    * one partition. The positive proof: the plan root (through narrow
    * wrappers) is the degree-cap semi-join as a NON-skew
    * ShuffledHashJoin streaming on exactly `user`. Two runtime events
    * break the invariant and both make this return false: (a) AQE's
    * OptimizeSkewedJoin splitting a skewed stream-side partition into
    * mapper-range slices (one user's items land in several slices —
    * the join is then marked isSkewJoin and cross-slice pairs would
    * otherwise be silently dropped); (b) any demotion of the semi-join
    * to a broadcast form (output then keeps the upstream distinct's
    * (user, item) partitioning, which does NOT co-locate users).
    * Checking the reported outputPartitioning instead does not work:
    * AQE conservatively reports UnknownPartitioning even for intact
    * hash-partitioned output (coalesced reads), which would force the
    * safety exchange on EVERY run. Anything unrecognized fails closed
    * onto the exchange — wrong answers are never on the table. */
  private[graft] def pairLocalityHolds(
      qe: org.apache.spark.sql.execution.QueryExecution): Boolean = {
    import org.apache.spark.sql.execution._
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: adaptive.AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: adaptive.QueryStageExec => unwrap(q.plan)
      case w: WholeStageCodegenExec => unwrap(w.child)
      case i: InputAdapter => unwrap(i.child)
      case _ => p
    }
    unwrap(qe.executedPlan) match {
      case j: joins.ShuffledHashJoinExec =>
        !j.isSkewJoin && j.leftKeys.nonEmpty && j.leftKeys.forall {
          case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
            a.name == "user"
          case _ => false
        }
      case _ => false
    }
  }

  /** Directed-pair generator over one partition of the CAPPED
    * purchases (which are hash-partitioned by user — the cap
    * semi-join's exchange — so every user's items are local): group
    * items per user in a small map, then lazily emit every ordered
    * pair (i≠j) as a packed (a<<32)|b single-long UnsafeRow. This
    * replaces a d(u)²-row self-JOIN: the join's per-output-row probe
    * machinery and its two extra checkpoint scans measured ~30% of
    * the whole entry at the 100× rehearsal, while this loop's emit
    * cost is the shuffle write it feeds. The one reused UnsafeRow is
    * safe because the exchange writer copies each row's bytes before
    * next() is called again. Null items (kept upstream for the degree
    * count, exactly like the legacy plan) never pair. */
  private[graft] def pairGenRows(
      it: Iterator[org.apache.spark.sql.catalyst.InternalRow])
      : Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    final class IntVec {
      var a = new Array[Int](8)
      var n = 0
      def add(v: Int): Unit = {
        if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
        a(n) = v; n += 1
      }
    }
    val byUser = new java.util.HashMap[Long, IntVec]()
    while (it.hasNext) {
      val r = it.next()
      if (!r.isNullAt(1)) {
        val u = r.getLong(0)
        var vec = byUser.get(u)
        if (vec == null) { vec = new IntVec; byUser.put(u, vec) }
        vec.add(r.getLong(1).toInt)
      }
    }
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(pkSchema)
    val row = proj(new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](0L)))
    val users = byUser.entrySet().iterator()
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private var items: Array[Int] = _
      private var n = 0
      private var i = 0
      private var j = 0
      private def advance(): Boolean = {
        while (true) {
          if (items != null) {
            // next (i, j) with i ≠ j
            j += 1
            if (j == i) j += 1
            if (j < n) return true
            j = -1; i += 1
            if (i >= n) items = null
          } else if (users.hasNext) {
            val vec = users.next().getValue
            items = vec.a
            n = vec.n
            i = 0; j = -1
            if (n < 2) items = null // single purchase: no pairs
          } else return false
        }
        false
      }
      private var ready = false
      override def hasNext: Boolean = {
        if (!ready) ready = advance()
        ready
      }
      override def next(): org.apache.spark.sql.catalyst.InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        ready = false
        row.setLong(0, (items(i).toLong << 32) | items(j).toLong)
        row
      }
    }
  }

  /** One partition of the kernel, on the allocation-free InternalRow
    * path (RowBridge): drain the single-long-column shuffle slice into
    * a primitive array (no boxing — `Dataset[Long].mapPartitions`
    * boxes every element, measured as the dominant cost of this stage
    * at sf1), sort, scan, emit UnsafeRows. */
  private[graft] def scanPartitionRows(
      it: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      ni: NiLookup, k: Int)
      : Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    var buf = new Array[Long](1 << 13)
    var n = 0
    while (it.hasNext) {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n << 1)
      buf(n) = it.next().getLong(0); n += 1
    }
    java.util.Arrays.sort(buf, 0, n)
    val out = scanSorted(buf, n, ni, k)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(outputSchema)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
    out.iterator.map { case (item, rank, nb, cnt, cos) =>
      row.update(0, item); row.update(1, rank); row.update(2, nb)
      row.update(3, cnt); row.update(4, cos)
      proj(row).copy()
    }
  }

  /** Distinct capped (user, item) purchases — shared by both paths. */
  private def cappedPurchases(t: Tables): DataFrame = {
    val ui = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .hint("shuffle_hash")
      .join(t.lineitem.select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("user"), col("l_partkey").as("item"))
      .distinct()
    ui.join(
      ui.groupBy("user").agg(count(lit(1)).as("_d"))
        .filter(col("_d") <= 1000).select("user").hint("shuffle_hash"),
      Seq("user"), "left_semi")
  }

  /** Top-k item neighbors. `partCount`/`lineitemCount`/`customerCount`
    * are the caller's memoized parquet-metadata probes (Long.MaxValue
    * on error — fails CLOSED onto the legacy/default path). */
  def neighbors(t: Tables, k: Int, niBroadcastLimit: Long,
                partCount: Long, lineitemCount: Long,
                customerCount: Long): DataFrame = {
    val s = t.spark
    import s.implicits._
    val capped = cappedPurchases(t)
    val ni = capped.groupBy(col("item")).agg(count(lit(1)).as("n_i"))

    // kernel gate: the n_i table must fit the driver. The memoized
    // part-table count is the cheap pre-check (same ceiling the legacy
    // broadcast uses); corpora WITHOUT a part table (hand fixtures —
    // partCount == MissingTable, distinguished from transient errors
    // by the caller's shared CountMemo) fall through to the limit+1
    // collect, whose driver footprint is bounded by construction even
    // if the catalog turns out huge — the executors then did one
    // wasted pass and legacy takes over.
    if ((partCount >= 0 && partCount <= niBroadcastLimit)
        || partCount == MissingTable) {
      // one materialization of the capped purchases: without it the
      // fact-join→distinct→cap subtree executes THREE times (the n_i
      // collect job + once per self-join side — the alias rename
      // defeats exchange reuse), measured as ~half the sf1 wall. The
      // checkpoint is gated with the kernel, so it only ever pins a
      // frame whose catalog already fit the driver table; Bench's
      // inter-query hygiene (getPersistentRDDs.unpersist) reclaims it.
      lastKernelQE = Some(capped.queryExecution)
      val cappedCp = capped.localCheckpoint()
      val niCp = cappedCp.groupBy(col("item")).agg(count(lit(1)).as("n_i"))
      val rows = niCp.select(col("item").cast("long"), col("n_i"))
        .limit(math.min(niBroadcastLimit + 1, Int.MaxValue.toLong).toInt)
        .collect()
      val nonNull = rows.filter(!_.isNullAt(0))
      val idsOk = nonNull.forall { r =>
        val id = r.getLong(0); id >= 0 && id < (1L << 31)
      }
      if (rows.length > niBroadcastLimit || !idsOk) {
        // catalog or id shape disqualified the kernel after the
        // checkpoint already materialized — let legacy consume it
        legacyNeighbors(t, cappedCp, niCp, k, niBroadcastLimit, partCount)
      } else {
        val ids = nonNull.map(_.getLong(0))
        val counts = nonNull.map(_.getLong(1))
        val bc = s.sparkContext.broadcast(buildLookup(ids, counts))
        // directed pairs, BOTH orientations (the a<b + mirror form
        // materializes the same d(u)² rows and then re-streams them),
        // generated by pairGenRows straight off the user-partitioned
        // checkpoint — a self-JOIN here would re-scan the checkpoint
        // twice and pay a hash probe per emitted row for pairs the
        // per-user double loop emits for free. The user-locality the
        // loop requires is VERIFIED on the materialized plan, not
        // assumed from its shape (pairLocalityHolds reads the executed
        // QE the checkpoint just ran): an AQE skew-split semi-join
        // leaves one user's items across slices, so that case (and any
        // other unrecognized final shape) pays one explicit user
        // exchange instead of silently dropping cross-slice pairs.
        // (In Spark 4.1.2 OptimizeSkewedJoin additionally only matches
        // joins whose children are BARE shuffle stages — the semi-join
        // build side's agg/filter/project prevents a match today — but
        // the guard does not RELY on that pattern-match detail
        // surviving a Spark upgrade. graft.reco.forcePairExchange is
        // the operator escape hatch: force the exchange on a Spark
        // build where the positive proof can't be established.)
        val forceExchange = s.conf
          .getOption("graft.reco.forcePairExchange").exists(_.toBoolean)
        val pairSrc0 = cappedCp.select(col("user"), col("item"))
        val userLocal =
          !forceExchange && pairLocalityHolds(capped.queryExecution)
        val defaultP = s.conf.get("spark.sql.shuffle.partitions").toInt
        // the EMIT side must scale with pair volume too: the emit
        // stage's task count is otherwise pinned at the cap
        // semi-join's partition count (spark.sql.shuffle.partitions,
        // or fewer after AQE coalescing), so pairs per map task grow
        // linearly with data and the shuffle sorter falls off a
        // memory cliff — measured at the sf20 rehearsal: sf10 82M
        // pairs/task = zero spill, sf20 164M pairs/task = 139 GB
        // memory / 27 GB disk spill and the emit stage 2.05× the
        // linear expectation. emitPartitions sizes the map side from
        // the same pairsEst (budget ~32M pairs/task); when the
        // source's ACTUAL partition count already meets the budget —
        // every gate-scale corpus — nothing engages and the
        // guard-proven no-exchange path is untouched. Widening pays
        // one slim (user, item) hash exchange whose locality
        // pairGenRows needs holds by construction.
        val actualParts = cappedCp.rdd.getNumPartitions
        val emitNeed = emitPartitions(lineitemCount, customerCount)
        val widenEmit = emitNeed > actualParts
        lastPairSrcRepartitioned = Some(!userLocal || widenEmit)
        val pairSrc =
          if (!userLocal || widenEmit)
            pairSrc0.repartition(math.max(emitNeed, defaultP), col("user"))
          else pairSrc0
        val pairs = org.apache.spark.sql.graftbridge.RowBridge
          .ofInternalRows(s,
            org.apache.spark.sql.graftbridge.RowBridge
              .toInternalRdd(pairSrc)
              .mapPartitions(pairGenRows),
            pkSchema)
        val p = pairPartitions(defaultP, lineitemCount, customerCount)
        val repart = pairs.repartition(p, shiftright(col("pk"), 32))
        val rdd = org.apache.spark.sql.graftbridge.RowBridge
          .toInternalRdd(repart)
          .mapPartitions(it => scanPartitionRows(it, bc.value, k))
        org.apache.spark.sql.graftbridge.RowBridge
          .ofInternalRows(s, rdd, outputSchema)
      }
    } else legacyNeighbors(t, capped, ni, k, niBroadcastLimit, partCount)
  }

  /** Kernel-exchange partition count from the metadata-cheap pair
    * volume estimate L·(L/C): ~16M packed longs (~128 MB) per task
    * slice at any scale, floored at the session default and clamped
    * at 1024 (the upper clamp first binds around 16.4G directed pairs
    * ≈ a ~sf63 corpus of this shape — past it, slices grow beyond
    * 128 MB by design rather than fan the exchange out without
    * bound). Failed probes (MaxValue) and an empty customer count
    * estimate huge and take the upper clamp — oversplitting is safe,
    * a task OOM is not. multiplyExact: a plain * can overflow
    * NEGATIVE at extreme row counts, which would collapse p to
    * defaultP exactly where the clamp matters — overflow saturates
    * to MaxValue instead (law pinned in ItemItemSpec). */
  private[graft] def pairPartitions(defaultP: Int, lineitemCount: Long,
                                    customerCount: Long): Int = {
    val pairsEst =
      if (lineitemCount == Long.MaxValue || customerCount == Long.MaxValue
          || customerCount == 0L) Long.MaxValue
      else scala.util.Try(Math.multiplyExact(lineitemCount,
        math.max(1L, lineitemCount / customerCount)))
        .getOrElse(Long.MaxValue)
    math.max(defaultP, math.min(1024L, pairsEst / 16000000L).toInt)
  }

  /** Map-side (pair-EMIT) partition NEED, same pairsEst estimate as
    * pairPartitions but budgeted at ~32M pairs per map task: the emit
    * stage's shuffle sorter buffers Θ(pairs/task), and the measured
    * zero-spill regime ends between 82M (sf10, clean, 30g heap) and
    * 164M (sf20, 139 GB mem-spill, 40g) pairs per task — 32M is the
    * measured sweet spot: the residual spill is ONE disk pass of the
    * exchange payload no matter how the map side splits (the unified
    * pool's storage-protected half holds the checkpoint blocks, so
    * the sorter always round-trips what exceeds its share), and the
    * wall win comes from parallel slices — sf20 measured 303 s at 32
    * tasks, 162.6 s at 150 (this budget), 184.5 s at 300 (finer
    * splits just add task overhead). UNfloored
    * (unlike pairPartitions): the caller widens only when this need
    * exceeds the source's ACTUAL partition count, so gate-scale and
    * AQE-coalesced tiny corpora never pay the exchange. Fail-closed
    * probes (MaxValue) and zero customers take the 1024 clamp —
    * oversplitting is safe, a sorter OOM is not; a zero-lineitem
    * corpus with live customers estimates 0 and never widens. Law
    * pinned in ItemItemSpec. */
  private[graft] def emitPartitions(lineitemCount: Long,
                                    customerCount: Long): Int = {
    val pairsEst =
      if (lineitemCount == Long.MaxValue || customerCount == Long.MaxValue
          || customerCount == 0L) Long.MaxValue
      else scala.util.Try(Math.multiplyExact(lineitemCount,
        math.max(1L, lineitemCount / customerCount)))
        .getOrElse(Long.MaxValue)
    math.min(1024L, pairsEst / 32000000L).toInt
  }

  /** The shuffle-plan form — kept verbatim for catalogs past the
    * driver ceiling or ids the packed-long kernel can't represent. */
  private def legacyNeighbors(t: Tables, capped: DataFrame, ni: DataFrame,
                              k: Int, niBroadcastLimit: Long,
                              partCount: Long): DataFrame = {
    // aggregate CANONICAL pairs only (a<b) — cosine is symmetric, so
    // mirroring the aggregated relation afterwards costs O(distinct
    // pairs) while halving the Σ d(u)² rows in the dominant shuffle.
    // The denominators n_i deliberately do NOT ride that shuffle:
    // grouping on bare (item, neighbor) keeps the pair rows two
    // longs wide (~45% less shuffle volume than carrying both
    // counts), and ni joins onto the aggregated CANONICAL pair frame
    // below instead — broadcast at catalog sizes, a sort-free
    // hash-join exchange of the O(distinct pairs)/2 side past the
    // broadcast ceiling, either way off the dominant Σ d(u)² path.
    // Every non-broadcast join is hinted sort-free: the frames (fact
    // join, ui, pairs) are all large-and-flat, so each SMJ sort here
    // is a full-frame spill for no merge benefit — the two full SORTS
    // of the O(distinct pairs) frame (not the joins) were the first
    // thing to exhaust executor spill space in the 100× rehearsal.
    val half = capped.select(col("user"), col("item")).hint("shuffle_hash")
      .join(capped.select(col("user"), col("item").as("neighbor")),
        Seq("user"))
      .filter(col("item") < col("neighbor"))
      .groupBy(col("item"), col("neighbor"))
      .agg(count(lit(1)).as("n_ab"))
    // dual-path denominator attach, the g_pagerank precedent: below
    // the bound the ni frame (≤ catalog rows; the part row count is
    // parquet-metadata-cheap) broadcasts — zero pair-side exchange;
    // past it an explicit broadcast would OOM the driver, so the
    // joins go shuffle-hash. The gate must be explicit because the
    // planner's STATIC estimate of ni (derived from the whole fact
    // join) is catalog-size-blind: at the 100× rehearsal it planned
    // sort-merge despite ni materializing at ~30 MB.
    // MissingTable (-1) and MaxValue are both "size unknown" here: this
    // path is reached with no trustworthy catalog count (the kernel's
    // limit+1 probe may have just DISQUALIFIED the catalog as huge),
    // so only a real 0 ≤ count ≤ limit may select the broadcast attach.
    val niSmall = partCount >= 0 && partCount <= niBroadcastLimit
    def attach(d: DataFrame): DataFrame =
      if (niSmall) broadcast(d) else d.hint("shuffle_hash")
    val halved = half
      .join(attach(ni.select(col("item"), col("n_i").as("n_a"))),
        Seq("item"))
      .join(attach(ni.select(col("item").as("neighbor"),
        col("n_i").as("n_b"))), Seq("neighbor"))
    val co = halved.unionByName(halved.select(
      col("neighbor").as("item"), col("item").as("neighbor"),
      col("n_ab"), col("n_b").as("n_a"), col("n_a").as("n_b")))
    val scored = co.withColumn("cosine",
      col("n_ab").cast("double") /
        sqrt((col("n_a") * col("n_b")).cast("double")))
    // top-k via the bounded-heap aggregate (topk_tagged carries n_ab
    // as payload): only k rows per item per partition reach the
    // exchange, vs a window sort over every scored pair — at catalog
    // scale that sort IS the query's cost. Ordering (cosine desc,
    // neighbor asc) matches the heap's total order exactly.
    scored.groupBy(col("item"))
      .agg(expr(s"topk_tagged(neighbor, cosine, n_ab, $k)").as("topk"))
      .select(col("item"), posexplode(col("topk")))
      .select(col("item"), (col("pos") + 1).as("rank"),
        col("col.item").as("neighbor"), col("col.payload").as("n_ab"),
        col("col.score").as("cosine"))
  }
}
